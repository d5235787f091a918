package graft.examples

import org.apache.spark.sql.SparkSession

/** Production-k SemDeDup linearity probe (VERDICT r12 task 3).
  *
  * The registered x284 pins k = 8 cells for oracle determinism, which makes
  * its 100× soak honestly SUPER-linear (346× at 100 copies — Σ|cell|² grows
  * quadratically when cells grow with N). The scaladoc's production
  * mitigation is "k grows with the corpus so mean cell size stays bounded
  * (k ≈ N / target_cell)"; this main MEASURES that claim instead of
  * asserting it: it times the same chain with k scaled to keep mean cell
  * size ≈ 250 at every scale — base (2 000 vecs → k 8), 10× (20 000 →
  * k 80), 100× (200 000 → k 800) — and prints the per-scale ratios next to
  * the fixed-k ones. The centroid set is "first k vectors by id" at every
  * k, so the probe changes ONLY the cell count, exactly the production
  * lever.
  *
  * Caveat the numbers must be read with: the synthetic ×N corpus gives
  * every vector N−1 EXACT twins, so the TRUE duplicate-pair output itself
  * grows ~quadratically in the copy factor no matter how the candidate
  * generation buckets — production-k cannot (and should not) flatten the
  * workload's real answer, only the candidate-generation overhead ABOVE
  * it. The claim under test is therefore "scaled k keeps the ratio far
  * below fixed-k's 346×", not "ratio == 100".
  *
  * Usage: runMain graft.examples.SemDedupKScale [baseDir] [x10Dir]
  * [x100Dir] [targetCell] — dirs default to the standing soak corpora.
  */
object SemDedupKScale {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val d10 = if (args.length > 1) args(1) else "/tmp/graft_scale10_full"
    val d100 = if (args.length > 2) args(2) else "/tmp/graft_scale100"
    val target = if (args.length > 3) args(3).toInt else 250
    val spark: SparkSession = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")

    def kFor(dir: String): Int = {
      val n = graft.engine.Tables.embeddings(spark, dir).count()
      math.max(8, (n / target).toInt)
    }
    def time(dir: String, k: Int): (Double, Long) = {
      // warm once (JIT/codegen/listing), then time the steady-state run
      graft.queries.Clustering.semDedupAt(spark, dir, k).count()
      val t0 = System.nanoTime()
      val rows = graft.queries.Clustering.semDedupAt(spark, dir, k).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val legs = Seq(("base", base, 1), ("x10", d10, 10), ("x100", d100, 100))
      .filter { case (_, d, _) =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(d)) }
    val results = legs.map { case (label, dir, factor) =>
      val k = kFor(dir)
      val (s, rows) = time(dir, k)
      println(f"[semdedup-k] $label%-5s k=$k%4d  ${s}%7.2f s  $rows%9d dropped rows")
      (label, factor, k, s, rows)
    }
    val baseS = results.head._4
    results.tail.foreach { case (label, factor, k, s, rows) =>
      println(f"[semdedup-k] $label vs base: ratio ${s / baseS}%6.1fx at ${factor}x data (k=$k, $rows rows)")
    }
    spark.stop()
  }
}
