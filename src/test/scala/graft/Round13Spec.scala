package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 specs: x298 exact substring dedup (planted shared passages),
  * the x287 packed-pair-key fail-loud guard, and the bench environment
  * probe. */
class Round13Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import spark.implicits._

  /** Plant a documents dir with the given (doc_id, text) rows. */
  private def plantDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("x298dir").toString
    rows.map { case (id, t) => (id, t, "aa", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def runs(dir: String): Seq[(Long, Long, Long, Long, Long, Long)] =
    graft.queries.LlmExt2.x298(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))

  test("x298 finds a 20-token passage planted across 3 docs at 3 offsets") {
    // passage P of 20 tokens; per-doc filler tokens are globally unique so
    // only windows fully inside P are shared (8 windows: starts 0..7
    // relative to P's offset) — one merged run per doc covering exactly P
    val p = (1 to 20).map(i => f"p$i%02d").mkString(" ")
    def u(doc: Int, n: Int, from: Int = 0) =
      (from until from + n).map(i => s"u$doc-$i").mkString(" ")
    val dir = plantDocs(Seq(
      1L -> s"$p ${u(1, 10)}",           // P at offset 0
      2L -> s"${u(2, 5)} $p ${u(2, 5, 5)}", // P at offset 5
      3L -> s"${u(3, 10)} $p"))          // P at offset 10
    val got = runs(dir)
    assert(got === Seq(
      (1L, 0L, 19L, 20L, 8L, 1L),
      (2L, 5L, 24L, 20L, 8L, 1L),
      (3L, 10L, 29L, 20L, 8L, 1L)))
  }

  test("x298 interval-union merge: touching runs merge, gapped runs split") {
    // G1 and G2 are 13-token grams. Doc 6 holds them ADJACENT (the two
    // flagged starts are 0 and 13 — gap exactly K — and the 12 boundary-
    // spanning windows are unique to doc 6, so the interval union must
    // still merge the touching coverage into ONE 26-token run). Doc 7
    // holds them far apart in reverse order → two separate runs.
    val g1 = (1 to 13).map(i => f"a$i%02d").mkString(" ")
    val g2 = (1 to 13).map(i => f"b$i%02d").mkString(" ")
    val gap = (1 to 14).map(i => s"z7-$i").mkString(" ")
    val dir = plantDocs(Seq(6L -> s"$g1 $g2", 7L -> s"$g2 $gap $g1"))
    val got = runs(dir)
    assert(got === Seq(
      (6L, 0L, 25L, 26L, 2L, 6L),   // merged: starts 0 and 13, gap == K
      (7L, 0L, 12L, 13L, 1L, 6L),   // G2 alone
      (7L, 27L, 39L, 13L, 1L, 6L))) // G1 alone, 14-token gap > K splits
  }

  test("x298 flags self-repetition within one doc and ignores unique text") {
    // doc 8 repeats a 13-gram twice within itself (starts 0 and 20, gap
    // 20 > 13 → two runs, both rep_doc 8); doc 9 is all-unique → no rows
    val g = (1 to 13).map(i => f"r$i%02d").mkString(" ")
    val mid = (1 to 7).map(i => s"m8-$i").mkString(" ")
    val dir = plantDocs(Seq(
      8L -> s"$g $mid $g",
      9L -> (1 to 30).map(i => s"q9-$i").mkString(" ")))
    val got = runs(dir)
    assert(got === Seq(
      (8L, 0L, 12L, 13L, 1L, 8L),
      (8L, 20L, 32L, 13L, 1L, 8L)))
  }

  test("x298 is deterministic and linear-shaped on the smoke corpus") {
    val a = runs(sfSmoke)
    val b = runs(sfSmoke)
    assert(a === b)
    // structural invariants on real data: 0-based starts, end = start +
    // n_tokens - 1, window count == n_tokens - 12 for a contiguous run of
    // fully-covered tokens is NOT an identity (runs may have interior
    // flagged starts), but bounds hold: 1 <= n_windows <= n_tokens - 12
    assert(a.forall { case (_, s, e, nt, nw, rep) =>
      s >= 0 && e == s + nt - 1 && nt >= 13 && nw >= 1 && nw <= nt - 12 &&
        rep >= 0
    })
  }

  test("x287 pair-domain guard fails loudly past 10^6 and passes below it") {
    val ok = Seq((1L, 2L), (999999L, 3L)).toDF("pa", "pb")
    assert(graft.queries.Graphs.guardPairDomain(ok).count() === 2)
    val bad = Seq((1L, 2L), (1000000L, 3L)).toDF("pa", "pb")
    val e = intercept[Exception] {
      graft.queries.Graphs.guardPairDomain(bad).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packed pair key")), s"got: $e")
  }

  test("bench env probe samples loadavg/busy/self/steal with sane bounds") {
    BenchEnvProbe.prime()
    // burn a little CPU so the self share is measurable
    var x = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < 50000000L) { x += 1 }
    assert(x > 0)
    BenchEnvProbe.sample(0)
    val s = BenchEnvProbe.samples
    assert(s.nonEmpty, "expected at least one env sample on Linux /proc")
    val last = s.last
    assert(last.load1 >= 0 && last.busyPct >= 0 && last.busyPct <= 100.001)
    assert(last.selfPct >= 0 && last.stealPct >= 0 && last.otherPct >= 0)
    // other = busy − self by construction (clamped at 0)
    assert(last.otherPct <= last.busyPct + 0.001)
    assert(BenchEnvProbe.summaryJson.contains("other_cpu_pct_max"))
  }
}
