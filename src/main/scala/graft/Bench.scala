package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times each registered query's `.count()`
  * on SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * A warmup pass at sf0.001 runs every query once before timing so the
  * measurements reflect steady-state execution (whole-stage codegen and JIT
  * compiled), not first-query compiler latency — the regime a long-running
  * cluster actually operates in.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.withGraftConf(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // State hygiene (VERDICT r10 task 1): the 308-key single-JVM run
    // accumulates cached/localCheckpoint blocks faster than the
    // ContextCleaner retires them — the r10 driver bench inflated
    // late-registry iterative keys 7–12× (x119 38.4 s vs 3.0 s standalone)
    // while the same code measured clean in isolation. Clearing the catalog
    // cache, unpersisting any leaked RDD blocks, and forcing a GC (the
    // ContextCleaner is driven by weak-reference queues, so a System.gc()
    // is what actually surfaces dead localCheckpoint blocks for removal)
    // between keys keeps every key's measurement independent of how much
    // registry ran before it. Runs BETWEEN timed windows only — never
    // inside one — so it costs bench wall-clock, not measured time.
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    hygiene()
    // Second, UNTIMED warm pass of the declared q-keys at the TARGET sfDir:
    // the sf0.001 pass warms codegen/JIT but not the sfDir file listings,
    // footer reads, or AQE stats at the measured scale — r9's declared
    // spread was 7.1 s across 3 samples, ~60% of the total, pure first-run
    // warm-up. Paying it once outside the timed window makes per-query
    // round-over-round deltas meaningful (VERDICT r9 task 7).
    SparkEntry.queries.foreach { case (name, fn) =>
      if (name.startsWith("q"))
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    hygiene()
    // DECLARED q-keys (the BASELINE.md-comparable set): median of 3 timed
    // runs — r8's declared-total ranged 11.6–14.5 s purely from JVM/AQE
    // warm-up variance, so round-over-round deltas on a min-of-2 were
    // noise; the median is robust to one slow outlier AND one
    // unrepresentatively-fast cached run. x-keys keep min-of-2 (209 keys
    // × a third run is ~2.5 min of bench time for numbers no baseline
    // consumes). Per-query spread (max−min of the samples) is emitted so
    // the variance itself is visible in the round artifacts.
    val samples = SparkEntry.queries.toSeq.zipWithIndex.map {
      case ((name, fn), idx) =>
        // Periodic hygiene between keys (every 50) so block accumulation
        // from earlier keys can never distort a later key's timing.
        if (idx > 0 && idx % 50 == 0) hygiene()
        def once(): Double = {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
          (System.nanoTime() - t0) / 1e9
        }
        val runs = if (name.startsWith("q")) Seq(once(), once(), once())
                   else Seq(once(), once())
        name -> runs.sorted
    }.toMap
    // A failed run returns the -1.0 sentinel, which sorts FIRST — so a
    // median/min over the raw sorted runs would mask a 1-of-3 crash behind a
    // valid-looking time and corrupt the spread by ~1 s (ADVICE r9). Any
    // failed sample ⇒ the key reports -1.0 (failed) and contributes zero
    // spread; partial success is not a number the baseline can consume.
    val results = samples.map { case (name, runs) =>
      name -> (if (runs.head < 0) -1.0
               else if (runs.size == 3) runs(1)
               else runs.head)
    }
    // Two spread views. max−min (continuity with r8/r9) is dominated by ONE
    // GC/scheduler outlier per triple — a per-key probe on fully-warmed
    // back-to-back q-runs still measured 6.3 s total (e.g. q42:
    // 0.824/0.898/1.613 s), so warm-up cannot push it under ~6 s on
    // local[32]; it measures the fleet's jitter ceiling, not measurement
    // quality. median−min is the view that tracks the REPORTED number's
    // stability (how far the median sits above best-case): ~1 s total —
    // use it for round-over-round regression reading.
    val spreads = samples.map { case (name, runs) =>
      name -> (if (runs.head < 0) 0.0 else runs.last - runs.head)
    }
    val spreadsMed = samples.map { case (name, runs) =>
      name -> (if (runs.head < 0) 0.0
               else if (runs.size == 3) runs(1) - runs.head
               else 0.0)
    }
    // Failed keys report -1.0 per-key (loud in the detail) but must NOT
    // enter the sums: adding the sentinel makes the baseline-comparable
    // declared_total look ~1 s FASTER per crash while also omitting the
    // key's true runtime — a regression-masking direction of error
    // (ADVICE r10). Sums cover succeeded keys only; n_failed in the total
    // line makes any crash loud rather than flattering.
    val nFailed = results.values.count(_ < 0)
    val total = results.values.filter(_ >= 0).sum
    // The driver captures only a bounded TAIL (~4 KB) of the sbt output: round
    // 1's single long line truncated to "parsed": null, round 4's single
    // "total_detail" line lost the first 38 of 92 per-query times, and round
    // 5's 24-per-line full-name chunks still overflowed the tail (only 61 of
    // 157 survived). Emit the detail as several SHORT self-contained JSON
    // lines (distinct metric names so a collect-all parser cannot
    // double-count, per ADVICE r2) under COMPACT keys — the "q12"/"x110"
    // prefix before the first underscore, unique across the registry — so
    // the full per-query map fits in ~2 KB, and the one gradable "total"
    // line LAST so it — and every detail chunk — survives any tail capture.
    // stop BEFORE printing: nothing (executor shutdown warnings, context
    // cleaner logs) may land between the metric lines and the tail's end
    spark.stop()
    // The tail capture still drops chunks some rounds (r6 lost detail_1of5,
    // ~40 timings — blocking per-key regression tracking between rounds), so
    // ALSO persist the complete per-key map to a file committed with the
    // round's artifacts: full query names, seconds at millisecond precision,
    // one stable sorted object so diffs between rounds are line-readable.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_DETAIL_OUT",
      "/root/repo/BENCH_DETAIL.json")
    try {
      val body = results.toSeq.sortBy(_._1)
        .map { case (k, v) => s"""    "$k": ${f"$v%.3f"}""" }
        .mkString("{\n  \"sf\": \"" + sfDir + "\",\n  \"queries\": {\n",
          ",\n", "\n  }\n}\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        body.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: $e") }
    val chunks = results.toSeq.grouped(40).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val qs = chunk
        .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"detail_${i + 1}of${chunks.size}","queries":$qs}""")
    }
    // BASELINE.md's 13.79 s covers ONLY the 49 declared queries (q01–q49);
    // the x-series extensions have no DuckDB baseline. declared_total is the
    // number comparable to the baseline; value stays the full-registry sum.
    val declared =
      results.collect { case (k, v) if k.startsWith("q") && v >= 0 => v }.sum
    val declaredSpread = spreads.collect { case (k, v) if k.startsWith("q") => v }.sum
    val declaredSpreadMed = spreadsMed.collect { case (k, v) if k.startsWith("q") => v }.sum
    println(s"""{"metric":"declared_spread","value":${f"$declaredSpread%.3f"},"unit":"sec","spread_med_min":${f"$declaredSpreadMed%.3f"},"note":"max-min sum is the jitter ceiling (one GC outlier per triple); spread_med_min (median-min sum) tracks the reported median's stability"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","declared_total":$declared,"declared_n":${results.count(_._1.startsWith("q"))},"n_queries":${results.size},"n_failed":$nFailed,"sf":"$sfDir"}""")
  }
}
