package graft.examples

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingOps

/** Streaming 100× cost attribution (VERDICT r14 task 4): x03 (71.7×),
  * x252 (36.5×), x19 (32.8×) and x261 (17.9×) sit well above the batch
  * family in the 100× soak while classified linear-ish; this probe breaks
  * each ratio into its actual drivers so a 100 TB/day capacity plan has
  * numbers instead of a class label:
  *
  *   - micro-batch count (data batches + trailing no-data finalization
  *     batches): the replays are SINGLE-data-batch by contract
  *     (runToTable's guard), so batch count CANNOT be the driver — the
  *     probe records it to prove that;
  *   - state rows (max numRowsTotal across state operators): the honest
  *     workload growth — sessions/join rows grow ~linearly with events;
  *   - the shuffle-partition pin: runToTable fixes
  *     spark.sql.shuffle.partitions = 4 (measured best at sf0.1 where
  *     per-partition state-store open/commit overhead dominates tiny
  *     state). At 100× the state shuffle itself dominates and 4
  *     partitions serialize it onto 4 of 32 cores — the probe re-runs
  *     every 100× leg at 4 vs 32 via [[StreamingOps.partitionsOverride]]
  *     to measure exactly how much of the ratio is the pin, not the
  *     operator.
  *
  * Usage: runMain graft.examples.StreamCostProbe [baseDir] [bigDir]
  * (bigDir defaults to the FullScaleSoak 100× corpus; build it first).
  * Run with SPARK_DRIVER_MEM=96g for the 100× legs.
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "/tmp/graft_scale100"
    val spark: SparkSession = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val keys: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("x03_stream_session_window" -> (StreamingOps.x03 _),
          "x19_stream_custom_state"   -> (StreamingOps.x19 _),
          "x252_tws_timer_sessions"   -> (StreamingOps.x252 _),
          "x261_stream_full_outer_join" -> (StreamingOps.x261 _))
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def leg(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String, label: String, parts: Option[Int]): Unit = {
      StreamingOps.partitionsOverride = parts
      try {
        hygiene()
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        val (dataB, totalB) = StreamingOps.lastBatchCounts
        val stateRows =
          if (StreamingOps.lastStateProgress.isEmpty) 0L
          else StreamingOps.lastStateProgress.map(_.numRowsTotal).max
        val commitMs = StreamingOps.lastStateProgress
          .map(p => p.allUpdatesTimeMs + p.commitTimeMs).sum
        println(f"""{"probe":"stream_cost","key":"$name","leg":"$label","parts":${parts.getOrElse(4)},"sec":$secs%.2f,"rows":$rows,"data_batches":$dataB,"total_batches":$totalB,"state_rows_max":$stateRows,"state_update_commit_ms":$commitMs}""")
      } finally { StreamingOps.partitionsOverride = None }
    }
    for ((name, fn) <- keys) {
      fn(spark, base).count() // warm codegen/listing outside the timed legs
      leg(name, fn, base, "base", None)
      leg(name, fn, big, "100x_p4", Some(4))
      leg(name, fn, big, "100x_p32", Some(32))
    }
    spark.stop()
  }
}
