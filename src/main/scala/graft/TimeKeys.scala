package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness: `runMain graft.TimeKeys <sfDir> <key-prefix>...`
  * times just the named registry keys (min of two runs after an sf0.001
  * warmup), so a perf investigation doesn't pay for the whole 198-key
  * Bench sweep. Same session conf as Bench. */
object TimeKeys {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1)
    val spark = graft.engine.Sessions.withGraftConf(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = SparkEntry.queries.filter { case (k, _) =>
      prefixes.isEmpty || prefixes.exists(k.startsWith)
    }.toSeq.sortBy(_._1)
    keys.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    keys.foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"[timekeys] $name%-30s $t%8.3f s")
    }
    spark.stop()
  }
}
