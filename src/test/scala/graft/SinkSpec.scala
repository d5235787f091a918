package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sink-side coverage: partitioned parquet writes and the partition pruning
  * they unlock — at 100 TB, writing event data partitioned by date and having
  * the optimizer prune to one partition is the difference between a full scan
  * and a point read. */
class SinkSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("partitioned parquet sink + partition pruning at read") {
    val out = Files.createTempDirectory("sink").toString + "/events_by_type"
    graft.engine.Tables.events(spark, sfSmoke)
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val back = spark.read.parquet(out)
    val one = back.filter(col("event_type") === "purchase")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "the event_type predicate must prune partitions, not filter rows:\n" + plan.take(600))
    // value parity through the sink round-trip
    val direct = graft.engine.Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "purchase").count()
    assert(one.count() === direct)
  }

  test("sorted single-file parquet sink preserves order (Verify contract)") {
    val out = Files.createTempDirectory("sink2").toString + "/q12"
    graft.queries.Relational1.q12(spark, sfSmoke)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).collect().map(_.getString(0))
    assert(back.toSeq === back.sorted.toSeq, "row order must survive the sink")
  }
}
