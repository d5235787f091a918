package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partition pruning — the other half of the scan story next to
  * BucketingSpec: a dataset laid out as `partitionBy(col)` directories must
  * serve an equality filter by READING ONLY the matching directory
  * (PartitionFilters in the scan, not a post-scan Filter). At 100 TB this
  * is the difference between scanning one partition and scanning the lake. */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("event_type-partitioned layout prunes to one directory for an equality filter") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.engine.Tables.events(spark, sfSmoke)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "the equality predicate must land in PartitionFilters:\n" + plan)
    // the data filter list must NOT re-check event_type (it never reaches rows)
    assert(!plan.replaceAll("(?s)PartitionFilters.*?]", "")
      .contains("PushedFilters: [IsNotNull(event_type)"),
      "partition column must not appear as a row-level pushed filter")

    // row counts survive the layout round trip
    val expected = graft.engine.Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "purchase").count()
    assert(q.count() === expected)

    // and the file index only selects the one directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.linesIterator.filter(_.contains("Location")))
    assert(scanned.nonEmpty)
  }
}
