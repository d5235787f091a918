package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proves the scale claim written on x78 (and SURVEY §5): pre-bucketing both
  * fact tables on the join key DELETES the join's shuffle. At warehouse
  * scale this is the difference between re-shuffling 100 TB per query and
  * reading co-located buckets; here we assert the physical plan actually
  * loses its exchanges when the inputs are bucketed. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("orderkey-bucketed lineitem ⋈ orders plans SMJ with no shuffle exchange") {
    val dir = Files.createTempDirectory("graft_buckets")
    val li = graft.engine.Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_returnflag", "l_shipdate")
    val ord = graft.engine.Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_orderdate")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/ord").saveAsTable("ord_bucketed")
    // force the sort-merge path (a broadcast would trivially have no
    // exchange); with both sides bucketed 8-way on the key, SMJ must read
    // co-located buckets directly
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "expected the shuffle-free SMJ path")
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed-by-key inputs must not re-shuffle for the join:\n" + plan)
      // and it computes the same thing as the plain shuffled join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
