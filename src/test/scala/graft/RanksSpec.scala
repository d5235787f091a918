package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** graft.engine.Ranks: the distributed global row number must agree with
  * the single-partition window's answer on every total order, including
  * duplicate sort keys broken by a unique tiebreak. */
class RanksSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("globalRowNumber == single-partition row_number under a total order") {
    // duplicate keys (k = id % 7) force the tiebreak to matter; 12
    // initial partitions force real range-partition boundaries
    val df = spark.range(0, 5000, 1, 12).toDF("id")
      .withColumn("k", col("id") % 7)
    val got = graft.engine.Ranks
      .globalRowNumber(df, Seq(col("k").desc, col("id")), "r")
      .select(col("id"), col("r"))
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
      .select(col("id"), col("r"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "distributed rank must equal the window rank row-for-row")
    // ranks are a permutation of 1..n (no gaps, no dups across partitions)
    val n = got.count()
    assert(got.agg(countDistinct(col("r")), min(col("r")), max(col("r")))
      .as[(Long, Long, Long)].head() === ((n, 1L, n)))
  }

  test("globalRowNumber is run-to-run stable through a NESTED rank (the x95 shape)") {
    // round-9 regression: before the eager-checkpoint fix, the ranged
    // exchange was computed TWICE (data side + counts side) with
    // independently-sampled range boundaries, and when exchange reuse
    // didn't kick in — observed at 4 shuffle partitions under a nested
    // rank — a boundary-adjacent row's rank drifted ±100 RUN-TO-RUN.
    // Drive the exact shape (rank of a rank, like x95's r_len→r_div) at
    // the failing partition count, several times, and demand the window
    // truth every time.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val df = spark.range(0, 5000, 1, 12).toDF("id")
        .withColumn("a", (col("id") * 131) % 997)
        .withColumn("b", (col("id") * 37) % 991)
      val want = df
        .withColumn("r1", row_number().over(Window.orderBy(col("a").desc, col("id"))).cast("long"))
        .withColumn("r2", row_number().over(Window.orderBy(col("b").desc, col("id"))).cast("long"))
        .select(col("id"), col("r1"), col("r2"))
      for (run <- 1 to 3) {
        val got = graft.engine.Ranks.globalRowNumber(
            graft.engine.Ranks.globalRowNumber(
              df, Seq(col("a").desc, col("id")), "r1"),
            Seq(col("b").desc, col("id")), "r2")
          .select(col("id"), col("r1"), col("r2"))
        assert(got.except(want).isEmpty && want.except(got).isEmpty,
          s"run $run: nested distributed ranks must equal the window ranks")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("globalRowNumber of an empty frame is empty (offset window edge)") {
    val df = spark.range(0).toDF("id")
    assert(graft.engine.Ranks
      .globalRowNumber(df, Seq(col("id")), "r").count() === 0L)
  }

  test("globalPrefixSum == single-partition cumulative sum under a total order") {
    val df = spark.range(0, 3000, 1, 9).toDF("id")
      .withColumn("v", (col("id") * 7) % 13)
    val got = graft.engine.Ranks
      .globalPrefixSum(df, Seq(col("id")), col("v"), "c")
      .select(col("id"), col("c"))
    val want = df.withColumn("c", sum(col("v")).over(
        Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("c"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "distributed prefix sum must equal the window answer row-for-row")
  }
}
