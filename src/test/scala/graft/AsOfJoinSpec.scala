package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The native as-of join (logical node + strategy + exec) — crafted-case
  * semantics plus exact equivalence with the composed q11 formulation. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("crafted cases: latest-strictly-earlier, ties, no-match, cross-key") {
    val leftDf = Seq(
      (1L, 10L, 1000000L),  // user 10: clicks at 100, 900 -> match 900
      (2L, 10L, 100000L),   // before any click -> null
      (3L, 20L, 500000L),   // user 20 has no clicks -> null
      (4L, 30L, 700000L)    // click exactly at 700000 is NOT earlier -> 300000
    ).toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"))
    val rightDf = Seq(
      (10L, 100000L), (10L, 900000L),
      (30L, 300000L), (30L, 700000L),
      (99L, 1L)
    ).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val out = AsOf.joinAsOf(leftDf, rightDf, "user_id", "ts", "ts", "prior")
      .select(col("event_id"), unix_micros(col("prior")).as("p"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out === Map(1L -> Some(900000L), 2L -> None, 3L -> None, 4L -> Some(300000L)))
  }

  test("randomized: native == composed on 20k rows, 500 keys, dup timestamps") {
    // seeded LCG — deterministic across runs, no Random in test data
    var s = 42L
    def next(mod: Int): Long = { s = s * 6364136223846793005L + 1442695040888963407L
      math.floorMod(s >>> 33, mod.toLong) }
    val left = (0 until 4000).map { i =>
      (i.toLong, next(500), next(100000) * 1000000L) } // (id, key, us)
    val right = (0 until 16000).map { _ => (next(500), next(100000) * 1000000L) }
    val leftDf = left.toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"), timestamp_micros(col("us")).as("ts"))
    val rightDf = right.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val native = AsOf.joinAsOf(leftDf, rightDf, "user_id", "ts", "ts", "prior")
      .select(col("event_id"), unix_micros(col("prior")).as("p"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // composed oracle in plain Scala
    val byKey = right.groupBy(_._1)
    val expected = left.map { case (id, k, us) =>
      val prior = byKey.getOrElse(k, Seq.empty).map(_._2).filter(_ < us)
      id -> (if (prior.isEmpty) None else Some(prior.max))
    }.toMap
    assert(native === expected)
  }

  test("x23 native operator equals q11 composed formulation exactly") {
    val a = graft.queries.Relational1.q11(spark, TestSpark.sfSmoke).collect().toSeq
    val b = graft.queries.Pipeline.x23(spark, TestSpark.sfSmoke).collect().toSeq
    assert(a === b)
  }

  test("the plan is the merge operator, not a pair-materializing join") {
    val p = graft.queries.Pipeline.x23(spark, TestSpark.sfSmoke)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(300))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "no generic join should appear — the operator replaces it")
  }
}
