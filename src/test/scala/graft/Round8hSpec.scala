package graft

import org.scalatest.funsuite.AnyFunSuite

/** x197 dynamic-partition-pruning invariants: the mechanism must actually
  * fire (a `dynamicpruningexpression` in the fact scan's PartitionFilters —
  * a literal year list would constant-fold into STATIC pruning and prove
  * nothing), and the result must equal the plain unpartitioned recompute
  * (layout changes where bytes sit, never what the rows are). */
class Round8hSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Layout

  test("x197 plan carries a dynamic-pruning partition filter") {
    val df = Layout.x197(spark, sfSmoke)
    df.collect() // finalize AQE so the executed plan is the real one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the fact scan:\n$plan")
  }

  test("x209 backfill rewrites ONLY the corrected year's partition") {
    val base = Tables.orders(spark, sfSmoke)
      .select(year(col("o_orderdate")).cast("long").as("y"), col("o_totalprice"))
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    // same IEEE ops as the engine: corrected 1995 prices are (p+0.01),
    // cents via BigDecimal HALF_UP of p*100 (Spark's round)
    def cents(p: Double): Long =
      BigDecimal(p * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = base.groupBy(_._1).view.mapValues { rows =>
      (rows.size.toLong,
       rows.map { case (y, p) => cents(if (y == 1995) p + 0.01 else p) }.sum)
    }.toMap
    val got = Layout.x209(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
    // static-overwrite regression would truncate to one year
    assert(got.size > 1, "non-1995 partitions must survive the backfill")
  }

  test("x197 equals the plain unpartitioned semi-join recompute") {
    val expect = {
      val o = Tables.orders(spark, sfSmoke)
        .select(year(col("o_orderdate")).cast("long").as("y"),
                round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      val keep = o.collect { case (y, _) if y < 1996 => y }.toSet
      // the dim filter (orders before 1996) keeps exactly the pre-1996 years
      o.filter(t => keep(t._1)).groupBy(_._1)
        .map { case (y, rows) =>
          y -> (rows.size.toLong, rows.map(_._2).sum) }
    }
    val got = Layout.x197(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
    assert(got.keySet === Set(1995L), "dim filter must pin years to {1995}")
  }
}
