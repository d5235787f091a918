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
