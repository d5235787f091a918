package graft

import org.scalatest.funsuite.AnyFunSuite

/** x210 k-anonymity / x211 l-diversity — each audit replayed naively in-JVM
  * from the raw tables (the hash compare proves engine parity; this proves
  * the SEMANTICS: the class counts really are Sweeney/Machanavajjhala's). */
class GovernanceSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  private def naiveQi() = Tables.customer(spark, sfSmoke)
    .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal").collect()
    .map(r => (r.getLong(0),
               (r.getInt(1), r.getString(2),
                math.floor(r.getDouble(3) / 1000).toLong)))

  test("x210 equals the naive k-anonymity recount; risk mass is monotone in k") {
    val classes = naiveQi().groupBy(_._2).view.mapValues(_.length).toMap
    val total = classes.values.sum
    val got = graft.queries.Governance.x210(spark, sfSmoke).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 5L, 10L, 25L))
    got.foreach { r =>
      val k = r.getLong(0)
      val risky = classes.filter(_._2 < k)
      assert(r.getLong(1) === classes.size.toLong, s"n_classes at k=$k")
      assert(r.getLong(2) === risky.size.toLong, s"risky_classes at k=$k")
      assert(r.getLong(3) === risky.values.sum.toLong, s"risky_rows at k=$k")
      val share = BigDecimal(risky.values.sum.toLong.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - share) < 1e-12, s"risk_share at k=$k")
    }
    // non-vacuity + monotonicity: some but not all classes risky at k=2,
    // and growing k can only widen the risky set
    assert(got.head.getLong(2) > 0 && got.head.getLong(2) < classes.size)
    assert(got.map(_.getLong(3)).toSeq === got.map(_.getLong(3)).toSeq.sorted)
  }

  test("x211 equals the naive l-diversity recount over customer orders") {
    val qi = naiveQi().toMap
    val orders = Tables.orders(spark, sfSmoke)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (ck, _) => qi.contains(ck) }
    val byClass = orders.groupBy { case (ck, _) => qi(ck) }
    val got = graft.queries.Governance.x211(spark, sfSmoke).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 3L, 5L))
    got.foreach { r =>
      val l = r.getLong(0)
      val weak = byClass.filter(_._2.map(_._2).distinct.length < l)
      assert(r.getLong(1) === byClass.size.toLong, s"n_classes at l=$l")
      assert(r.getLong(2) === weak.size.toLong, s"weak_classes at l=$l")
      assert(r.getLong(3) ===
        weak.values.map(_.map(_._1).distinct.length.toLong).sum,
        s"exposed_members at l=$l")
      assert(r.getLong(4) === weak.values.map(_.length.toLong).sum,
        s"exposed_orders at l=$l")
    }
    // non-vacuity: the diversity spectrum is non-trivial at l=5 on this data
    assert(got.last.getLong(2) > 0, "some class must be under-diverse at l=5")
  }

  test("x212 suppression release: rows conserved, risk shrinks, min class size weakly grows") {
    val classes = naiveQi().groupBy(_._2).view.mapValues(_.length).toMap
    val total = classes.values.sum
    // naive one-step release: risky bands collapse to None within (nation, segment)
    val released = naiveQi().map { case (_, (n, s, b)) =>
      if (classes((n, s, b)) >= 5) (n, s, Some(b)) else (n, s, None)
    }
    val classes2 = released.groupBy(identity).view.mapValues(_.length).toMap
    val got = graft.queries.Governance.x212(spark, sfSmoke).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("raw", "suppressed"))
    val Array(raw, sup) = got
    assert(raw.getLong(1) === classes.size.toLong)
    assert(raw.getLong(2) === classes.count(_._2 < 5).toLong)
    assert(sup.getLong(1) === classes2.size.toLong)
    assert(sup.getLong(2) === classes2.count(_._2 < 5).toLong)
    assert(sup.getLong(3) === classes2.values.filter(_ < 5).sum.toLong)
    assert(sup.getLong(4) === classes2.values.min.toLong)
    // the release theorems: generalization merges classes (sizes weakly
    // grow, so min class size cannot drop), risk mass strictly shrinks on
    // this data, and no rows are created or destroyed
    assert(sup.getLong(4) >= raw.getLong(4), "min class size must not drop")
    assert(sup.getLong(3) < raw.getLong(3), "suppression must shrink risk mass")
    assert(classes2.values.sum === total, "release must conserve rows")
  }
}
