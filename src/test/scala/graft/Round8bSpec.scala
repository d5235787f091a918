package graft

import org.scalatest.funsuite.AnyFunSuite

/** x155–x164 structural invariants — the WHY behind the DuckDB hash match
  * for the remaining TPC-H shapes: the top-k is the true total-order
  * prefix (and physically a TakeOrderedAndProject, not a global sort),
  * conditional shares are genuine numerator⊆denominator decompositions,
  * the disjunction partitions into its brand-disjoint clauses, the EXISTS
  * population really has a late lineitem, and the Q11 threshold holds
  * row-by-row. */
class Round8bSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Relational4

  test("x155 top-10 equals the prefix of the full total order; plan is a TakeOrdered") {
    val top = Relational4.x155(spark, sfSmoke)
    val rows = top.collect()
    assert(rows.length === 10)
    // total order: revenue DESC, then date, then orderkey — verify the
    // collected prefix is sorted and tie-free on the composite key
    val keys = rows.map(r => (-r.getLong(3), r.getLong(1), r.getLong(0)))
    assert(keys.toSeq === keys.sorted.toSeq)
    assert(keys.distinct.length === keys.length)
    val phys = top.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      "top-k must be a per-partition heap, not a global sort")
  }

  test("x156 both directions keyed to the pair; revenue positive") {
    val rows = Relational4.x156(spark, sfSmoke).collect()
    assert(rows.nonEmpty, "vacuous at smoke scale — pick other nations")
    rows.foreach { r =>
      val pair = Set(r.getString(0), r.getString(1))
      assert(pair.subsetOf(Set("NATION_12", "NATION_10")))
      assert(r.getLong(4) > 0)
    }
  }

  test("x157/x159 share = numerator/denominator with numerator ⊆ denominator") {
    Seq(Relational4.x157(spark, sfSmoke).collect().map(r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3))),
        Relational4.x159(spark, sfSmoke).collect().map(r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .foreach { rows =>
        assert(rows.nonEmpty)
        rows.foreach { case (num, den, share) =>
          assert(num >= 0 && num <= den)
          assert(math.abs(share - math.rint(num.toDouble / den * 1e6) / 1e6)
                   < 1e-9)
        }
        assert(rows.map(_._1).sum > 0, "numerator vacuous at smoke scale")
      }
  }

  test("x158 profit decomposes: revenue minus retail cost, widget slice only") {
    val out = Relational4.x158(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val nLi = out.map(_.getLong(2)).sum
    val widgetLi = Tables.lineitem(spark, sfSmoke)
      .join(Tables.part(spark, sfSmoke)
              .filter(col("p_name").endsWith("widget")),
            col("l_partkey") === col("p_partkey")).count()
    assert(nLi === widgetLi, "every widget lineitem counted exactly once")
  }

  test("x160 counts match a naive distinct rebuild and honor the exclusion") {
    val out = Relational4.x160(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    val excluded = Tables.supplier(spark, sfSmoke)
      .filter(col("s_acctbal") < 1000).select("s_suppkey").collect()
      .map(_.getLong(0)).toSet
    val naive = Tables.lineitem(spark, sfSmoke)
      .join(Tables.part(spark, sfSmoke)
              .filter(col("p_size").isin(1, 5, 9, 13) &&
                      col("p_brand") =!= "Brand#13"),
            col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_size", "l_suppkey").distinct().collect()
      .filterNot(r => excluded.contains(r.getLong(2)))
      .groupBy(r => (r.getString(0), r.getInt(1).toLong))
      .view.mapValues(_.length.toLong).toMap
    assert(out === naive)
  }

  test("x161 the disjunction partitions into its brand-disjoint clauses") {
    val row = Relational4.x161(spark, sfSmoke).head()
    val li = Tables.lineitem(spark, sfSmoke)
      .join(Tables.part(spark, sfSmoke),
            col("l_partkey") === col("p_partkey"))
    def clause(brand: String, szHi: Int, qLo: Int, qHi: Int): Long =
      li.filter(col("p_brand") === brand &&
                col("p_size").between(1, szHi) &&
                col("l_quantity").between(qLo, qHi)).count()
    val parts = clause("Brand#12", 5, 1, 11) +
      clause("Brand#23", 10, 10, 20) + clause("Brand#7", 15, 20, 30)
    assert(row.getLong(0) === parts,
      "brand-disjoint clauses must partition the matched set")
    assert(row.getLong(0) > 0, "vacuous at smoke scale")
  }

  test("x162 winners carry exactly the scalar max revenue") {
    val out = Relational4.x162(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getLong(2)).distinct
    assert(revs.length === 1, "all winners tie at the max")
  }

  test("x163 every counted order has a >60-day-late lineitem; totals agree") {
    val out = Relational4.x163(spark, sfSmoke).collect()
    assert(out.map(_.getLong(1)).sum > 0)
    // rebuild via distinct orderkeys of the late join
    val late = Tables.orders(spark, sfSmoke)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(Tables.lineitem(spark, sfSmoke),
            col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(out.map(_.getLong(1)).sum === late)
  }

  test("x164 reported set is exactly the parts above 2x the mean value") {
    val out = Relational4.x164(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // naive rebuild of the full per-part value table for the nation
    val supps = Tables.supplier(spark, sfSmoke)
      .join(Tables.nation(spark, sfSmoke)
              .filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val all = Tables.lineitem(spark, sfSmoke)
      .select(col("l_suppkey"), col("l_partkey"),
              (col("l_quantity").cast("long") *
               round(col("l_extendedprice") * 100, 0).cast("long")).as("v"))
      .collect()
      .filter(r => supps.contains(r.getLong(0)))
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = all.values.sum
    val n = all.size.toLong
    val expect = all.filter { case (_, v) => v * n > total * 2L }
    assert(out === expect)
  }

  test("x178 Q10 top-20: tie-free descending order, returned lineitems only, TakeOrdered plan") {
    val df = Relational4.x178(spark, sfSmoke)
    val rows = df.collect()
    assert(rows.length === 20)
    val keys = rows.map(r => (-r.getLong(4), r.getLong(0)))
    assert(keys.toSeq === keys.sorted.toSeq)
    assert(keys.distinct.length === keys.length)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("x179 Q12 class split partitions the late-line population") {
    val out = Relational4.x179(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val total = out.map(r => r.getLong(1) + r.getLong(2)).sum
    val late = Tables.lineitem(spark, sfSmoke)
      .join(Tables.orders(spark, sfSmoke),
            col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .count()
    assert(total === late, "high + low must partition every late lineitem")
  }
}
