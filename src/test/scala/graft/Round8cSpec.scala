package graft

import org.scalatest.funsuite.AnyFunSuite

/** x165–x169 structural invariants: the apportionment sums to EXACTLY the
  * budget (the property per-source rounding can't give), the bucketed
  * pair join is exhaustive against the naive source-only join, the
  * profile matches recomputed scalars, the co-purchase argmax equals a
  * naive rebuild, and the CUSUM telescopes to zero over each full
  * series. */
class Round8cSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Organize2

  test("x165 allocation sums to exactly the 1,000,000 budget, ±1 of proportional") {
    val rows = Organize2.x165(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    assert(rows.map(_.getLong(2)).sum === 1000000L)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble * 1000000L / total
      assert(math.abs(r.getLong(2) - exact) < 1.0,
        s"${r.getString(0)} alloc ${r.getLong(2)} vs exact $exact")
    }
  }

  test("x166 bucketed join is exhaustive: equals the naive source-only join") {
    val got = Organize2.x166(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val d = Tables.documents(spark, sfSmoke)
      .select(col("source"), col("doc_id"), col("lang"),
              col("n_chars").cast("long").as("n_chars"))
    val naive = d.as("a").join(d.as("b"),
        col("a.source") === col("b.source") &&
        col("a.lang") === "en" && col("b.lang") =!= "en" &&
        abs(col("a.n_chars") - col("b.n_chars")) <= 25)
      .select(col("a.source"), col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    assert(got.nonEmpty, "vacuous at smoke scale")
  }

  test("x167 profile rows match directly recomputed scalars") {
    val prof = Organize2.x167(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(prof.size === 12)
    val o = Tables.orders(spark, sfSmoke)
    assert(prof(("o_custkey", "n_nonnull")) === o.count())
    assert(prof(("o_custkey", "n_distinct")) ===
      o.select("o_custkey").distinct().count())
    assert(prof(("o_custkey", "max")) ===
      o.agg(max("o_custkey")).head().getLong(0))
    assert(prof(("total_cents", "n_distinct")) ===
      o.select(round(col("o_totalprice") * 100, 0)).distinct().count())
  }

  test("x168 every argmax equals the naive per-part best partner") {
    val got = Organize2.x168(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // naive rebuild from collected order-part sets
    val op = Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val counts = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { parts =>
      for (a <- parts; b <- parts if a != b)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
    }
    val naive = counts.toSeq.groupBy(_._1._1).view.mapValues { cs =>
      cs.map { case ((_, partner), n) => (partner, n) }
        .minBy { case (partner, n) => (-n, partner) }
    }.toMap
    assert(got === naive)
  }

  test("x169 CUSUM telescopes: deviations sum to zero, peak day in range") {
    val out = Organize2.x169(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // telescoping: sum of (cnt·n_days − total) over a full series is
    // n_days·total − n_days·total = 0, so the LAST cusum is 0 and the
    // peak is strictly interior unless the series is flat
    val daily = Tables.events(spark, sfSmoke)
      .groupBy(col("event_type"),
               expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
    out.foreach { r =>
      val series = daily(r.getString(0)).map(x => (x.getLong(1), x.getLong(2)))
        .sortBy(_._1)
      val n = series.length.toLong
      val tot = series.map(_._2).sum
      var cs = 0L; var best = 0L; var bestDay = Long.MaxValue
      series.foreach { case (day, cnt) =>
        cs += cnt * n - tot
        if (math.abs(cs) > best) { best = math.abs(cs); bestDay = day }
      }
      assert(r.getLong(1) === best)
      assert(r.getLong(2) === bestDay)
      assert(cs === 0L, "CUSUM must telescope to zero")
    }
  }
}
