package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** x265 (data-quality expectation audit) and x266 (SCD Type-2 build):
  * planted-violation exactness, naive JVM replay, and the structural
  * theorems of half-open validity intervals. */
class Round11Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import spark.implicits._

  test("x265 reports the corpus's KNOWN state: two real violations, the rest clean") {
    // the synthetic corpus is TPC-H-ish, not TPC-H: (l_orderkey,
    // l_linenumber) is NOT unique (the x41 scaladoc documents the
    // duplicate rows) and some lineitems ship before their order date —
    // the audit must SURFACE those, not vacuously pass
    val rows = graft.queries.Governance.x265(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length === 9)
    val byName = rows.map(r => r._1 -> r).toMap
    assert(!byName("lineitem_pk_unique")._4 &&
           byName("lineitem_pk_unique")._3 > 0)
    assert(!byName("lineitem_ship_after_order")._4 &&
           byName("lineitem_ship_after_order")._3 > 0)
    val clean = rows.filterNot(r =>
      r._1 == "lineitem_pk_unique" || r._1 == "lineitem_ship_after_order")
    assert(clean.forall(_._4), s"unexpected failures: ${clean.filterNot(_._4).toSeq}")
    // pass is exactly the violations predicate (ratio gate for completeness)
    rows.foreach { case (n, nc, v, p) =>
      if (n == "events_props_99pct_complete") assert(p === (v * 100 <= nc))
      else assert(p === (v == 0))
    }
    // lineitem row-local constraints audited the same row count
    val liN = rows.filter(_._1.startsWith("lineitem_")).filterNot(_._1.contains("fk"))
      .filterNot(_._1.contains("ship_after")).filterNot(_._1.contains("pk"))
      .map(_._2).distinct
    assert(liN.length === 1)
  }

  test("x265 planted violations are counted exactly, and pass flips") {
    val tmp = java.nio.file.Files.createTempDirectory("x265dir").toString
    // base rows cloned from the smoke corpus keep full schemas; violations
    // are planted with known multiplicities
    val liDf = Tables.lineitem(spark, sfSmoke).limit(6)
      .withColumn("rn", monotonically_increasing_id())
    val planted = liDf
      .withColumn("l_orderkey",
        when(col("rn") === 0, lit(999999999L)).otherwise(col("l_orderkey"))) // orphan FK
      .withColumn("l_discount",
        when(col("rn") === 1, lit(0.5)).otherwise(col("l_discount")))        // range
      .withColumn("l_returnflag",
        when(col("rn") === 2, lit("X")).otherwise(col("l_returnflag")))      // set
      .drop("rn")
    // duplicate the first TWO rows once each -> 2 extra-beyond-first PK rows
    val withDups = planted.unionByName(planted.limit(2))
    withDups.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Tables.orders(spark, sfSmoke)
      .join(withDups.select(col("l_orderkey").as("o_orderkey")).distinct(),
            Seq("o_orderkey"))
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // events: 10 rows, exactly 2 with empty props -> 20% > 1% gate
    Tables.events(spark, sfSmoke).limit(10)
      .withColumn("rn", monotonically_increasing_id())
      .withColumn("props", when(col("rn") < 2, lit("")).otherwise(col("props")))
      .drop("rn")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.Governance.x265(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // the orphan row was duplicated once (rn=0 is in the first two), so 2
    assert(got("lineitem_orderkey_fk") === ((2L, false)))
    assert(got("lineitem_discount_in_0_0.1") === ((2L, false)))
    assert(got("lineitem_returnflag_in_set")._2 === false)
    assert(got("lineitem_pk_unique") === ((2L, false)))
    assert(got("events_props_99pct_complete") === ((2L, false)))
    assert(got("lineitem_quantity_not_null")._2 === true)
  }

  test("x266 equals a naive JVM SCD2 replay at sf0.001") {
    val evs = Tables.events(spark, sfSmoke)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // compress runs of equal event_type
      val runs = ordered.foldLeft(List.empty[(String, Long, Long)]) {
        case (acc, (_, us, _, t)) => acc match {
          case (pt, from, n) :: rest if pt == t => (pt, from, n + 1) :: rest
          case _ => (t, us, 1L) :: acc
        }
      }.reverse
      runs.zipWithIndex.map { case ((seg, from, n), i) =>
        val to = if (i + 1 < runs.length) runs(i + 1)._2 else -1L
        (uid, (i + 1).toLong, seg, from, to, to == -1L, n)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Wrangle.x266(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
                 r.getLong(4), r.getBoolean(5), r.getLong(6))).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("x266 structural theorems: contiguous versions, half-open non-overlap, one current") {
    val rows = graft.queries.Wrangle.x266(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
                 r.getLong(4), r.getBoolean(5), r.getLong(6)))
    val byUser = rows.groupBy(_._1)
    val total = Tables.events(spark, sfSmoke).count()
    assert(rows.map(_._7).sum === total, "every event lives in exactly one version")
    for ((u, vs0) <- byUser) {
      val vs = vs0.sortBy(_._2)
      assert(vs.map(_._2).toSeq === (1L to vs.length).toSeq,
             s"user $u versions must be contiguous from 1")
      assert(vs.count(_._6) === 1 && vs.last._6, s"user $u: exactly the last version is current")
      for (w <- vs.sliding(2) if w.length == 2; a = w(0); b = w(1)) {
        assert(a._5 === b._4, s"user $u: valid_to must equal the next valid_from")
        assert(a._4 <= a._5, s"user $u: interval must not be inverted")
        assert(a._3 !== b._3, s"user $u: consecutive versions must differ in value")
      }
    }
  }

  test("x267 equals a naive JVM point-in-time replay at sf0.001") {
    val evs = Tables.events(spark, sfSmoke)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_type"),
              expr("coalesce(CAST(round(value * 1000, 0) AS BIGINT), -1L)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
                 r.getLong(4)))
    val byUser = evs.groupBy(_._2)
    val want = evs.filter(_._4 == "purchase").map { p =>
      val prior = byUser(p._2).filter(e => e._3 < p._3)
      val lastVal = prior.filter(_._4 != "purchase")
        .sortBy(e => (e._3, e._1)).lastOption.map(_._5).getOrElse(-1L)
      (p._1, p._2, p._3,
       prior.count(_._4 == "click").toLong,
       prior.count(_._4 == "view").toLong, lastVal)
    }.sortBy(_._1).toSeq
    val got = graft.queries.Features.x267(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("x267 never leaks a same-instant or label-row feature (the point-in-time contract)") {
    val tmp = java.nio.file.Files.createTempDirectory("x267dir").toString
    // user 1: click@1s, view@2s, purchase@2s (same instant as the view!),
    // purchase@3s with a same-instant click@3s; user 2: a first-event
    // purchase with NO history at all
    val rows = Seq(
      (10L, 1L, 1000000L, "click", 1.5, ""),
      (11L, 1L, 2000000L, "view", 2.5, ""),
      (12L, 1L, 2000000L, "purchase", 9.0, ""),
      (13L, 1L, 3000000L, "click", 3.5, ""),
      (14L, 1L, 3000000L, "purchase", 9.0, ""),
      (20L, 2L, 5000000L, "purchase", 9.0, ""))
    rows.toDF("event_id", "user_id", "us", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
              col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.Features.x267(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(_._1)
    assert(got === Seq(
      // purchase@2s: the same-instant view must NOT count; last val is the
      // 1s click (1500 milli)
      (12L, 1L, 0L, 1500L),
      // purchase@3s: the same-instant click must NOT count; the prior
      // PURCHASE@2s must neither count nor become last_val (view@2s is)
      (14L, 1L, 1L, 2500L),
      // first-ever event: all-zero features, -1 sentinel
      (20L, 0L, 0L, -1L)))
  }

  test("x268 theorems: full diagonal, bounded cells, exact ppm, x54 consistency") {
    val got = graft.queries.Analytics.x268(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4)))
    assert(got.nonEmpty)
    for ((cw, ws, na, cs, ppm) <- got) {
      assert(ws >= 0L, s"cohort $cw: weeks_since must be non-negative")
      assert(na >= 1L && na <= cs, s"cohort $cw week $ws: 1 <= n_active <= cohort_size")
      assert(ppm === na * 1000000L / cs, s"cohort $cw week $ws: ppm must be the exact floor division")
    }
    // week 0: by definition of cohorting, EVERY member is active
    val diag = got.filter(_._2 == 0L)
    assert(diag.map(_._1).toSet === got.map(_._1).toSet, "every cohort has its week-0 cell")
    diag.foreach { case (cw, _, na, cs, ppm) =>
      assert(na === cs && ppm === 1000000L, s"cohort $cw: week-0 retention must be 100%")
    }
    // cohort sizes partition the user base
    val users = Tables.events(spark, sfSmoke).select("user_id").distinct().count()
    assert(diag.map(_._4).sum === users)
    // the <=3-offset cells must agree with x54's independent counts
    val x54 = graft.queries.Analytics.x54(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.filter(_._2 <= 3L).map(t => (t._1, t._2, t._3)).toSet === x54)
  }

  test("x269 emits exactly the modular-construction diff and nothing for the unchanged majority") {
    val keys = Tables.orders(spark, sfSmoke).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val got = graft.queries.Wrangle.x269(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
                 r.getLong(4), r.getLong(5)))
    val byOp = got.groupBy(_._2)
    // snapshot construction: ≡3 (mod 10) arrives in B only; ≡7 (mod 10)
    // exists in A only; ≡0 (mod 5) (never ≡3/≡7) is price-restated
    assert(byOp("insert").map(_._1).toSet === keys.filter(_ % 10 == 3))
    assert(byOp("delete").map(_._1).toSet === keys.filter(_ % 10 == 7))
    assert(byOp("update").map(_._1).toSet === keys.filter(_ % 5 == 0))
    assert(got.length === byOp.values.map(_.length).sum)
    // sentinels point the right way; updates restate price by exactly +100
    byOp("insert").foreach { r => assert(r._3 === "" && r._5 === -1L && r._6 >= 0L) }
    byOp("delete").foreach { r => assert(r._4 === "" && r._6 === -1L && r._5 >= 0L) }
    byOp("update").foreach { r =>
      assert(r._6 === r._5 + 100L && r._3 === r._4)
    }
  }

  test("x270 is exactly the per-month rollup of x269 (cross-key consistency)") {
    val diff = graft.queries.Wrangle.x269(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val month = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM").as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = diff.groupBy { case (k, _) => month(k) }
    val plan = graft.queries.Wrangle.x270(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(plan.nonEmpty)
    val nB = Tables.orders(spark, sfSmoke)
      .filter(col("o_orderkey") % 10 =!= 7).count()
    assert(plan.map(_._5).sum === nB, "partition sizes must sum to |B|")
    for ((m, ins, del, upd, after, ppm, flag) <- plan) {
      val ops = want.getOrElse(m, Array.empty).map(_._2)
      assert(ins === ops.count(_ == "insert"), s"month $m inserts")
      assert(del === ops.count(_ == "delete"), s"month $m deletes")
      assert(upd === ops.count(_ == "update"), s"month $m updates")
      val churn = ins + del + upd
      assert(flag === (churn > 0L), s"month $m flag")
      assert(ppm === (if (after == 0L) -1L else churn * 1000000L / after),
             s"month $m ppm")
    }
    // every month with rows in either snapshot appears in the manifest
    assert(plan.map(_._1).toSet === month.values.toSet)
  }

  test("x271 equals a JVM greedy-MMR replay over the engine's own pool and sim matrix") {
    val emb = Tables.embeddings(spark, sfSmoke)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val queries = emb.filter(_._1 < 5)
    val cands = emb.filter(_._1 >= 5)
    val want = queries.sortBy(_._1).flatMap { case (qid, qe) =>
      val pool = cands.map { case (cid, ce) => (cid, ce, cos6(ce, qe)) }
        .sortBy { case (cid, _, rel) => (-rel, cid) }.take(12)
      var selected = List.empty[(Long, Long, Double)] // (pick, cid, mmr)
      for (r <- 1 to 5) {
        val rest = pool.filterNot(p => selected.exists(_._2 == p._1))
        val scored = rest.map { case (cid, ce, rel) =>
          val maxsim = if (selected.isEmpty) 0.0
            else selected.map(s => cos6(ce, pool.find(_._1 == s._2).get._2)).max
          (cid, 0.7 * rel - 0.3 * maxsim)
        }
        val (cid, mmr) = scored.minBy { case (c, m) => (-m, c) }
        selected ::= ((r.toLong, cid, mmr))
      }
      selected.reverse.map { case (pick, cid, mmr) =>
        (qid, pick, cid,
         BigDecimal(mmr * 1000000.0)
           .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong)
      }
    }.toSeq
    val got = graft.queries.Clustering.x271(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(want.length === 25 && got === want)
  }

  test("x272 deciles exactly partition the population and every rate is the exact floor division") {
    val li = Tables.lineitem(spark, sfSmoke)
    val totalN = li.count()
    val totalP = li.filter(col("l_extendedprice") > 95000).count()
    val rows = graft.queries.ChiMl.x272(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (1L to 10L))
    // exact interval partition: n_d = floor(dN/10) - floor((d-1)N/10)
    rows.foreach { case (d, n, _, _, _, _) =>
      assert(n === d * totalN / 10 - (d - 1) * totalN / 10, s"decile $d size")
    }
    assert(rows.map(_._2).sum === totalN)
    assert(rows.map(_._3).sum === totalP, "positives are conserved")
    // rates replay as exact integer floor divisions
    val base = totalP * 1000000L / totalN
    var cum = 0L
    rows.foreach { case (d, n, np, rate, capture, lift) =>
      cum += np
      assert(rate === np * 1000000L / n, s"decile $d rate")
      assert(capture === cum * 1000000L / totalP, s"decile $d capture")
      assert(lift === rate * 1000000L / base, s"decile $d lift")
    }
    assert(rows.last._5 === 1000000L, "decile 10 captures everything")
    // the model orders positives ahead of the base rate: decile-1 lift > 1x
    assert(rows.head._6 > 1000000L, "top decile must beat the base rate")
  }

  test("x273 equals a naive JVM profile replay of both snapshots") {
    val orders = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey"), col("o_orderstatus"),
              expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("pc"),
              date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def lpad12(v: Long) = { val s = v.toString; "0" * (12 - s.length) + s }
    def prof(rows: Seq[(Long, String, Long, String)]) = {
      val long = rows.flatMap { case (_, st, pc, m) =>
        Seq(("month", m), ("price_cents", lpad12(pc)), ("status", st)) }
      long.groupBy(_._1).map { case (c, vs) =>
        val v = vs.map(_._2)
        c -> (v.length.toLong, v.distinct.length.toLong, v.min, v.max)
      }
    }
    val a = prof(orders.filter(_._1 % 10 != 3).toSeq)
    val b = prof(orders.filter(_._1 % 10 != 7).toSeq
      .map(r => if (r._1 % 5 == 0) r.copy(_3 = r._3 + 100) else r))
    val got = graft.queries.Wrangle.x273(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getString(4), r.getString(5), r.getLong(6), r.getLong(7),
                 r.getLong(8), r.getString(9), r.getString(10), r.getBoolean(11)))
    assert(got.length === 3)
    got.foreach { case (c, na, nppa, ndva, mna, mxa, nb, nppb, ndvb, mnb, mxb, chg) =>
      val (wna, wndva, wmna, wmxa) = a(c)
      val (wnb, wndvb, wmnb, wmxb) = b(c)
      assert((na, ndva, mna, mxa) === ((wna, wndva, wmna, wmxa)), s"col $c side A")
      assert((nb, ndvb, mnb, mxb) === ((wnb, wndvb, wmnb, wmxb)), s"col $c side B")
      assert(nppa === 0L && nppb === 0L, s"col $c null ppm (corpus has no nulls)")
      assert(chg === (na != nb || ndva != ndvb || mna != mnb || mxa != mxb),
             s"col $c changed flag")
    }
  }

  test("x274 water level: budget exact, caps respected, uncapped within 1 token") {
    val rows = graft.queries.Curation.x274(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
                 r.getLong(4)))
    assert(rows.nonEmpty)
    val totcap = rows.map(_._2).sum
    val budget = totcap * 95L / 100L
    assert(rows.map(_._3).sum === budget, "allocations must sum to the exact budget")
    rows.foreach { case (s, cap, alloc, capped, ppm) =>
      assert(alloc <= cap && alloc >= 0L, s"source $s feasibility")
      // (the converse does not hold: an uncapped source with cap = L+1 that
      // receives the remainder token also lands at alloc == cap)
      if (capped) assert(alloc === cap, s"source $s: capped sources are taken whole")
      assert(ppm === alloc * 1000000L / cap, s"source $s util ppm")
    }
    val un = rows.filterNot(_._4).map(_._3)
    assert(un.nonEmpty, "the 95% budget must leave some source uncapped")
    assert(un.max - un.min <= 1L, "uncapped allocations differ by at most 1 (max-min fairness)")
    val cappedCaps = rows.filter(_._4).map(_._2)
    if (cappedCaps.nonEmpty)
      assert(cappedCaps.max <= un.min,
        "every capped capacity sits at or below the water level")
    // with this corpus the level genuinely bites: both classes exist
    assert(cappedCaps.nonEmpty, "the 95% budget must cap the smallest sources")
  }

  test("x275 equals a naive JVM access-report replay, and no subject is dropped") {
    val subj = Tables.customer(spark, sfSmoke)
      .filter(col("c_custkey") % 29 === 3)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(subj.nonEmpty)
    val orders = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey"), col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(o => subj(o._2))
    val okeys = orders.map(o => o._1 -> o._2).toMap
    val li = Tables.lineitem(spark, sfSmoke)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(l => okeys.contains(l._1))
    val ev = Tables.events(spark, sfSmoke)
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(e => subj(e._1))
    val want = (subj.toSeq.map(s => (s, "customer", 1L, -1L, -1L)) ++
      orders.groupBy(_._2).map { case (s, os) =>
        (s, "orders", os.length.toLong, os.map(_._3).min, os.map(_._3).max) } ++
      li.groupBy(l => okeys(l._1)).map { case (s, ls) =>
        (s, "lineitem", ls.length.toLong, ls.map(_._2).min, ls.map(_._2).max) } ++
      ev.groupBy(_._1).map { case (s, es) =>
        (s, "events", es.length.toLong, es.map(_._2).min, es.map(_._2).max) })
      .sortBy(t => (t._1, t._2))
    val got = graft.queries.Governance.x275(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(got === want)
    // the report covers every cohort member even with zero activity
    assert(got.filter(_._2 == "customer").map(_._1).toSet === subj)
  }

  test("x276 uint8 grid: endpoints attained, bound holds, JVM replay agrees") {
    val rows = graft.queries.Clustering.x276(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.length === 64)
    rows.foreach { case (d, loM, hiM, qmin, qmax, err, ok) =>
      // lo/hi are ATTAINED corpus values, so the grid endpoints are exact
      assert(qmin === 0L && qmax === 255L, s"dim $d grid endpoints")
      assert(ok, s"dim $d must satisfy the half-step reconstruction bound")
      assert(err.toDouble <= (hiM - loM).toDouble / 510.0 + 2.0,
             s"dim $d micro-bound replay")
    }
    // JVM replay of one dimension end to end
    val vs = Tables.embeddings(spark, sfSmoke)
      .select(element_at(col("embedding"), 1).cast("double")).collect()
      .map(_.getDouble(0))
    val (lo, hi) = (vs.min, vs.max)
    val maxErr = vs.map { v =>
      val q = BigDecimal((v - lo) * 255.0 / (hi - lo))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      val recon = lo + q * (hi - lo) / 255.0
      BigDecimal(math.abs(v - recon) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.max
    assert(rows.head._6 === maxErr, "dim-0 max error replays exactly")
  }

  test("x277 shard packing: JVM replay, conservation, contiguity, fill bounds") {
    val budget = 2000L
    val m = 2147483647L
    def rdv(k: Long): Long = {
      val a = ((k % 100000000L) * 2654435761L + 12L * 97564181L) % m
      ((a * a) % m) * a % m
    }
    val docs = Tables.documents(spark, sfSmoke)
      .select(col("doc_id"),
              size(filter(split(lower(col("text")), " "), t => t =!= ""))
                .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDoc = docs.map(_._2).max
    assert(maxDoc < budget, "precondition: every document fits inside one shard")
    // JVM replay of the whole manifest
    val ordered = docs.sortBy { case (id, _) => (rdv(id), id) }
    var cum = 0L
    val want = ordered.map { case (_, t) =>
      val s = cum / budget; cum += t; (s, t)
    }.groupBy(_._1).toSeq.map { case (s, ts) =>
      (s, ts.length.toLong, ts.map(_._2).sum, ts.map(_._2).max)
    }.sortBy(_._1)
    val got = graft.queries.Organize.x277(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // structural theorems
    assert(got.map(_._1) === (0L until got.length).map(_.toLong), "contiguous shard ids")
    assert(got.map(_._2).sum === docs.length.toLong, "document conservation")
    assert(got.map(_._3).sum === docs.map(_._2).sum, "token conservation")
    got.init.foreach { case (s, _, nt, _) =>
      assert(nt > budget - maxDoc, s"shard $s: non-final shards never underfill past one document")
      assert(nt < budget + maxDoc, s"shard $s: a shard overshoots by less than one document")
    }
  }

  test("x278 padding audit: JVM replay and the sorted-batching optimality theorem") {
    val m = 2147483647L
    def rdv(k: Long): Long = {
      val a = ((k % 100000000L) * 2654435761L + 14L * 97564181L) % m
      ((a * a) % m) * a % m
    }
    val docs = Tables.documents(spark, sfSmoke)
      .select(col("doc_id"),
              size(filter(split(lower(col("text")), " "), t => t =!= ""))
                .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def replay(ordered: Seq[Long], name: String, b: Int) = {
      val batches = ordered.grouped(b).toSeq
      (name, b.toLong, batches.length.toLong, ordered.sum,
       batches.map(g => g.length * g.max - g.sum).sum)
    }
    val byLen = docs.sortBy { case (id, t) => (t, id) }.map(_._2).toSeq
    val bySh = docs.sortBy { case (id, _) => (rdv(id), id) }.map(_._2).toSeq
    val want = Seq(replay(byLen, "length_sorted", 8), replay(byLen, "length_sorted", 32),
                   replay(bySh, "shuffled", 8), replay(bySh, "shuffled", 32))
      .map { case (o, b, nb, u, p) => (o, b, nb, u, p, p * 1000000L / (p + u)) }
      .sortBy(t => (t._1, t._2))
    val got = graft.queries.Organize.x278(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    assert(got === want)
    // conservation + the exchange-argument theorem: consecutive grouping of
    // the sorted order minimizes sum-of-batch-maxima over any same-profile
    // partition, so sorted pad <= shuffled pad for each batch size
    for (b <- Seq(8L, 32L)) {
      val s = got.find(r => r._1 == "length_sorted" && r._2 == b).get
      val sh = got.find(r => r._1 == "shuffled" && r._2 == b).get
      assert(s._4 === sh._4, s"B=$b useful tokens are order-invariant")
      assert(s._3 === sh._3, s"B=$b batch counts are order-invariant")
      assert(s._5 <= sh._5, s"B=$b sorted batching must not pad more than shuffled")
    }
  }

  test("x279 fertility: per-language bounds, conservation, planted-corpus JVM replay") {
    val rows = graft.queries.Mining.x279(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val totalToks = Tables.documents(spark, sfSmoke)
      .select(explode(filter(split(lower(col("text")), " "), t => t =!= "")))
      .count()
    assert(rows.map(_._2).sum === totalToks, "word conservation across languages")
    rows.foreach { case (l, w, p, c, fert, fb) =>
      assert(p >= w, s"lang $l: at least one piece per word")
      assert(c <= p, s"lang $l: fallback pieces are a subset")
      assert(fert === p * 1000000L / w && fb === c * 1000000L / p, s"lang $l ratios")
      assert(fert >= 1000000L, s"lang $l: fertility is at least 1 piece/word")
    }
    // planted corpus: full JVM replay (inventory + greedy) on a 2-language
    // corpus — the tiny trigram space all fits the top-20 inventory, so
    // the replay exercises tri-hit, bi-miss and char-fallback paths
    val tmp = java.nio.file.Files.createTempDirectory("x279dir").toString
    Seq((1L, "aba aba aba aba", "aa", "s0", 15L),
        (2L, "aba aba abax", "aa", "s0", 12L),
        (3L, "qqqq qqqq", "zz", "s1", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def replayInventory(toks: Seq[String]): (Set[String], Set[String]) = {
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      def grams(n: Int, k: Int) = tf.toSeq.flatMap { case (t, f) =>
        (1 to math.min(t.length - n + 1, 32)).map(i => t.substring(i - 1, i - 1 + n) -> f)
      }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
        .toSeq.sortBy { case (g, w) => (-w, g) }.take(k).map(_._1).toSet
      (grams(3, 20), grams(2, 30))
    }
    val allToks = Seq.fill(4)("aba") ++ Seq.fill(2)("aba") :+ "abax" :+ "qqqq" :+ "qqqq"
    val (tri, bi) = replayInventory(allToks)
    def segment(t: String): Seq[Int] = {
      var i = 0; val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (i < t.length) {
        if (i + 3 <= t.length && tri(t.substring(i, i + 3))) { out += 3; i += 3 }
        else if (i + 2 <= t.length && bi(t.substring(i, i + 2))) { out += 2; i += 2 }
        else { out += 1; i += 1 }
      }
      out.toSeq
    }
    val wantPlanted = allToks.zip(Seq.fill(6)("aa") ++ Seq("aa", "zz", "zz"))
      .groupBy(_._2).toSeq.map { case (lang, ts) =>
        val segs = ts.map(t => segment(t._1))
        val (w, p, c) = (ts.length.toLong, segs.map(_.length).sum.toLong,
                         segs.map(_.count(_ == 1)).sum.toLong)
        (lang, w, p, c, p * 1000000L / w, c * 1000000L / p)
      }.sortBy(_._1)
    val gotPlanted = graft.queries.Mining.x279(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSeq
    assert(gotPlanted === wantPlanted)
  }

  test("x280 CDC apply reconstructs snapshot B exactly (JVM multiset proof + checksum replay)") {
    val orders = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey"), col("o_orderstatus"),
              expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = orders.filter(_._1 % 10 != 3)
    val b = orders.filter(_._1 % 10 != 7)
      .map(r => if (r._1 % 5 == 0) r.copy(_3 = r._3 + 100) else r)
    val aBy = a.map(r => r._1 -> r).toMap
    val bBy = b.map(r => r._1 -> r).toMap
    // replay the apply: drop deleted+updated keys, add inserts + new values
    val recon = a.filter(r => bBy.get(r._1).contains(r)) ++
      b.filter(r => !aBy.get(r._1).contains(r))
    assert(recon.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq,
      "the diff-apply theorem: recon is EXACTLY snapshot B as a multiset")
    // checksum = Σ of PER-ROW cubed-Knuth hashes (round-12 upgrade): the
    // earlier additive Σe mod M let compensating edit pairs cancel (e.g.
    // +1 cent on one row, −1 on another left the sum unchanged); cubing
    // the mixed encoding makes each row's term nonlinear in e, so the
    // JVM replay here is also a collision-resistance regression pin.
    def cks(rs: Seq[(Long, String, Long)]): Long = {
      val M = BigInt(2147483647L)
      rs.map { r =>
        val e = BigInt((r._1 % 100000000L) * 131L + r._3 + r._2.head.toLong)
        val aa = e.mod(M) * BigInt(2654435761L) % M
        aa * aa % M * aa % M
      }.sum.mod(M).toLong
    }
    val got = graft.queries.Wrangle.x280(spark, sfSmoke).collect().head
    assert(got.getLong(0) === b.length.toLong && got.getLong(1) === b.length.toLong)
    assert(got.getLong(2) === cks(b.toSeq) && got.getLong(3) === cks(b.toSeq))
    assert(got.getBoolean(4), "match_ok must hold by construction")
  }
}
