package graft

import org.scalatest.funsuite.AnyFunSuite

/** x183–x191 structural invariants, each pinned by a naive in-JVM
  * recomputation at smoke scale (sf0.001) — the same protocol as
  * Round8d/e: the distributed result must equal the obvious sequential
  * algorithm exactly (identical IEEE double ops → identical bits, so
  * Double equality is deliberate). */
class Round8gSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.{Graphs, Organize5, Timeseries}

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def orderCents: Array[Long] =
    Tables.orders(spark, sfSmoke)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0))

  private def orderDays: Array[Long] =
    Tables.orders(spark, sfSmoke)
      .select(expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"))
      .collect().map(_.getLong(0))

  /** Collected support-≥2 co-purchase edges, both directions. */
  private lazy val undirected: Seq[(Long, Long)] = {
    val op = Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val pairs = op.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }
    // keys.toSeq, NOT collect{...=>e}: a pair-valued collect on a Map
    // would rebuild a Map and silently dedup edges by first endpoint
    val e0 = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    e0 ++ e0.map { case (u, v) => (v, u) }
  }

  test("x183 digit counts and shares equal the naive recount") {
    val cents = orderCents.filter(_ > 0)
    val naive = cents.groupBy(_.toString.head.asDigit.toLong)
      .view.mapValues(_.length.toLong).toMap
    val total = cents.length.toDouble
    val got = Organize5.x183(spark, sfSmoke).collect()
    assert(got.map(_.getLong(0)).toSet === naive.keySet)
    got.foreach { r =>
      assert(r.getLong(1) === naive(r.getLong(0)))
      assert(r.getDouble(2) === r6(r.getLong(1) / total))
      assert(r.getDouble(4) === r6(r.getLong(1) / total - r.getDouble(3)))
    }
  }

  test("x184 cell counts partition orders; index equals the naive ratio") {
    val grid = Tables.orders(spark, sfSmoke)
      .select(col("o_orderpriority"),
        (((dayofweek(col("o_orderdate")) + lit(5)) % lit(7)) + lit(1))
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = grid.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val np = grid.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nd = grid.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nt = grid.length.toLong
    val got = Timeseries.x184(spark, sfSmoke).collect()
    assert(got.map(_.getLong(2)).sum === nt)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) === n(key))
      assert(r.getDouble(3) ===
        r6((n(key) * nt).toDouble / (np(key._1) * nd(key._2)).toDouble))
    }
  }

  test("x185 equals the naive calendar-aligned Pearson r per lag") {
    val daily = orderDays.groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val got = Timeseries.x185(spark, sfSmoke).collect()
    assert(got.length === 7)
    got.foreach { r =>
      val lagD = r.getLong(0)
      val pairs = daily.toSeq.collect {
        case (d, xa) if daily.contains(d + lagD) => (xa, daily(d + lagD)) }
      assert(r.getLong(1) === pairs.length.toLong)
      val np = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val exp = r6((np * sxy - sx * sy).toDouble /
        (math.sqrt((np * sxx - sx * sx).toDouble) *
         math.sqrt((np * syy - sy * sy).toDouble)))
      assert(r.getDouble(2) === exp, s"lag $lagD")
      assert(math.abs(r.getDouble(2)) <= 1.0)
    }
  }

  test("x186 equals the naive truncated-EWMA recurrence, head renormalized") {
    val days = orderDays
    val cents = orderCents
    val series = days.zip(cents).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val ws = Array(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, 2916L, 2187L)
    val got = Timeseries.x186(spark, sfSmoke).collect()
    assert(got.length === series.length)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === series(i)._1)
      assert(r.getLong(1) === series(i)._2)
      val terms = (0 to math.min(7, i)).map(k => (ws(k), series(i - k)._2))
      // 6-dp rounding in exact integer arithmetic: half-up micros =
      // (2·num·10⁴ + den) / (2·den) — the engine's post-sf0.1 contract
      // (a double ROUND diverged between engines on a half-boundary row)
      val num = terms.map(t => t._1 * t._2).sum
      val den = terms.map(_._1).sum
      val exp = ((num * 20000L + den) / (den * 2L)).toDouble / 1000000.0
      assert(r.getDouble(2) === exp, s"day ${r.getLong(0)}")
    }
    // first day has no history: properly renormalized to the raw value
    val h = got.head
    assert(h.getDouble(2) ===
      ((h.getLong(1) * 16384L * 20000L + 16384L) / 32768L).toDouble / 1000000.0)
  }

  test("x187 spine is contiguous per region; interpolation is the exact line") {
    val got = Timeseries.x187(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.exists(_._3 == 1L), "no gap day at smoke scale — vacuous")
    got.groupBy(_._1).foreach { case (rk, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3 === 0L, s"region $rk spine must start observed")
      assert(sorted.last._3 === 0L, s"region $rk spine must end observed")
      assert(sorted.last._2 - sorted.head._2 + 1 === sorted.length.toLong,
        s"region $rk spine has holes")
      // every interpolated value sits on the segment between its observed
      // neighbors (weak bound; the oracle pins exact equality)
      val obs = sorted.filter(_._3 == 0L).map(r => r._2 -> r._4).toMap
      sorted.filter(_._3 == 1L).foreach { r =>
        val pd = obs.keys.filter(_ < r._2).max
        val nd = obs.keys.filter(_ > r._2).min
        val (lo, hi) = (math.min(obs(pd), obs(nd)), math.max(obs(pd), obs(nd)))
        assert(r._4 >= lo - 1e-6 && r._4 <= hi + 1e-6,
          s"region $rk day ${r._2} off-segment")
      }
    }
  }

  test("x188 equals a naive BFS; levels partition the node set") {
    val adj = undirected.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val nodes = undirected.map(_._1).toSet
    var reached = nodes.filter(_ % 97 == 0)
    var levels = List(reached)
    var frontier = reached
    for (_ <- 1 to 3) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- reached
      levels = levels :+ next
      reached ++= next
      frontier = next
    }
    val expect = levels.zipWithIndex
      .map { case (s, i) => i.toLong -> s.size.toLong }.toMap +
      (-1L -> (nodes.size - reached.size).toLong)
    val got = Graphs.x188(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.values.sum === nodes.size.toLong)
  }

  test("x189 equals a naive peel; rounds shrink monotonically") {
    var cur = undirected
    val expect = (1 to 3).map { r =>
      val keep = cur.groupBy(_._1).collect {
        case (u, es) if es.size >= 2 => u }.toSet
      cur = cur.filter(e => keep(e._1) && keep(e._2))
      r.toLong -> (cur.map(_._1).distinct.size.toLong, cur.size.toLong / 2)
    }.toMap
    val got = Graphs.x189(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
    assert(got(1L)._1 >= got(2L)._1 && got(2L)._1 >= got(3L)._1)
    assert(got(1L)._2 >= got(2L)._2 && got(2L)._2 >= got(3L)._2)
  }

  test("x190 equals naive sorted-boundary banding; cells partition customers") {
    val perCust = Tables.orders(spark, sfSmoke)
      .groupBy("o_custkey")
      .agg(max(expr(
             "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"))
             .as("ld"),
           count(lit(1)).as("f"),
           sum(round(col("o_totalprice") * 100, 0).cast("long")).as("m"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxd = perCust.map(_._1).max
    val rfm = perCust.map(t => (maxd - t._1, t._2, t._3))
    def bounds(vs: Seq[Long]): Seq[Long] = {
      val s = vs.sorted
      (1 to 4).map(d => s(((d.toLong * s.length + 4) / 5).toInt - 1))
    }
    val (rb, fb, mb) =
      (bounds(rfm.map(_._1)), bounds(rfm.map(_._2)), bounds(rfm.map(_._3)))
    def band(v: Long, bs: Seq[Long]): Long = 1L + bs.count(v > _)
    val expect = rfm
      .groupBy(t => (band(t._1, rb), band(t._2, fb), band(t._3, mb)))
      .view.mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
    val got = Organize5.x190(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
                (r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
    assert(got.values.map(_._1).sum === rfm.length.toLong)
  }

  test("x192 equals the naive sorted-gap quantiles and mean") {
    val perCust = Tables.orders(spark, sfSmoke)
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"),
        col("o_orderkey"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = perCust.groupBy(_._1).values.toSeq.flatMap { g =>
      val ds = g.map(t => (t._2, t._3)).sorted.map(_._1)
      ds.zip(ds.drop(1)).map { case (a, b) => b - a }
    }.sorted
    val n = gaps.length
    def q(d: Int): Long = gaps(((d.toLong * n + 9) / 10).toInt - 1)
    val r = Timeseries.x192(spark, sfSmoke).collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === q(5))
    assert(r.getLong(2) === q(9))
    assert(r.getDouble(3) === r6(gaps.sum.toDouble / n))
  }

  test("x193 layouts tell the skipping story; totals are layout-invariant") {
    val rows = Organize5.x193(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(rows.size === 6)
    val total = rows.values.map(_._4).toSet
    assert(total.size === 1, "rows_total must not depend on the layout")
    rows.foreach { case (k, (tiles, skip, rskip, rtot, ppm)) =>
      assert(skip <= tiles && rskip <= rtot, s"$k inconsistent")
      assert(ppm === rskip * 1000000L / rtot, s"$k ppm arithmetic")
    }
    // arrival order: zone maps prune nothing on either predicate
    assert(rows(("arrival", "box"))._3 === 0L)
    assert(rows(("arrival", "py_only"))._3 === 0L)
    // single-column sort prunes its own column only
    assert(rows(("px_sort", "box"))._3 > 0L)
    assert(rows(("px_sort", "py_only"))._3 === 0L)
    // z-order prunes on BOTH dimensions
    assert(rows(("zorder", "box"))._3 > 0L)
    assert(rows(("zorder", "py_only"))._3 > 0L)
  }

  test("x194 equals naive min-label clustering over the engine's fp pairs") {
    val fps = graft.queries.LlmExt2
      .docFingerprints(Tables.documents(spark, sfSmoke)).distinct()
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val pairs = fps.groupBy(_._2).values.toSeq.flatMap { g =>
      val ds = g.map(_._1).distinct.sorted
      for (a <- ds; b <- ds if a < b) yield (a, b)
    }
    val e0 = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = e0 ++ e0.map { case (u, v) => (v, u) }
    val adj = und.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    var labels = und.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to 3)
      labels = labels.map { case (node, lab) =>
        node -> (adj(node).map(labels) + lab).min }
    val expect = labels.values.groupBy(identity)
      .map { case (l, os) => l -> os.size.toLong }
    val got = Graphs.x194(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.nonEmpty, "no near-dup clusters at smoke scale — vacuous")
  }

  test("x194 hot-fingerprint cap: a viral fp in 100 docs yields no edges, real dups still pair") {
    // 100 docs share one 6-token boilerplate phrase (= 2 rolling 5-gram
    // fps, each with df = 100 > HotFpCap = 64): without the cap the
    // fp-keyed self-join fans out C(100,2) = 4950 candidate pairs from
    // boilerplate alone; with it, zero. Docs 100/101 share a 6-token
    // REAL-dup phrase seen nowhere else (df = 2) and must still pair.
    // Token first-two-chars are unique per filler/phrase so the cheap
    // (2-char, length) token code cannot collide across docs.
    import spark.implicits._
    // distinct (first-2-chars, length) per viral token => distinct codes
    val viralPhrase = "qa1 wb22 ec333 rd4444 te55555 yf666666"
    val dupPhrase = "za9 xb88 cg777 vd6666 bn55555 mk444444"
    val docs = ((0 until 100).map { i =>
      val a = ('a' + i / 10).toChar; val b = ('a' + i % 10).toChar
      val filler = (0 until 5).map(j => s"$a${b}f$j$j").mkString(" ")
      (i.toLong, s"$filler $viralPhrase")
    } ++ Seq(
      (100L, s"$dupPhrase uuz0"),
      (101L, s"$dupPhrase uux1")
    )).toDF("doc_id", "text")
    val pairs = Graphs.fpSharePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)),
      s"cap must drop all viral-fp pairs and keep the planted dup: $pairs")
    // sanity: the viral phrase really is 2 shared fps per doc pair — the
    // UNCAPPED build would have emitted the quadratic candidate set
    val fps = graft.queries.LlmExt2.docFingerprints(docs).distinct()
    val hot = fps.groupBy("fp").count().filter(col("count") > 64).count()
    assert(hot === 2L, "planted viral phrase must contribute exactly 2 hot fps")
  }

  test("x195 decomposition reconstructs exactly; seasonal means sum to ~0") {
    val daily = orderDays.groupBy(identity)
      .view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val xs = daily.map(_._2)
    val got = Timeseries.x195(spark, sfSmoke).collect()
    assert(got.length === daily.length)
    // naive recompute: centered 7-row MA + integer-scaled seasonal means
    val n = xs.length
    val s7 = xs.indices.map(i => (math.max(0, i - 3) to
      math.min(n - 1, i + 3)).map(xs).sum)
    val c7 = xs.indices.map(i =>
      (math.min(n - 1, i + 3) - math.max(0, i - 3) + 1).toLong)
    val det420 = xs.indices.map(i =>
      (xs(i) * c7(i) - s7(i)) * (420L / c7(i)))
    val dow = daily.map(t => ((t._1 + 3) % 7) + 1)
    val seas = dow.zip(det420).groupBy(_._1)
      .view.mapValues(g => (g.map(_._2).sum, g.size.toLong)).toMap
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === daily(i)._1)
      assert(r.getLong(1) === xs(i))
      assert(r.getDouble(2) === r6(s7(i).toDouble / c7(i)), s"trend@$i")
      val (sd, nd) = seas(dow(i))
      assert(r.getDouble(3) === r6(sd.toDouble / (420L * nd)), s"seasonal@$i")
      assert(r.getDouble(4) ===
        r6(xs(i) - s7(i).toDouble / c7(i) - sd.toDouble / (420L * nd)),
        s"residual@$i")
    }
    // detrended series has ~zero mass per weekday by construction
    val seasonalMass = seas.values.map(v => v._1.toDouble / (420L * v._2)).sum
    assert(math.abs(seasonalMass) < 1.5, "seasonal components far from zero")
  }

  test("x196 cosine equals a naive tf dot product over the same pairs") {
    val docs = Tables.documents(spark, sfSmoke)
    val tf = graft.queries.LlmExt2.tokens(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val got = Graphs.x196(spark, sfSmoke).collect()
    assert(got.nonEmpty, "no candidate pairs at smoke scale — vacuous")
    got.foreach { r =>
      val (a, b) = (tf(r.getLong(0)), tf(r.getLong(1)))
      val dot = a.keySet.intersect(b.keySet).toSeq.map(t => a(t) * b(t)).sum
      assert(r.getLong(2) === dot)
      val na = a.values.map(c => c * c).sum
      val nb = b.values.map(c => c * c).sum
      assert(r.getDouble(3) ===
        r6(dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))))
      assert(r.getDouble(3) > 0.5, "candidate pairs should be similar docs")
    }
  }

  test("x191 equals the all-pairs Mann-Whitney count") {
    val parts = Tables.part(spark, sfSmoke)
      .select(col("p_size").cast("long"),
              round(col("p_retailprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1) >= 91000L))
    val pos = parts.filter(_._2).map(_._1)
    val neg = parts.filterNot(_._2).map(_._1)
    val wins = pos.map(p => neg.count(p > _).toLong).sum
    val ties = pos.map(p => neg.count(p == _).toLong).sum
    val r = Organize5.x191(spark, sfSmoke).collect().head
    assert(r.getLong(0) === pos.length.toLong)
    assert(r.getLong(1) === neg.length.toLong)
    assert(r.getLong(2) === 2L * wins + ties)
    assert(r.getLong(3) === 2L * pos.length.toLong * neg.length.toLong)
    assert(r.getDouble(4) ===
      r6((2L * wins + ties).toDouble /
         (2L * pos.length.toLong * neg.length.toLong).toDouble))
  }
}
