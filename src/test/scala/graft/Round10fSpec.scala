package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 sixth batch: x242 Hilbert-curve layout audit. The exhaustive
  * grid replay carries the real theorems: the shared portable arithmetic
  * IS the classic xy2d recursion (bijective over all 65 536 cells), every
  * consecutive Hilbert step is grid-adjacent (the property Z-order lacks
  * — counted, not assumed), and the engine audit equals a naive replay.
  */
class Round10fSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  /** The classic top-down Hilbert xy2d (bit-ops + mutable swap form) —
    * deliberately NOT the shared div/mod/CASE arithmetic, so agreement is
    * evidence, not tautology. */
  private def xy2d(x0: Int, y0: Int): Int = {
    var x = x0; var y = y0; var d = 0; var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255 - x; y = 255 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** JVM interpreter of the SHARED per-level column chain (the engine/
    * oracle arithmetic, replayed literally). */
  private def sharedHd8(px: Int, py: Int): Int = {
    var x = px; var y = py; var d = 0
    (0 until 8).foreach { i =>
      val s = (1 << (7 - i))
      val rx = (x / s) % 2
      val ry = (y / s) % 2
      d += s * s * (if (rx == 0) ry else 3 - ry)
      val nx = if (ry == 1) x else if (rx == 1) 255 - y else y
      val ny = if (ry == 1) y else if (rx == 1) 255 - x else x
      x = nx; y = ny
    }
    d
  }

  test("x242: shared arithmetic ≡ classic xy2d, bijective, unit-step adjacent; Z-order is not") {
    val cells = for (x <- 0 until 256; y <- 0 until 256) yield (x, y)
    val inv = new Array[(Int, Int)](65536)
    cells.foreach { case (x, y) =>
      val d = sharedHd8(x, y)
      assert(d == xy2d(x, y), s"mismatch at ($x,$y)")
      assert(inv(d) == null, s"collision at d=$d") // bijectivity
      inv(d) = (x, y)
    }
    val hilbertJumps = (0 until 65535).count { d =>
      val (ax, ay) = inv(d); val (bx, by) = inv(d + 1)
      math.abs(ax - bx) + math.abs(ay - by) != 1
    }
    assert(hilbertJumps == 0) // THE Hilbert locality theorem

    // Z-order (Morton) on the same grid has non-adjacent consecutive steps
    val zinv = new Array[(Int, Int)](65536)
    cells.foreach { case (x, y) =>
      var z = 0
      (0 until 8).foreach { i =>
        z |= ((x >> i) & 1) << (2 * i); z |= ((y >> i) & 1) << (2 * i + 1)
      }
      zinv(z) = (x, y)
    }
    val zJumps = (0 until 65535).count { z =>
      val (ax, ay) = zinv(z); val (bx, by) = zinv(z + 1)
      math.abs(ax - bx) + math.abs(ay - by) != 1
    }
    assert(zJumps > 0, "Morton should jump; Hilbert's advantage is real")
  }

  test("x242 equals a naive per-row replay at sf0.001") {
    val rows = Tables.lineitem(spark, sfSmoke)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxp = rows.map(_._1).max
    val maxs = rows.map(_._2).max
    val want = rows
      .map { case (p, s) =>
        val px = (p * 256 / (maxp + 1)).toInt
        val py = (s * 256 / (maxs + 1)).toInt
        (xy2d(px, py) / 256, px, py)
      }
      .groupBy(_._1)
      .map { case (tile, xs) =>
        (tile.toLong, xs.length.toLong,
         xs.map(_._2).min.toLong, xs.map(_._2).max.toLong,
         xs.map(_._3).min.toLong, xs.map(_._3).max.toLong)
      }.toSet
    val got = graft.queries.Layout2.x242(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x243

  test("x243 equals a naive phrase-search replay at sf0.001") {
    val docs = Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
                 r.getString(1).toLowerCase.split(" ", -1)
                   .filter(_.nonEmpty).toSeq))
    val df = docs.flatMap { case (d, ts) => ts.distinct.map(_ -> d) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length }
    val top10 = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(10)
    val bigr = docs.flatMap { case (d, ts) =>
      ts.zip(ts.drop(1)).map(p => (d, p._1, p._2)) }
    val cnt = bigr.groupBy(p => (p._2, p._3))
      .map { case (k, xs) => k -> xs.length }
    val want = top10.map { case (t1, df1) =>
      val (t2, n) = cnt.collect { case ((a, b), c) if a == t1 => (b, c) }
        .toSeq.sortBy { case (b, c) => (-c, b) }.head
      val hitDocs = bigr.collect { case (d, a, b) if a == t1 && b == t2 => d }
      // containment monotonicity: every matching doc holds the head token
      assert(hitDocs.distinct.length <= df1)
      (s"$t1 $t2", df1.toLong, hitDocs.distinct.length.toLong, n.toLong,
       hitDocs.min)
    }.toSet
    val got = graft.queries.TextSearch.x243(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x244

  test("x244 ladder is the Poisson(1) CDF; discretized mean weight is 1") {
    import graft.queries.StatProtocol._
    // independent high-precision derivation of the CDF
    val mc = new java.math.MathContext(50)
    val e1 = new java.math.BigDecimal(1.0)
      .divide(new java.math.BigDecimal(math.E, mc), mc)
    var fact = java.math.BigDecimal.ONE
    var cdf = java.math.BigDecimal.ZERO
    val want = (0 until 7).map { k =>
      if (k > 0) fact = fact.multiply(new java.math.BigDecimal(k))
      cdf = cdf.add(e1.divide(fact, mc))
      cdf.multiply(new java.math.BigDecimal(mersenne))
        .setScale(0, java.math.RoundingMode.FLOOR).longValueExact()
    }
    poissonThresholds.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) <= 1, s"threshold drift: $got vs $w")
    }
    // E[w] over the ladder's exact bucket masses ≈ 1 (truncation ≤ 1e-3)
    val bounds = 0L +: poissonThresholds
    val mean = (0 until 7).map { k =>
      k * (bounds(k + 1) - bounds(k)).toDouble / mersenne
    }.sum + 7.0 * (mersenne - poissonThresholds.last) / mersenne
    assert(math.abs(mean - 1.0) < 1e-3)
  }

  test("x244 equals a naive per-order replay at sf0.001") {
    import graft.queries.StatProtocol._
    val cents = Tables.orders(spark, sfSmoke)
      .selectExpr("o_orderkey",
                  "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def weight(h: Long): Long =
      poissonThresholds.indexWhere(h < _) match {
        case -1 => 7L; case k => k.toLong
      }
    val want = (0 until bootstrapReps).map { r =>
      val ws = cents.map { case (k, c) =>
        val w = weight((k * mixA + (r + 1) * mixB) % mersenne)
        (w, w * c)
      }
      val ne = ws.map(_._1).sum
      val sc = ws.map(_._2).sum
      (r.toLong, ne, sc,
       (BigInt(sc) * 1000000 / BigInt(ne)).toLong)
    }.toSet
    val got = graft.queries.StatProtocol.x244(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x245

  test("x245 equals a naive replay; the finite-sample guarantee holds") {
    import graft.queries.StatProtocol.conformalAlphas
    val rows = Tables.orders(spark, sfSmoke)
      .selectExpr("o_orderkey", "o_orderpriority",
                  "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pred = rows.filter(_._1 % 5 <= 2).groupBy(_._2)
      .map { case (p, xs) => p -> xs.map(_._3).sum / xs.length }
    def scores(b: Int) = rows.filter(_._1 % 5 == b)
      .flatMap { case (_, p, c) => pred.get(p).map(pr => math.abs(c - pr)) }
    val cal = scores(3).sorted
    val test = scores(4)
    val want = conformalAlphas.map { case (pct, nu, de) =>
      val k = ((cal.length + 1L) * nu + de - 1) / de
      val q = cal((k - 1).toInt) // the k-th order statistic, by sort
      val calCov = cal.count(_ <= q).toLong
      assert(calCov >= k) // the split-conformal construction guarantee
      val cov = test.count(_ <= q).toLong
      (pct.toLong, cal.length.toLong, k, q, calCov, test.length.toLong,
       cov, cov * 1000000L / test.length)
    }.toSet
    val got = graft.queries.StatProtocol.x245(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(want.nonEmpty && got === want)
  }
}
