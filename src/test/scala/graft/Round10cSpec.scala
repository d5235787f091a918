package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 third batch: x229 t-closeness, x230 nDCG@10, x231 JL
  * distortion, x232 PCA moment sketch, x233 Fellegi–Sunter linkage. Each
  * key replays naively in the JVM on real corpus data (exact BigInt
  * rationals where the engine clears denominators), and each carries its
  * theorem: TV ∈ [0,1] + monotone sweep (x229), DCG ≤ IDCG by
  * rearrangement (x230), the Cauchy–Schwarz distortion ceiling (x231),
  * PSD certificates of the second-moment matrix (x232), and
  * full-agreement ⟺ link (x233).
  */
class Round10cSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  // ---------------------------------------------------------------- x229

  private def qiRows = Tables.customer(spark, sfSmoke)
    .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
            col("c_mktsegment"),
            floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
    .collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3))))
    .toMap

  test("x229 equals an exact-rational naive replay") {
    val qi = qiRows
    val ords = Tables.orders(spark, sfSmoke)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (ck, _) => qi.contains(ck) }
    val byCls = ords.groupBy { case (ck, _) => qi(ck) }
    val globS = ords.groupBy(_._2).map { case (p, xs) => p -> BigInt(xs.length) }
    val bigN = BigInt(ords.length)
    val perCls = byCls.map { case (cls, xs) =>
      val nC = BigInt(xs.length)
      val nMembers = xs.map(_._1).distinct.length.toLong
      val num = globS.keys.map { p =>
        val nCs = BigInt(xs.count(_._2 == p))
        (nCs * bigN - globS(p) * nC).abs
      }.sum
      (cls, num, nC, nMembers)
    }.toSeq
    val want = Seq(1L, 2L, 3L, 5L).map { t10 =>
      val viol = perCls.filter { case (_, num, nC, _) =>
        num * 10 > nC * bigN * 2 * t10 }
      (t10, perCls.length.toLong, viol.length.toLong,
       viol.map(_._4).sum,
       perCls.map { case (_, num, nC, _) =>
         (num * 1000000 / (nC * bigN * 2)).toLong }.max)
    }.toSet
    val got = graft.queries.Governance.x229(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
  }

  test("x229 theorems: TV is a probability distance; the sweep is monotone") {
    val rows = graft.queries.Governance.x229(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1)
    // TV ≤ 1 by definition (half an L1 distance between distributions)
    assert(rows.forall { case (_, _, _, maxPpm) =>
      maxPpm >= 0 && maxPpm <= 1000000 })
    // violating classes can only shrink as t grows
    val viols = rows.map(_._3)
    assert(viols.zip(viols.tail).forall { case (a, b) => b <= a })
    assert(viols.head > 0, "sweep should bite at t=0.1 on this corpus")
  }

  // ---------------------------------------------------------------- x230

  test("x230 equals a naive JVM replay (ranking, grading, discounting)") {
    val docs = Tables.documents(spark, sfSmoke).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, text) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty).map(t => (id, t))
    }.groupBy(identity).map { case ((id, t), xs) => (id, t, xs.length.toLong) }
      .toSeq
    val dlen = tf.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._3).sum }
    val top20 = tf.groupBy(_._2).map { case (t, xs) => (t, xs.length) }.toSeq
      .sortBy { case (t, df) => (-df, t) }.take(20).map(_._1)
    val w = graft.queries.Clustering.ndcgWeightsMicro
    val want = top20.map { q =>
      val cand = tf.filter(_._2 == q).map { case (id, _, f) =>
        val gain = (1L << math.min(f, 3L)) - 1
        (id, f * 1000000L / dlen(id), gain)
      }
      val dcg = cand.sortBy { case (id, s, _) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((_, _, g), i) => g * w(i) }.sum
      val idcg = cand.map(_._3).sorted.reverse.take(10)
        .zipWithIndex.map { case (g, i) => g * w(i) }.sum
      (q, cand.length.toLong, dcg, idcg, dcg * 1000000L / idcg)
    }.toSet
    val got = graft.queries.Clustering.x230(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
  }

  test("x230 theorem: DCG never exceeds IDCG (rearrangement bound)") {
    val rows = graft.queries.Clustering.x230(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) <= 1000000L)
    }
    // the surrogate ranking is genuinely imperfect somewhere — nDCG is a
    // measurement, not a tautology
    assert(rows.exists(_.getLong(4) < 1000000L))
  }

  // ---------------------------------------------------------------- x231

  private def quantized = Tables.embeddings(spark, sfSmoke)
    .select("vec_id", "embedding").collect()
    .map(r => (r.getLong(0),
               r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong)
                 .toArray))

  test("x231 equals a naive JVM replay over the shared sign matrix") {
    val qv = quantized.toMap
    val signs = graft.queries.Clustering.jlSigns
    val ratios = qv.keys.toSeq.filter(id => id % 2 == 0 && qv.contains(id + 1))
      .flatMap { id =>
        val d = qv(id).zip(qv(id + 1)).map { case (a, b) => a - b }
        val den = d.map(x => x * x).sum
        if (den == 0) None
        else {
          val sd2 = signs.map(s => {
            val dj = s.zip(d).map { case (sv, dv) => sv * dv }.sum
            dj * dj
          }).sum
          Some(sd2 * 1000000L / (8 * den))
        }
      }
    val want = ratios.groupBy(_ / 250000).map { case (b, xs) =>
      (b, xs.length.toLong, xs.min, xs.max) }.toSet
    val got = graft.queries.Clustering.x231(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty && got === want)
  }

  test("x231 theorem: distortion respects the Cauchy–Schwarz ceiling") {
    // D_j² ≤ 64·‖d‖² per projection (Cauchy–Schwarz with a ±1 vector), so
    // Σ_j D_j² ≤ 8·64·‖d‖² and the ratio can never exceed 64.
    val rows = graft.queries.Clustering.x231(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) <= 64000000L))
    // pair accounting: buckets partition the non-degenerate pairs
    val total = rows.map(_.getLong(1)).sum
    val expected = quantized.toMap
    val n = expected.keys.toSeq
      .count(id => id % 2 == 0 && expected.contains(id + 1) &&
        !expected(id).sameElements(expected(id + 1)))
    assert(total === n.toLong)
  }

  // ---------------------------------------------------------------- x232

  test("x232 sketch equals a naive JVM replay and pca_ok holds") {
    val qv = quantized.map(_._2)
    val d = 64
    val n = qv.length.toLong
    val s = Array.tabulate(d)(k => qv.map(_(k)).sum)
    val want = (Seq(((-1, -1), n)) ++
      (0 until d).map(k => ((k, -1), s(k))) ++
      (for (k <- 0 until d; l <- k until d)
        yield ((k, l), qv.map(q => q(k) * q(l)).sum))).toMap
    val rows = graft.queries.Clustering.x232(spark, sfSmoke).collect()
    val got = rows.map(r =>
      ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(2))).toMap
    assert(got === want)
    assert(rows.forall(_.getBoolean(3)), "power-iteration invariants hold")
  }

  test("x232 theorem: the scaled covariance from the sketch is PSD") {
    val rows = graft.queries.Clustering.x232(spark, sfSmoke).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(2))).toMap
    val d = 64
    val n = rows((-1, -1)).toDouble
    val s = Array.tabulate(d)(k => rows((k, -1)).toDouble)
    def m(k: Int, l: Int) =
      n * rows(if (k <= l) (k, l) else (l, k)).toDouble - s(k) * s(l)
    // PSD certificates: every diagonal entry of n²·Cov is a variance ≥ 0,
    // and vᵀMv ≥ 0 for a spread of deterministic probe vectors
    (0 until d).foreach(k => assert(m(k, k) >= 0d))
    val probes = Seq(
      Array.fill(d)(1d),
      Array.tabulate(d)(k => if (k % 2 == 0) 1d else -1d),
      Array.tabulate(d)(k => (k % 7).toDouble - 3d))
    probes.foreach { v =>
      val quad = (for (k <- 0 until d; l <- 0 until d)
        yield v(k) * m(k, l) * v(l)).sum
      assert(quad >= -1e-6 * math.abs(quad).max(1d))
    }
  }

  // ---------------------------------------------------------------- x233

  test("x233 equals a naive record-square replay (contraction correctness)") {
    val recs = Tables.part(spark, sfSmoke)
      .select("p_type", "p_name", "p_brand", "p_size").collect()
      .map { r =>
        val words = r.getString(1).split(" ")
        (r.getString(0), words(1), r.getString(2), r.getInt(3), words(0))
      }
    val w = graft.queries.Wrangle.fsWeights
    val scored = for {
      i <- recs.indices; j <- (i + 1) until recs.length
      a = recs(i); b = recs(j)
      if a._1 == b._1 && a._2 == b._2
    } yield {
      val s = (if (a._3 == b._3) w("brand")._1 else w("brand")._2) +
        (if (a._4 == b._4) w("size")._1 else w("size")._2) +
        (if (a._5 == b._5) w("adj")._1 else w("adj")._2)
      s
    }
    val want = scored.groupBy { s =>
      if (s >= 900) "link" else if (s >= 0) "possible" else "nonlink"
    }.map { case (dec, xs) => (dec, xs.length.toLong, xs.min, xs.max) }.toSet
    val got = graft.queries.Wrangle.x233(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty && got === want)
  }

  test("x233 theorem: link ⟺ full agreement on every compared field") {
    // weights: the best two-of-three score is brand+size+adjDis = 727 < 900,
    // so only the full-agreement pattern (1258) reaches the link cut
    val w = graft.queries.Wrangle.fsWeights
    val full = w("brand")._1 + w("size")._1 + w("adj")._1
    val bestPartial = Seq(
      w("brand")._1 + w("size")._1 + w("adj")._2,
      w("brand")._1 + w("size")._2 + w("adj")._1,
      w("brand")._2 + w("size")._1 + w("adj")._1).max
    assert(full >= 900 && bestPartial < 900)
    val got = graft.queries.Wrangle.x233(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    got.get("link").foreach { case (mn, mx) =>
      assert(mn === full && mx === full)
    }
  }
}
