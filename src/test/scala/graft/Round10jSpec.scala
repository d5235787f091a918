package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 tenth batch: x253 rendezvous shard-rebalance audit. The
  * replay carries the HRW monotonicity theorem: adding a shard never
  * reorders existing shards' scores, so every mover lands on the new
  * shard — asserted key by key, not just in aggregate.
  */
class Round10jSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  private val M = 2147483647L
  private def rdv(k: Long, s: Long): Long = {
    val a = (k * 2654435761L + (s + 1) * 97564181L) % M
    ((a * a) % M) * a % M
  }

  test("x253 equals a naive replay; every rendezvous move hits the new shard") {
    val keys = Tables.orders(spark, sfSmoke)
      .select("o_orderkey").collect().map(_.getLong(0))
    val assigned = keys.map { k =>
      val hs = (0L until 17L).map(s => rdv(k, s))
      val s16 = hs.take(16).zipWithIndex.maxBy { case (h, s) => (h, -s) }._2
      val s17 = hs.zipWithIndex.maxBy { case (h, s) => (h, -s) }._2
      // THE HRW theorem, per key: a move can only target the new shard
      if (s16 != s17) assert(s17 == 16, s"key $k moved $s16 -> $s17")
      (k, s16.toLong, s17.toLong)
    }
    val n = keys.length.toLong
    val movedMod = keys.count(k => k % 16 != k % 17).toLong
    val movedRdv = assigned.count(a => a._2 != a._3).toLong
    val loads = assigned.groupBy(_._2).map(_._2.length.toLong)
    val want = (n, movedMod, movedRdv, 0L,
                loads.max, loads.min, movedRdv * 1000000L / n)
    val got = graft.queries.Layout2.x253(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got === want)
    // rendezvous must beat modulo by a wide margin on this grid
    assert(movedRdv * 4 < movedMod)
  }

  // ---------------------------------------------------------------- x254

  test("x254 equals a naive two-arm replay at sf0.001") {
    import graft.queries.StatProtocol._
    val rows = Tables.orders(spark, sfSmoke)
      .selectExpr("o_orderkey",
                  "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def weight(h: Long): Long =
      poissonThresholds.indexWhere(h < _) match {
        case -1 => 7L; case k => k.toLong
      }
    val want = (0 until bootstrapReps).map { r =>
      def arm(p: Long) = rows.filter(_._1 % 2 == p).map { case (k, c) =>
        val w = weight((k * mixA + (r + 1) * mixB) % mersenne)
        (w, w * c)
      }
      val (a, b) = (arm(0), arm(1))
      val (na, sa) = (a.map(_._1).sum, a.map(_._2).sum)
      val (nb, sb) = (b.map(_._1).sum, b.map(_._2).sum)
      val ma = (BigInt(sa) * 1000000 / BigInt(na)).toLong
      val mb = (BigInt(sb) * 1000000 / BigInt(nb)).toLong
      (r.toLong, na, sa, nb, sb, ma, mb, ma - mb)
    }.toSet
    val got = graft.queries.StatProtocol.x254(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x255

  test("x255 equals a naive 4-round Bellman–Ford replay at sf0.001") {
    val docs = Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
                 r.getString(1).toLowerCase.split(" ", -1)
                   .filter(_.nonEmpty).toSeq))
    val bigr = docs.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).view.mapValues(_.length)
      .filter { case ((a, b), c) => c >= 3 && a != b }.toMap
    val edges = bigr.toSeq
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .groupBy(e => (e._1, e._2))
      .map { case ((u, v), xs) =>
        (u, v, 1000L + 1000000L / xs.map(_._3.toLong).sum) }.toSeq
    val df = docs.flatMap { case (d, ts) => ts.distinct.map(_ -> d) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length }
    val srcTok = df.toSeq.minBy { case (t, n) => (-n, t) }._1
    var dist = Map(srcTok -> 0L)
    var prev = dist
    for (_ <- 1 to 4) {
      prev = dist
      val relaxed = dist.toSeq ++ edges.flatMap { case (u, v, w) =>
        dist.get(u).map(d => v -> (d + w)) }
      dist = relaxed.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
    }
    // the Bellman–Ford prefix property: rounds only improve
    prev.foreach { case (v, d) => assert(dist(v) <= d) }
    val want = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      .map { case (t, n) => (t, n.toLong, dist.getOrElse(t, -1L)) }.toSet
    val got = graft.queries.Graphs.x255(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x256

  test("x256 equals a naive greedy replay; segmentation is total") {
    val toks = Tables.documents(spark, sfSmoke)
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1).filter(_.nonEmpty))
    val vocab = toks.groupBy(identity).map { case (t, xs) => t -> xs.length }
    def topGrams(n: Int, k: Int): Set[String] = vocab.toSeq
      .flatMap { case (t, tf) =>
        (0 to math.min(t.length - n, 31)).map(i => t.substring(i, i + n) -> tf)
      }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
      .toSeq.sortBy { case (g, w) => (-w, g) }.take(k).map(_._1).toSet
    val (tri, bi) = (topGrams(3, 20), topGrams(2, 30))
    def segment(t: String): Seq[String] = {
      var pos = 0
      val out = Seq.newBuilder[String]
      while (pos < t.length) {
        val p =
          if (pos + 3 <= t.length && tri(t.substring(pos, pos + 3)))
            t.substring(pos, pos + 3)
          else if (pos + 2 <= t.length && bi(t.substring(pos, pos + 2)))
            t.substring(pos, pos + 2)
          else t.substring(pos, pos + 1)
        out += p
        pos += p.length
      }
      out.result()
    }
    // total coverage: pieces re-concatenate to the token, every token
    vocab.keys.foreach(t => assert(segment(t).mkString == t))
    val want = vocab.toSeq
      .flatMap { case (t, tf) => segment(t).map(_ -> tf.toLong) }
      .groupBy(_._1).map { case (p, xs) => (p, p.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy { case (p, _, u) => (-u, p) }.take(30).toSet
    val got = graft.queries.Mining.x256(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got === want)
  }
}
