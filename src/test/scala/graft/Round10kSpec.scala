package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 eleventh batch: x257 KMV snapshot-overlap estimation. The
  * replay carries the KMV merge theorem — the k smallest of the two
  * sketches' union equal the k smallest of the full data union — and the
  * superset order-statistic bound kth_u ≤ min(kth_a, kth_b).
  */
class Round10kSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  private val M = 2147483647L
  private def kmv(fp: Long): Long = {
    val a = (fp * 2654435761L + 12345L) % M
    ((a * a) % M) * a % M
  }

  test("x257 equals a naive replay; KMV merge theorem; superset bound") {
    val fps = graft.queries.LlmExt2
      .docFingerprints(Tables.documents(spark, sfSmoke))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val hA = fps.filter(_._1 % 2 == 0).map(f => kmv(f._2)).toSet
    val hB = fps.filter(_._1 % 2 == 1).map(f => kmv(f._2)).toSet
    val k = 256
    val ka = hA.toSeq.sorted.take(k)
    val kb = hB.toSeq.sorted.take(k)
    // THE merge theorem: k smallest of (sketchA ∪ sketchB) ==
    // k smallest of the FULL union
    val kuMerged = (ka.toSet ++ kb.toSet).toSeq.sorted.take(k)
    val kuFull = (hA ++ hB).toSeq.sorted.take(k)
    assert(kuMerged === kuFull)
    val (kthA, kthB, kthU) = (ka.max, kb.max, kuMerged.max)
    assert(kthU <= math.min(kthA, kthB)) // superset order statistic
    val cu = kuMerged.length.toLong
    val interInU = kuMerged.count(h => ka.contains(h) && kb.contains(h)).toLong
    val trueUnion = (hA ++ hB).size.toLong
    val trueInter = hA.intersect(hB).size.toLong
    val estUnion =
      if (cu < k) cu else 255L * M / kthU
    val want = (hA.size.toLong, hB.size.toLong, kthA, kthB, kthU,
                estUnion, trueUnion, interInU * 1000000L / cu,
                trueInter * 1000000L / trueUnion)
    val got = graft.queries.Reshape.x257(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
                 r.getLong(8))).head
    assert(trueUnion > 0 && got === want)
  }

  // ---------------------------------------------------------------- x258

  test("x258 equals a naive SAX replay; breakpoints are the exact quartiles") {
    val rows = Tables.events(spark, sfSmoke)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS day",
                  "CAST(round(value * 100, 0) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getLong(0),
                 java.time.LocalDate.parse(r.getString(1)), r.getLong(2)))
    val maxd = rows.map(_._2).max
    val win = rows.filter(r =>
      java.time.temporal.ChronoUnit.DAYS.between(r._2, maxd) < 8)
    val segs = win.groupBy(_._1).map { case (u, xs) =>
      u -> (0 until 4).map { s =>
        xs.filter(x => java.time.temporal.ChronoUnit.DAYS
          .between(x._2, maxd) / 2 == s).map(_._3).sum
      }
    }
    val vals = segs.values.flatten.toSeq.sorted
    val n = vals.length
    def bp(i: Int) = vals((i * n + 3) / 4 - 1) // the ⌈i·N/4⌉-th smallest
    val (b1, b2, b3) = (bp(1), bp(2), bp(3))
    def sym(v: Long) =
      if (v <= b1) 'a' else if (v <= b2) 'b' else if (v <= b3) 'c' else 'd'
    val want = segs.values.map(ss => ss.map(sym).mkString)
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSet
    val got = graft.queries.Timeseries.x258(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got === want)
    // breakpoint sanity: each is genuinely the claimed order statistic
    (1 to 3).foreach { i =>
      val b = bp(i)
      assert(vals.count(_ <= b) >= (i * n + 3) / 4)
      assert(vals.count(_ < b) < (i * n + 3) / 4)
    }
  }

  // ---------------------------------------------------------------- x259

  test("x259 equals a naive replay; the permutation is a bijection on 1..n") {
    def mix(id: Long): Long = {
      val a = (id * 2654435761L + 8L * 97564181L) % M
      ((a * a) % M) * a % M
    }
    val ids = Tables.events(spark, sfSmoke)
      .select("event_id").collect().map(_.getLong(0))
    val ranked = ids.map(id => (mix(id), id)).sorted.map(_._2).zipWithIndex
      .map { case (id, i) => (id, i + 1L) } // (event_id, rank)
    val n = ids.length.toLong
    assert(ranked.map(_._2).toSet === (1L to n).toSet) // bijection on 1..n
    val c = (n + 15) / 16
    val want = ranked.groupBy { case (_, r) => (r - 1) / c }.map {
      case (shard, xs) =>
        (shard, xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max,
         (xs.map { case (id, r) => BigInt(r) * id }.sum % 2147483647L)
           .toLong)
    }.toSet
    val got = graft.queries.Organize.x259(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
    // contiguity: every shard's rank range is gap-free
    got.foreach { case (_, nr, lo, hi, _) => assert(hi - lo + 1 == nr) }
  }
}
