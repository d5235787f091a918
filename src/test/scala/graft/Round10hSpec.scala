package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 eighth batch: x250 weighted priority sample, x251
  * capture–recapture dedup-coverage triangulation. Theorems: the exact
  * integer priority total order (840 = lcm(1..8) clears the fraction),
  * detector⊆truth containment, m ≤ min(n₁,n₂), and the Lincoln–Petersen
  * lower bound N̂ ≥ max(n₁,n₂).
  */
class Round10hSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  // ---------------------------------------------------------------- x250

  test("x250 equals a naive priority-sampling replay at sf0.001") {
    val rows = Tables.documents(spark, sfSmoke)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = rows.map { case (d, src, nc) =>
      val wt = math.min(1 + nc / 64, 8L)
      val h = (d * 2654435761L + 40503L) % 2147483647L
      val pri = h * (840L / wt)
      // lcm clears the fraction: wt | 840, so priority·wt = h·840 exactly
      assert(840L % wt == 0 && pri * wt == h * 840L)
      (src, d, wt, pri)
    }.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._4, x._2)).take(5).zipWithIndex.map {
        case ((s, d, w, p), i) => (s, (i + 1).toLong, d, w, p)
      }
    }.toSet
    val got = graft.queries.Organize.x250(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x251

  test("x251 equals a naive replay; estimator bounds hold") {
    val fps = graft.queries.LlmExt2
      .docFingerprints(Tables.documents(spark, sfSmoke))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byFp = fps.groupBy(_._2).filter(_._2.length <= 64)
      .map { case (fp, xs) => fp -> xs.map(_._1).toSet }
    val kept = byFp.toSeq.flatMap { case (fp, ds) => ds.map(_ -> fp) }
    val sizes = kept.groupBy(_._1).map { case (d, xs) => d -> xs.length }
    val interCnt = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byFp.values.foreach { ds =>
      val s = ds.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        interCnt((s(i), s(j))) = interCnt.getOrElse((s(i), s(j)), 0) + 1
    }
    // toSeq first: collect on a Map with pair results would rebuild a MAP
    // and silently overwrite every pair sharing a left doc
    val truth = interCnt.toSeq.collect { case ((a, b), ix)
      if 2 * ix >= sizes(a) + sizes(b) - ix => (a, b) }.toSet
    val hs = Seq((1540483477L, 11L), (1103515245L, 12345L), (69069L, 7L),
                 (1664525L, 1013904223L), (22695477L, 1L), (134775813L, 1L),
                 (214013L, 2531011L), (1597334677L, 3L))
    val sig = kept.groupBy(_._1).map { case (d, xs) =>
      d -> hs.map { case (a, b) =>
        xs.map(x => (x._2 * a + b) % 2147483647L).min }
    }
    def family(b0: Int): Set[(Long, Long)] =
      (b0 until b0 + 2).flatMap { band =>
        sig.toSeq.groupBy { case (_, mh) =>
          s"${mh(2 * band)}:${mh(2 * band + 1)}" }
          .values.flatMap(ds => ds.map(_._1).sorted.combinations(2)
            .map(p => (p(0), p(1))))
      }.toSet.intersect(truth)
    val d1 = family(0)
    val d2 = family(2)
    assert(d1.subsetOf(truth) && d2.subsetOf(truth))
    val (n1, n2, m) = (d1.size.toLong, d2.size.toLong,
                       d1.intersect(d2).size.toLong)
    assert(m <= math.min(n1, n2))
    val lp = if (m == 0) -1L else n1 * n2 / m
    if (m > 0) assert(lp >= math.max(n1, n2)) // the LP lower bound
    val chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val want = (n1, n2, m, lp, chapman, truth.size.toLong)
    val got = graft.queries.LlmExt2.x251(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).head
    assert(truth.nonEmpty && got === want)
  }
}
