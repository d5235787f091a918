package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 fifth batch: x237 CEP consecutive-pattern match, x238 clamped
  * running balance, x239 supplier skyline. The replays carry the real
  * theorems: match disjointness (x237), the clamp ⟺ prefix-sum identity
  * (x238 — the sequential fold IS the spec), and quadratic-dominance
  * ground truth plus the skyline merge theorem (x239).
  */
class Round10eSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  // ---------------------------------------------------------------- x237

  private def userSequences = Tables.events(spark, sfSmoke)
    .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
            col("event_id"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    .groupBy(_._1)
    .map { case (u, xs) =>
      u -> xs.sortBy { case (_, _, us, id) => (us, id) }
              .map { case (_, t, us, _) => (t, us) } }

  test("x237 equals a naive sequential scan; matches are event-disjoint") {
    val want = userSequences.flatMap { case (u, seq) =>
      val starts = seq.indices.dropRight(2).filter { i =>
        seq(i)._1 == "view" && seq(i + 1)._1 == "click" &&
          seq(i + 2)._1 == "purchase" &&
          seq(i + 2)._2 - seq(i)._2 <= 259200000000L
      }
      // disjointness theorem: a match at i forbids one at i+1 or i+2
      // (those positions hold 'click'/'purchase', never 'view')
      if (starts.length > 1)
        starts.zip(starts.tail).foreach { case (a, b) => assert(b - a >= 3) }
      if (starts.isEmpty) None
      else Some((u, starts.length.toLong,
                 seq(starts.head)._2, seq(starts.last)._2))
    }.toSet
    val got = graft.queries.Analytics.x237(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty && got === want)
  }

  // ---------------------------------------------------------------- x238

  test("x238: the window identity equals the sequential clamp fold") {
    val daily = Tables.events(spark, sfSmoke)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"),
              when(col("event_type") === "purchase",
                   -round(col("value") * 100, 0).cast("long"))
                .otherwise(round(col("value") * 100, 0).cast("long")).as("c"))
      .groupBy("user_id", "d").agg(sum("c").as("net"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (u, xs) =>
      // THE sequential recurrence the window identity must reproduce:
      // S_i = max(0, S_{i-1} + x_i)
      val nets = xs.sortBy(_._2).map(_._3)
      val bals = nets.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
      (u, nets.length.toLong, bals.last, bals.max,
       bals.count(_ == 0L).toLong)
    }.toSet
    val got = graft.queries.Analytics.x238(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
    // the clamp must actually bind somewhere or the key tests nothing
    assert(want.exists(_._5 > 0), "no user ever hit the floor at sf0.001")
  }

  // ---------------------------------------------------------------- x239

  private def supplierPoints = {
    val li = Tables.lineitem(spark, sfSmoke)
      .select(col("l_orderkey"), col("l_suppkey"),
              round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
              round(col("l_quantity"), 0).cast("long").as("qty"),
              expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("sus"))
    val ord = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey").as("l_orderkey"),
              expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("ous"))
    li.join(ord, "l_orderkey").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4) - r.getLong(5)))
      .groupBy(_._1)
      .map { case (s, xs) =>
        (s, xs.map(_._4).sum / xs.length,
         xs.map(_._2).sum * 10000L / xs.map(_._3).sum)
      }.toSeq
  }

  private def skylineOf(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val distinct = pts.distinct
    distinct.filter { case (d, c) =>
      !distinct.exists { case (d2, c2) =>
        (d2, c2) != (d, c) && d2 <= d && c2 <= c }
    }.toSet
  }

  test("x239 equals the quadratic-dominance ground truth") {
    val sup = supplierPoints
    val pairs = sup.map { case (_, d, c) => (d, c) }
    val want = skylineOf(pairs).map { case (d, c) =>
      val owners = sup.filter { case (_, d2, c2) => d2 == d && c2 == c }
      (d, c, owners.length.toLong, owners.map(_._1).min)
    }
    val got = graft.queries.Mining.x239(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty && got === want)
    // (sf0.001's 10 suppliers yield a 1-point frontier; the sf0.01 oracle
    // run pins the 6-point staircase — non-degeneracy is checked there)
  }

  test("x239 merge theorem: skyline(A ∪ B ∪ C) = skyline(skylines)") {
    // the engine's partition-local prune is sound for ANY split — proved
    // here on three arbitrary chunks of the real point set
    val pairs = supplierPoints.map { case (_, d, c) => (d, c) }
    val chunks = pairs.zipWithIndex.groupBy(_._2 % 3).values
      .map(_.map(_._1)).toSeq
    val merged = skylineOf(chunks.flatMap(skylineOf(_).toSeq))
    assert(merged === skylineOf(pairs))
  }

  // ---------------------------------------------------------------- x241

  test("x241 equals a naive replay; Cauchy-Schwarz ppm ceiling; sign quality") {
    val ms = Seq(4, 8, 16, 32)
    // sign-family quality theorem (deterministic in the generator): no two
    // rows of the widest family are near-parallel — |row.row'| stays at
    // sqrt(64) scale, the iid-ness JL concentration actually needs. (The
    // earlier LCG-parity generator measured |row.row'| = 62/64 here.)
    val s32 = graft.queries.Clustering.jlSignsM(32)
    for (i <- s32.indices; j <- i + 1 until 32) {
      val dot = s32(i).zip(s32(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) <= 32, s"rows $i,$j near-parallel: dot=$dot")
    }
    val qv = Tables.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
                 r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong)
                   .toArray)).toMap
    val devs = qv.keys.toSeq.filter(id => id % 2 == 0 && qv.contains(id + 1))
      .flatMap { id =>
        val d = qv(id).zip(qv(id + 1)).map { case (a, b) => a - b }
        val den = d.map(x => x * x).sum
        if (den == 0L) None else Some(ms.map { m =>
          val sd2 = graft.queries.Clustering.jlSignsM(m).map { s =>
            val dj = d.zip(s).map { case (x, sg) => x * sg }.sum; dj * dj
          }.sum
          m -> math.abs(sd2 * 1000000L / (m * den) - 1000000L)
        }.toMap)
      }
    val want = ms.map { m =>
      val xs = devs.map(_(m))
      (m.toLong, xs.size.toLong, xs.sum / xs.size, xs.max,
       xs.count(_ <= 250000L).toLong)
    }
    val got = graft.queries.Clustering.x241(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(got === want)
    // Cauchy-Schwarz: sum_j D_j^2 <= m*64*||d||^2, so every ratio is at most
    // 64e6 ppm and every deviation at most 63e6 ppm — corpus-independent.
    got.foreach { case (m, n, mean, worst, win) =>
      assert(worst <= 63000000L && mean <= worst && win <= n, s"m=$m") }
  }
}
