package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 seventh batch: x246 DP noisy counts, x248 IPS off-policy
  * evaluation, x249 mergeable exponential histogram. Theorems: the
  * discrete-Laplace ladder is symmetric and mean-zero; the logging
  * replica pins IPS ≡ SNIPS ≡ empirical mean; the true exact median lies
  * inside the histogram's certified [2^b, 2^(b+1)) interval.
  */
class Round10gSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  // ---------------------------------------------------------------- x246

  test("x246 ladder is the symmetric mean-zero discrete Laplace") {
    import graft.queries.Governance.{dpThresholds, dpDen}
    val M = 2147483647L
    // bucket masses from the thresholds themselves
    val bounds = 0L +: dpThresholds.map(_._2) :+ M
    val ks = dpThresholds.map(_._1) :+ 8
    val mass = ks.zipWithIndex.map { case (k, i) =>
      k -> (bounds(i + 1) - bounds(i)).toDouble / M
    }.toMap
    // each mass matches the exact rational P(k) = (1/3)(1/2)^|k| to 2 ulp
    (-7 to 7).foreach { k =>
      val p = (1.0 / 3.0) * math.pow(0.5, math.abs(k))
      assert(math.abs(mass(k) - p) < 2.0 / M, s"mass($k)")
    }
    // symmetry and zero mean over the discretization
    (1 to 7).foreach { k =>
      assert(math.abs(mass(k) - mass(-k)) < 2.0 / M)
    }
    val mean = ks.map(k => k * mass(k)).sum
    assert(math.abs(mean) < 1e-6)
    assert(dpDen == 384L && dpThresholds.size == 16)
  }

  test("x246 equals a naive replay at sf0.001; noise is honest") {
    import graft.queries.Governance.dpThresholds
    val rows = Tables.orders(spark, sfSmoke)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def noise(gid: Long, rel: Long): Long = {
      val h = (gid * 2654435761L + rel * 97564181L) % 2147483647L
      dpThresholds.find(h < _._2).map(_._1.toLong).getOrElse(8L)
    }
    val r1 = rows.groupBy(_._1).map { case (p, xs) =>
      val nz = noise(p.substring(0, 1).toLong, 1L)
      (1L, p, xs.length.toLong, nz, xs.length + nz, 693L, 1386L)
    }
    val r2 = rows.groupBy(x => (x._1, x._2)).map { case ((p, st), xs) =>
      val gid = p.substring(0, 1).toLong * 256 + st.last.toLong
      val nz = noise(gid, 2L)
      (2L, s"$p|$st", xs.length.toLong, nz, xs.length + nz, 693L, 1386L)
    }
    val want = (r1 ++ r2).toSet
    val got = graft.queries.Governance.x246(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(want.nonEmpty && got === want)
    assert(got.exists(_._4 != 0L), "at least one group is truly perturbed")
  }

  // ---------------------------------------------------------------- x248

  test("x248 equals a naive replay; the logging replica pins IPS=SNIPS=mean") {
    import graft.queries.StatProtocol.ipsPolicies
    val ev = Tables.events(spark, sfSmoke)
      .selectExpr("user_id", "event_type",
                  "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = ev.length.toLong
    val ctxMap = Map(0L -> "view", 1L -> "click", 2L -> "purchase",
                     3L -> "signup")
    def matches(policy: String, u: Long, t: String): Boolean = policy match {
      case "always_click"    => t == "click"
      case "context_map"     => t == ctxMap(u % 4)
      case "logging_replica" => true
    }
    val want = ipsPolicies.map { case (nm, _, w) =>
      val hit = ev.filter(e => matches(nm, e._1, e._2))
      val m = hit.length.toLong
      val s = hit.map(_._3).sum
      (nm, n, m, (BigInt(w) * s * 1000000 / n).toLong,
       (BigInt(s) * 1000000 / m).toLong)
    }.toSet
    val got = graft.queries.StatProtocol.x248(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
    // the estimator identity: replaying the logging policy IS the mean
    val rep = got.find(_._1 == "logging_replica").get
    val mean = BigInt(ev.map(_._3).sum) * 1000000 / n
    assert(rep._4 == mean.toLong && rep._5 == mean.toLong)
  }

  // ---------------------------------------------------------------- x249

  test("x249 ladder ≡ floor(log2); true median inside the certified bounds") {
    import graft.queries.StatProtocol.expoBucketSql
    // ladder ≡ bit position, probed at every boundary ±1
    val probes = (0 until 47).flatMap(b =>
      Seq((1L << b) - 1, 1L << b, (1L << b) + 1)).filter(_ >= 1)
    def ladder(v: Long): Int = (0 until 47)
      .find(b => v < (1L << (b + 1))).getOrElse(47)
    probes.foreach { v =>
      assert(ladder(v) == 63 - java.lang.Long.numberOfLeadingZeros(v))
    }
    assert(expoBucketSql("cents").contains("WHEN cents < 2 THEN 0"))

    val rows = Tables.orders(spark, sfSmoke)
      .selectExpr("o_orderpriority",
                  "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups: Map[String, Seq[Long]] =
      rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSeq } ++
        Map("ALL" -> rows.map(_._2).toSeq)
    val want = groups.map { case (g, vs) =>
      val sorted = vs.sorted
      val k = (vs.length + 1) / 2
      val med = sorted(k - 1) // the true lower median
      val b = ladder(med).toLong
      (g, vs.length.toLong, b, 1L << b, 1L << (b + 1))
    }.toSet
    val got = graft.queries.StatProtocol.x249(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
    // the certificate: true median ∈ [p50_lo, p50_hi) for every group
    got.foreach { case (g, _, _, lo, hi) =>
      val sorted = groups(g).sorted
      val med = sorted((sorted.length + 1) / 2 - 1)
      assert(med >= lo && med < hi, s"median of $g outside [$lo,$hi)")
    }
  }
}
