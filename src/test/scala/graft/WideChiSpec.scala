package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.chi.{ChiCSClassifier, ChiRule}
import graft.engine.chi.ChiCore.TriPartition
import java.math.{BigDecimal => JBD, RoundingMode}

/** Wide-antecedent coverage (VERDICT r9 task 1): the paper's datasets are
  * 41-attribute and nothing driver-checked trained past 2 — this pins the
  * estimator rule-for-rule and prediction-for-prediction against an
  * independent plain-Scala CS-PCF replay at SIX features (the compressed
  * distinct-vector aggregation, the ≤2ⁿ neighbor explosion, and the
  * broadcast-rule transform at real width), plus the x215 ablation facts
  * on the sf0.001 corpus. The replay is written over an ARBITRARY feature
  * count — the same generality the x215 oracle generator has. */
class WideChiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 48 deterministic rows over 6 features; label depends on x1 and x3 only,
  // so the wide grid carries 4 pure-noise attributes — the adversarial case
  // for Lⁿ rule-space growth (many singleton cells, heavy conflict-drop).
  private val rows: Seq[(Array[Double], Int)] = (0 until 48).map { i =>
    val xs = Array(
      (i % 7).toDouble,
      ((i * 3) % 11) / 10.0 * 3,
      ((i * 5) % 13) / 12.0,
      ((i * 11) % 9).toDouble,
      ((i * 13) % 5).toDouble,
      ((i * 17) % 4).toDouble)
    (xs, if (xs(0) > 3 && xs(2) >= 0.5) 1 else 0)
  }
  private val parts = Array(
    TriPartition(0.0, 6.0), TriPartition(0.0, 3.0), TriPartition(0.0, 1.0),
    TriPartition(0.0, 8.0), TriPartition(0.0, 4.0), TriPartition(0.0, 3.0))
  private val ranges = parts.flatMap(p => Array(p.lo, p.hi))

  private def df = rows.map { case (xs, c) =>
    (xs(0), xs(1), xs(2), xs(3), xs(4), xs(5), c)
  }.toDF("x1", "x2", "x3", "x4", "x5", "x6", "label")

  private lazy val model = new ChiCSClassifier()
    .setFeatureCols((1 to 6).map(i => s"x$i").toArray).setLabelCol("label")
    .setFeatureRanges(ranges)
    .fit(df)

  private def mu(x: Double, p: TriPartition, k: Int): Double =
    math.max(0.0, 1.0 - math.abs(x - p.centers(k)) / p.halfWidth)
  private def argmax(x: Double, p: TriPartition): Int =
    (0 until p.numLabels).map(k => mu(x, p, k)).zipWithIndex
      .maxBy { case (m, i) => (m, -i) }._2

  // Binary-IR costs derived from the data, exactly the estimator's R3 path.
  private lazy val costs: Map[Int, Double] = {
    val cnts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (minN, maxN) = (cnts.values.min, cnts.values.max)
    cnts.map { case (c, n) =>
      c -> (if (n == minN && minN != maxN) maxN.toDouble / n else 1.0)
    }
  }

  private def referenceRuleBase: Seq[ChiRule] = {
    val labeled = rows.map { case (xs, cls) =>
      (xs.indices.map(i => argmax(xs(i), parts(i))).toSeq, xs, cls) }
    val candidates = labeled.map { case (ant, _, c) => (ant, c) }.distinct
    candidates.map { case (ant, ccls) =>
      var wMatch = JBD.ZERO
      var wAll = JBD.ZERO
      for ((_, xs, cls) <- labeled) {
        val m = xs.indices.map(i => mu(xs(i), parts(i), ant(i))).product
        val w = new JBD(java.lang.Double.toString(costs(cls) * m))
          .setScale(12, RoundingMode.HALF_UP)
        wAll = wAll.add(w)
        if (cls == ccls) wMatch = wMatch.add(w)
      }
      (ant, ccls,
        wMatch.multiply(new JBD(2)).subtract(wAll).setScale(6, RoundingMode.HALF_UP),
        wAll.setScale(6, RoundingMode.HALF_UP))
    }
      .filter(_._4.signum > 0)
      .map { case (ant, c, num, den) => (ant, c, num.doubleValue() / den.doubleValue()) }
      .groupBy(_._1)
      .map { case (ant, rs) =>
        val best = rs.minBy { case (_, c, rw) => (-rw, c) }
        ChiRule(ant.toArray, best._2, best._3)
      }
      .filter(_.weight > 0)
      .toSeq.sortBy(r => (r.antecedent.mkString(","), r.cls))
  }

  test("6-feature rule base equals the independent replay, within L^6 * |C|") {
    val got = model.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq
    val want = referenceRuleBase.map(r => (r.antecedent.toSeq, r.cls, r.weight))
    assert(want.nonEmpty && got === want)
    assert(got.forall(_._1.length === 6))
    assert(got.length <= 729 * 2)
  }

  test("6-feature transform equals all-decimal replay scoring on every row") {
    val refRules = referenceRuleBase
    val majority = rows.groupBy(_._2).view.mapValues(_.size).toSeq
      .maxBy { case (c, n) => (n, -c) }._1
    def refPredict(xs: Array[Double]): Int = {
      var bestScore = 0.0
      var bestCls = -1
      for (r <- refRules) {
        val m = xs.indices.map(i => mu(xs(i), parts(i), r.antecedent(i))).product
        val score = new JBD(java.lang.Double.toString(m * r.weight))
          .setScale(12, RoundingMode.HALF_UP).doubleValue()
        if (score > 0.0 &&
            (score > bestScore || (score == bestScore && r.cls < bestCls))) {
          bestScore = score; bestCls = r.cls
        }
      }
      if (bestCls >= 0) bestCls else majority
    }
    val want = rows.map { case (xs, _) => refPredict(xs) }
    val got = model.transform(df).select("prediction").collect().map(_.getInt(0)).toSeq
    assert(got === want)
  }

  test("x215 ablation on sf0.001: rules grow with width, tax-visibility helps") {
    val out = graft.queries.ModelOps.x215(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 4L, 6L))
    val nRules = out.map(_.getLong(1))
    assert(nRules(0) < nRules(1) && nRules(1) < nRules(2),
      s"rule count must grow with antecedent width, got ${nRules.toSeq}")
    assert(nRules(2) <= 729 * 2)
    // The label tests l_tax, which the 2-wide prefix cannot see: the fuzzy
    // grid first capturing tax at n=4 must lift GM (minority capture) —
    // the fact that makes the ablation measure something rather than
    // reporting three runs of the same classifier.
    val gm = out.map(r => r.getDouble(r.fieldIndex("gm")))
    assert(gm(1) > gm(0),
      s"GM must improve when the grid first sees the label's tax term, got ${gm.toSeq}")
  }
}
