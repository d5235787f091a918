package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.chi.{ChiCSClassifier, ChiRule}
import graft.engine.chi.ChiCore.TriPartition
import java.math.{BigDecimal => JBD, RoundingMode}

/** The generic estimator path the 2-feature binary fixtures never touch:
  * 3 features × 3 classes (and a 4-label variant), cross-checked rule-for-rule
  * and prediction-for-prediction against an independent plain-Scala
  * implementation of the CS-PCF math with exact decimal scoring — which also
  * pins the transform fast path (raw doubles, decimal only on near-ties) to
  * the all-decimal reference. */
class GoldenMulticlassSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // x1∈[0,6], x2∈[0,3], x3∈[0,1]; classes 0 (12 rows), 1 (6), 2 (3) → the
  // minority class 2 gets cost 12/3 = 4, others 1
  private val rows = Seq(
    (0.5, 0.2, 0.1, 0), (1.0, 0.5, 0.2, 0), (1.5, 0.8, 0.3, 0), (0.8, 1.1, 0.9, 0),
    (2.2, 1.4, 0.5, 0), (2.8, 1.7, 0.6, 0), (3.1, 2.0, 0.7, 0), (3.4, 2.3, 0.8, 0),
    (4.0, 2.6, 0.9, 0), (4.6, 2.9, 0.15, 0), (5.2, 0.3, 0.25, 0), (5.8, 0.6, 0.35, 0),
    (2.9, 1.5, 0.55, 1), (3.0, 1.6, 0.45, 1), (3.2, 1.45, 0.5, 1),
    (0.9, 2.8, 0.95, 1), (1.1, 2.7, 0.85, 1), (5.9, 2.9, 0.05, 1),
    (3.05, 1.55, 0.5, 2), (3.15, 1.5, 0.52, 2), (5.95, 0.1, 0.98, 2))
  private val parts = Array(
    TriPartition(0.0, 6.0), TriPartition(0.0, 3.0), TriPartition(0.0, 1.0))
  private val costs = Map(0 -> 1.0, 1 -> 1.0, 2 -> 4.0)

  private def df = rows.toDF("x1", "x2", "x3", "label")

  private lazy val model = new ChiCSClassifier()
    .setFeatureCols(Array("x1", "x2", "x3")).setLabelCol("label")
    .setFeatureRanges(Array(0.0, 6.0, 0.0, 3.0, 0.0, 1.0))
    .fit(df)

  private def mu(x: Double, p: TriPartition, k: Int): Double =
    math.max(0.0, 1.0 - math.abs(x - p.centers(k)) / p.halfWidth)
  private def argmax(x: Double, p: TriPartition): Int =
    (0 until p.numLabels).map(k => mu(x, p, k)).zipWithIndex
      .maxBy { case (m, i) => (m, -i) }._2

  private def referenceRuleBase: Seq[ChiRule] = {
    val feats = rows.map { case (a, b, c, cls) => (Array(a, b, c), cls) }
    val labeled = feats.map { case (xs, cls) =>
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

  test("3-class cost vector: only the minority class is up-weighted") {
    assert(model.costs === costs)
    assert(model.majorityClass === 0)
    assert(model.classes.toSeq === Seq(0, 1, 2))
  }

  test("3-feature 3-class rule base equals the independent reference") {
    val got = model.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq
    val want = referenceRuleBase.map(r => (r.antecedent.toSeq, r.cls, r.weight))
    assert(want.nonEmpty && got === want)
    assert(got.map(_._2).toSet.size > 1, "rules must span multiple classes")
  }

  test("transform equals all-decimal reference scoring on every row") {
    val refRules = referenceRuleBase
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
      if (bestCls >= 0) bestCls else 0
    }
    val want = rows.map { case (a, b, c, _) => refPredict(Array(a, b, c)) }
    val got = model.transform(df).select("prediction").collect().map(_.getInt(0)).toSeq
    assert(got === want)
  }

  test("4-label partitions: fit stays within the L^n x |C| rule bound") {
    val m4 = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2", "x3")).setLabelCol("label")
      .setNumLabels(4)
      .setFeatureRanges(Array(0.0, 6.0, 0.0, 3.0, 0.0, 1.0))
      .fit(df)
    assert(m4.rules.nonEmpty && m4.rules.length <= 64 * 3)
    assert(m4.partitions.forall(_.numLabels === 4))
    // one antecedent per rule base entry (conflict resolution ran)
    val ants = m4.rules.map(_.antecedent.toSeq)
    assert(ants.distinct.length === ants.length)
  }
}
