package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.chi.{ChiCSClassifier, ChiRule}
import graft.engine.chi.ChiCore.TriPartition
import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

/** The hand-checkable 10-row fixture of FIXTURES.md §3. Pins every Chi
  * convention: argmax tie → lowest label, conflict tie → lowest class,
  * RW ≤ 0 dropped, cost = IR, no-match → majority class. The rule base is
  * cross-checked against an INDEPENDENT plain-Scala implementation of the
  * CS-PCF math (same quantization protocol, zero Spark code).
  */
class GoldenFixtureSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // @relation toy (FIXTURES.md §3): x1∈[0,10], x2∈[0,1]; neg=0 (majority 8),
  // pos=1 (minority 2) → IR = 4.0
  private val rows = Seq(
    (0.5, 0.10, 0), (1.0, 0.20, 0), (2.0, 0.15, 0), (2.5, 0.90, 0),
    (4.8, 0.50, 0), (5.2, 0.45, 0), (9.0, 0.80, 0), (9.5, 0.10, 0),
    (5.0, 0.55, 1), (5.1, 0.95, 1))
  private val parts = Array(TriPartition(0.0, 10.0), TriPartition(0.0, 1.0))
  private val costs = Map(0 -> 1.0, 1 -> 4.0)

  private def df = rows.toDF("x1", "x2", "label")

  private lazy val model = new ChiCSClassifier()
    .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
    .setFeatureRanges(Array(0.0, 10.0, 0.0, 1.0))
    .fit(df)

  /** Independent reference: plain-Scala Chi-FRBCS-CS with the same
    * quantization (per-term round-12 exact sums, round-6 before the final
    * division) but implemented via BigDecimal accumulation, no Spark. */
  private def referenceRuleBase: Seq[ChiRule] = {
    def mu(x: Double, p: TriPartition, k: Int): Double =
      math.max(0.0, 1.0 - math.abs(x - p.centers(k)) / p.halfWidth)
    def argmax(x: Double, p: TriPartition): Int =
      (0 until p.numLabels).map(k => mu(x, p, k)).zipWithIndex
        .maxBy { case (m, i) => (m, -i) }._2
    val labeled = rows.map { case (x1, x2, c) =>
      (Array(argmax(x1, parts(0)), argmax(x2, parts(1))), x1, x2, c)
    }
    val candidates = labeled.map { case (ant, _, _, c) => (ant.toSeq, c) }.distinct
    val grouped = candidates.map { case (ant, ccls) =>
      var wMatch = JBD.ZERO
      var wAll = JBD.ZERO
      for ((_, x1, x2, cls) <- labeled) {
        val m = mu(x1, parts(0), ant(0)) * mu(x2, parts(1), ant(1))
        val w = new JBD(java.lang.Double.toString(costs(cls) * m))
          .setScale(12, RoundingMode.HALF_UP)
        wAll = wAll.add(w)
        if (cls == ccls) wMatch = wMatch.add(w)
      }
      (ant, ccls,
        wMatch.multiply(new JBD(2)).subtract(wAll).setScale(6, RoundingMode.HALF_UP),
        wAll.setScale(6, RoundingMode.HALF_UP))
    }
    grouped.filter(_._4.signum > 0)
      .map { case (ant, c, num, den) => (ant, c, num.doubleValue() / den.doubleValue()) }
      .groupBy(_._1)
      .map { case (ant, rs) =>
        val best = rs.minBy { case (_, c, rw) => (-rw, c) } // max rw, tie → low class
        ChiRule(ant.toArray, best._2, best._3)
      }
      .filter(_.weight > 0)
      .toSeq.sortBy(r => (r.antecedent.mkString(","), r.cls))
  }

  test("hand-computed argmax labels incl. the tie row (2.5 → label 0)") {
    val got = df.select(
        graft.engine.chi.ChiCore.argmaxLabel(
          graft.engine.chi.ChiCore.memberships(col("x1"), parts(0))).as("a1"),
        graft.engine.chi.ChiCore.argmaxLabel(
          graft.engine.chi.ChiCore.memberships(col("x2"), parts(1))).as("a2"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((0, 0), (0, 0), (0, 0), (0, 2), (1, 1),
                       (1, 1), (2, 2), (2, 0), (1, 1), (1, 2)))
  }

  test("auto-derived cost vector is the imbalance ratio (IR = 4.0)") {
    assert(model.costs === costs)
    assert(model.majorityClass === 0)
  }

  test("fitted rule base equals the independent reference implementation") {
    val got = model.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq
    val want = referenceRuleBase.map(r => (r.antecedent.toSeq, r.cls, r.weight))
    assert(got === want)
  }

  test("cost weighting flips the contested (1,1) antecedent to the minority class") {
    val r11 = model.rules.find(_.antecedent.toSeq == Seq(1, 1))
    assert(r11.isDefined && r11.get.cls === 1,
      "with C(pos)=4 the single pos example must outweigh the two neg examples")
    // and without costs it flips back to the majority class
    val flat = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(0.0, 10.0, 0.0, 1.0))
      .setClassCosts(Array(1.0, 1.0))
      .fit(df)
    val f11 = flat.rules.find(_.antecedent.toSeq == Seq(1, 1))
    assert(f11.isDefined && f11.get.cls === 0)
  }

  test("transform classifies every fixture row; no-match falls back to majority") {
    val pred = model.transform(df).select("prediction").collect().map(_.getInt(0))
    assert(pred.length === 10)
    // all scores are ≥ 0; each example has μ>0 vs its own antecedent's zone
    // pos examples 9 & 10 sit in the (1,1)/(1,2) zones ⇒ predicted pos
    assert(pred(8) === 1)
    // a point far outside every rule's support would fall back to majority,
    // but the full-range partitions guarantee some μ>0; assert the documented
    // majority fallback by scoring against an empty-rule model
    val empty = new graft.engine.chi.ChiCSModel(
      "m", parts, Array(0, 1), costs, Array.empty[ChiRule], 0)
    empty.set(empty.featureCols, Array("x1", "x2"))
    empty.set(empty.predictionCol, "prediction")
    val p0 = empty.transform(df).select("prediction").head().getInt(0)
    assert(p0 === 0)
  }
}
