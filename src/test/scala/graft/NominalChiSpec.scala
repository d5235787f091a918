package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.engine.chi.{ChiCSClassifier, ChiCSModel, ChiRule}
import graft.engine.chi.ChiCore.TriPartition
import java.math.{BigDecimal => JBD, RoundingMode}

/** x260/x263: nominal attributes (crisp singleton membership, one label per
  * category) and the missing-value protocol (null attribute skipped in the
  * product t-norm), cross-checked rule-for-rule and
  * prediction-for-prediction against an independent plain-Scala replay of
  * the CS-PCF math — plus the structural proof that x215's
  * encode-nominal-as-numeric trick collapses a 4-value attribute under
  * L = 3 where the dictionary grid keeps every category crisp. */
class NominalChiSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Mixed numeric+nominal fixture: x1 ∈ [0, 6] fuzzy (L = 3), x2 a 4-value
  // category. Class 1 ⇔ (category b) — with 4 values the category grid has
  // more labels than L, the exact regime the numeric encode trick breaks.
  // Some (Option) encodes nullability for the x263 tests.
  private val rows: Seq[(Option[Double], Option[String], Integer)] = Seq(
    (Some(0.5), Some("a"), 0), (Some(1.2), Some("a"), 0), (Some(5.1), Some("a"), 0),
    (Some(0.9), Some("b"), 1), (Some(3.3), Some("b"), 1), (Some(5.7), Some("b"), 1),
    (Some(1.1), Some("c"), 0), (Some(2.9), Some("c"), 0), (Some(4.2), Some("c"), 0),
    (Some(0.4), Some("d"), 0), (Some(3.1), Some("d"), 0), (Some(5.9), Some("d"), 0),
    (Some(2.0), Some("a"), 0), (Some(4.8), Some("c"), 0), (Some(3.0), Some("b"), 1))
    .map { case (x, s, c) => (x, s, Integer.valueOf(c)) }

  private val dict = Seq("a", "b", "c", "d") // sorted distinct
  private val pNum = TriPartition(0.0, 6.0)
  private val pNom = TriPartition(0.0, 3.0, 4) // halfWidth exactly 1

  private def df(data: Seq[(Option[Double], Option[String], Integer)]) =
    data.toDF("x1", "x2", "label")

  private def fitNominal(data: Seq[(Option[Double], Option[String], Integer)]) =
    new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setNominalCols(Array("x2"))
      .setFeatureRanges(Array(0.0, 6.0, 0.0, 0.0))
      .fit(df(data))

  private def mu(x: Double, p: TriPartition, k: Int): Double =
    math.max(0.0, 1.0 - math.abs(x - p.centers(k)) / p.halfWidth)
  private def argmax(x: Double, p: TriPartition): Int =
    (0 until p.numLabels).map(k => mu(x, p, k)).zipWithIndex
      .maxBy { case (m, i) => (m, -i) }._2

  /** Independent replay: crisp nominal + skipped-t-norm nulls. Feature
    * vectors are (Option[Double], Option[code]); None ⇒ factor 1 and no
    * antecedent label. */
  private def replay(data: Seq[(Option[Double], Option[String], Integer)])
      : (Seq[ChiRule], Seq[Int], Int) = {
    val ex = data.filter(_._3 != null).map { case (x, s, c) =>
      (x, s.map(v => dict.indexOf(v)), c.intValue())
    }
    val counts = ex.groupBy(_._3).map { case (c, xs) => c -> xs.size.toLong }
    val minN = counts.values.min
    val maxN = counts.values.max
    val costs = counts.map { case (c, n) =>
      c -> (if (n == minN && minN != maxN) maxN.toDouble / n else 1.0)
    }
    val majority = counts.toSeq.maxBy { case (c, n) => (n, -c) }._1
    // candidate antecedents: fully observed examples only
    val candidates = ex.collect { case (Some(x), Some(k), c) =>
      (Seq(argmax(x, pNum), k), c)
    }.distinct
    def factor(x: Option[Double], k: Option[Int], a: Seq[Int]): Double = {
      val f1 = x.map(v => mu(v, pNum, a(0))).getOrElse(1.0)
      val f2 = k.map(v => if (v == a(1)) 1.0 else 0.0).getOrElse(1.0)
      f1 * f2
    }
    val rules = candidates.map { case (ant, ccls) =>
      var wMatch = JBD.ZERO
      var wAll = JBD.ZERO
      for ((x, k, cls) <- ex) {
        val w = new JBD(java.lang.Double.toString(costs(cls) * factor(x, k, ant)))
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
    def predict(x: Option[Double], k: Option[Int]): Int = {
      var bestScore = 0.0
      var bestCls = -1
      for (r <- rules) {
        val score = new JBD(java.lang.Double.toString(
            factor(x, k, r.antecedent.toSeq) * r.weight))
          .setScale(12, RoundingMode.HALF_UP).doubleValue()
        if (score > 0.0 &&
            (score > bestScore || (score == bestScore && r.cls < bestCls))) {
          bestScore = score; bestCls = r.cls
        }
      }
      if (bestCls >= 0) bestCls else majority
    }
    val preds = ex.map { case (x, k, _) => predict(x, k) }
    (rules, preds, majority)
  }

  test("nominal crisp chain equals the independent replay (rules + preds)") {
    val model = fitNominal(rows)
    assert(model.nominalDicts(0).isEmpty && model.nominalDicts(1).toSeq === dict)
    assert(model.partitions(1).numLabels === 4 &&
           model.partitions(1).halfWidth === 1.0)
    val (wantRules, wantPreds, _) = replay(rows)
    val got = model.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq
    assert(wantRules.nonEmpty &&
           got === wantRules.map(r => (r.antecedent.toSeq, r.cls, r.weight)))
    val preds = model.transform(df(rows)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    assert(preds === wantPreds)
    // crisp separation: every row classifies correctly (category b is
    // linearly separated by its own dictionary label)
    assert(preds === rows.map(_._3.intValue()))
  }

  test("4-value nominal under numeric L=3 encoding provably collapses") {
    // argmax over codes {0,1,2,3} under TriPartition(0,3,L=3): codes 1 and
    // 2 BOTH land on label 1 (centers 0, 1.5, 3) — two distinct categories
    // share every antecedent, so the encoded model cannot have more than 3
    // distinct labels on that attribute, while the nominal grid keeps 4.
    val enc = TriPartition(0.0, 3.0, 3)
    assert(argmax(1.0, enc) === argmax(2.0, enc),
           "codes 1 and 2 must collide under L=3 — the trick's failure mode")
    val encoded = rows.map { case (x, s, c) =>
      (x, s.map(v => dict.indexOf(v).toDouble), c)
    }
    val mEnc = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(0.0, 6.0, 0.0, 3.0))
      .fit(encoded.toDF("x1", "x2", "label"))
    val mNom = fitNominal(rows)
    assert(mEnc.rules.map(_.antecedent(1)).distinct.length <= 3)
    assert(mNom.rules.map(_.antecedent(1)).distinct.length === 4)
    // and the collapse is not free: the encoded model blends b into the
    // same cell as c, so b/c rows cannot both be crisp — the nominal model
    // classifies all rows exactly (asserted above), the encoded one scores
    // category c rows with NONZERO membership against the b-cell rule
    val bCell = mEnc.rules.find(_.cls == 1)
    assert(bCell.isDefined, "encoded model still learns a class-1 rule")
    assert(mu(2.0, enc, bCell.get.antecedent(1)) > 0.0,
           "category c (code 2) fuzzily matches the class-1 rule — not crisp")
  }

  test("unseen category at scoring time falls back to the majority class") {
    val model = fitNominal(rows)
    val test = Seq((Some(3.0): Option[Double], Some("zzz"): Option[String],
                    Integer.valueOf(0)))
    val pred = model.transform(df(test)).select("prediction").head().getInt(0)
    assert(pred === 0, "unseen category ⇒ μ=0 everywhere ⇒ majority class")
  }

  test("x263 policy: nulls in train AND test equal the replay; null label drops") {
    val withNulls: Seq[(Option[Double], Option[String], Integer)] = rows ++ Seq(
      (None, Some("b"), Integer.valueOf(1)),       // null numeric, class 1
      (Some(2.5), None, Integer.valueOf(0)),       // null nominal
      (None, None, Integer.valueOf(0)),            // fully null features
      (Some(1.0), Some("d"), Integer.valueOf(0)),
      (Some(9.9), Some("a"), null: Integer))       // null label: dropped
    val model = fitNominal(withNulls)
    val (wantRules, wantPreds, _) = replay(withNulls)
    val got = model.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq
    assert(got === wantRules.map(r => (r.antecedent.toSeq, r.cls, r.weight)))
    val scoreFrame = df(withNulls).filter(col("label").isNotNull)
    val preds = model.transform(scoreFrame).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    assert(preds === wantPreds)
    // the null-label row influences nothing: same model without it
    val m2 = fitNominal(withNulls.filter(_._3 != null))
    assert(m2.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq === got)
    // a fully-null row matches EVERY rule at its bare weight ⇒ prediction
    // is the max-weight rule's class (not necessarily majority) — pin that
    // the all-null prediction equals the replay's (policy, not accident)
    assert(preds.drop(rows.length).take(3) === wantPreds.drop(rows.length).take(3))
  }

  test("save/load round-trips nominal dictionaries (transform identity)") {
    val model = fitNominal(rows)
    val path = java.nio.file.Files.createTempDirectory("chinom").toString + "/m"
    model.write.overwrite().save(path)
    val loaded = ChiCSModel.load(path)
    assert(loaded.nominalDicts.map(_.toSeq).toSeq ===
           model.nominalDicts.map(_.toSeq).toSeq)
    val a = model.transform(df(rows)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    val b = loaded.transform(df(rows)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    assert(a === b)
  }

  test("declared dictionary (KEEL-header path): header order sets the codes; " +
       "coverage is enforced; predictions match the scanned-dict model") {
    val declared = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setNominalCols(Array("x2"))
      // UNSORTED header order — codes must follow the declaration, not the sort
      .setNominalDictionaries(Map("x2" -> Seq("d", "b", "a", "c")))
      .setFeatureRanges(Array(0.0, 6.0, 0.0, 0.0))
      .fit(df(rows))
    val scanned = fitNominal(rows)
    assert(declared.nominalDicts(1).toSeq === Seq("d", "b", "a", "c"))
    // same rules up to the code permutation (d↔0, b↔1, a↔2, c↔3 vs sorted)
    // sorted [a,b,c,d] codes -> declared [d,b,a,c] codes: a 0->2, b 1->1,
    // c 2->3, d 3->0
    val perm = Map(0 -> 2, 1 -> 1, 2 -> 3, 3 -> 0)
    val want = scanned.rules
      .map(r => (Seq(r.antecedent(0), perm(r.antecedent(1))), r.cls, r.weight))
      .sortBy(t => (t._1.mkString(","), t._2))
    val got = declared.rules
      .map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq
      .sortBy(t => (t._1.mkString(","), t._2))
    assert(got === want)
    // identical predictions — the dictionary order is representation only
    val a = declared.transform(df(rows)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    val b = scanned.transform(df(rows)).select("prediction")
      .collect().map(_.getInt(0)).toSeq
    assert(a === b)
    // a training category outside the declaration fails loudly
    val err = intercept[Exception] {
      new ChiCSClassifier()
        .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
        .setNominalCols(Array("x2"))
        .setNominalDictionaries(Map("x2" -> Seq("a", "b"))) // c, d missing
        .setFeatureRanges(Array(0.0, 6.0, 0.0, 0.0))
        .fit(df(rows))
    }
    assert(err.getMessage.contains("outside the declared dictionaries"))
  }

  test("x264 KEEL round trip reproduces x260 exactly at sf0.001") {
    val a = graft.queries.ModelOps.x260(spark, TestSpark.sfSmoke).collect()
      .map(_.toSeq).toSeq
    val b = graft.queries.ModelOps.x264(spark, TestSpark.sfSmoke).collect()
      .map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
  }

  test("x260/x263 registry keys: non-trivial learned bases at sf0.001") {
    val r260 = graft.queries.ModelOps.x260(spark, TestSpark.sfSmoke).head()
    assert(r260.getLong(0) > 4, "x260 must learn rules binding 5 categories")
    val r263 = graft.queries.ModelOps.x263(spark, TestSpark.sfSmoke).head()
    assert(r263.getLong(0) > 4)
  }
}
