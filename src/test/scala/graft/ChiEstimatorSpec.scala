package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.chi.{ChiCSClassifier, ChiCSModel}
import java.nio.file.Files

/** x06: the MLlib estimator must reproduce the SQL-formulated q41 rule base
  * and q42 confusion matrix exactly (SURVEY.md §2.5), and round-trip through
  * MLWritable persistence. */
class ChiEstimatorSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("estimator rule base == q41 (DataFrame formulation) at sf0.001") {
    val q41 = graft.queries.ChiMl.q41(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val df = graft.engine.Tables.lineitem(spark, sfSmoke).select(
      col("l_quantity").as("x1"), col("l_discount").as("x2"),
      when(col("l_extendedprice") > 95000, 1).otherwise(0).as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1))
      .fit(df)
    val rules = model.rules
      .map(r => (r.antecedent(0).toLong, r.antecedent(1).toLong, r.cls.toLong,
                 BigDecimal(r.weight).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(rules === q41)
  }

  test("estimator confusion matrix (x06) == q42 at sf0.001") {
    val q42 = graft.queries.ChiMl.q42(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val x06 = graft.queries.Extras.x06(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(x06 === q42)
  }

  test("auto-ranges (R11 descriptor pass) derive min/max from the data") {
    val df = TestSpark.spark.range(0, 101)
      .select((col("id") * 0.1).as("x"), (col("id") % 2).cast("int").as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x")).setLabelCol("label")
      .fit(df)
    assert(model.partitions.length === 1)
    assert(model.partitions(0).lo === 0.0 && math.abs(model.partitions(0).hi - 10.0) < 1e-9)
  }

  test("MLWritable save/load round-trips rules, partitions, costs, params") {
    val df = graft.engine.Tables.lineitem(spark, sfSmoke).select(
      col("l_quantity").as("x1"), col("l_discount").as("x2"),
      when(col("l_extendedprice") > 95000, 1).otherwise(0).as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1))
      .fit(df)
    val path = Files.createTempDirectory("chimodel").toString + "/m"
    model.write.overwrite().save(path)
    val loaded = ChiCSModel.load(path)
    assert(loaded.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq ===
           model.rules.map(r => (r.antecedent.toSeq, r.cls, r.weight)).toSeq)
    assert(loaded.partitions.map(p => (p.lo, p.hi, p.numLabels)).toSeq ===
           model.partitions.map(p => (p.lo, p.hi, p.numLabels)).toSeq)
    assert(loaded.costs === model.costs)
    assert(loaded.getFeatureCols.toSeq === Seq("x1", "x2"))
    val a = model.transform(df).select("prediction").collect().map(_.getInt(0)).toSeq
    val b = loaded.transform(df).select("prediction").collect().map(_.getInt(0)).toSeq
    assert(a === b)
  }

  test("weightCol guard fails loudly on fractional weights (ADVICE r13)") {
    // 2.7 would silently floor to 2 under the LongType cast; the guard's
    // cast-round-trip check must abort the fit instead. An integral-valued
    // DOUBLE column (2.0) must still pass — integrality is about the
    // VALUE, not the declared column type.
    val bad = TestSpark.spark.range(0, 100)
      .select((col("id") % 10).cast("double").as("x"),
              (col("id") % 2).cast("int").as("label"),
              when(col("id") === 13, 2.7).otherwise(1.0).as("w"))
    val est = new ChiCSClassifier()
      .setFeatureCols(Array("x")).setLabelCol("label").setWeightCol("w")
    val e = intercept[Exception] { est.fit(bad) }
    assert(e.getMessage.contains("positive integral") ||
           Option(e.getCause).exists(_.getMessage.contains("positive integral")))
    val good = TestSpark.spark.range(0, 100)
      .select((col("id") % 10).cast("double").as("x"),
              (col("id") % 2).cast("int").as("label"),
              lit(2.0).as("w"))
    assert(est.fit(good).rules.nonEmpty)
  }
}
