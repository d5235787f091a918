package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.chi.ChiCore

/** x198/x200: the reference paper's evaluation protocol — k-fold
  * cross-validation and the training-size learning curve — each run as ONE
  * Spark plan with the model id as just another grouping key.
  *
  * Fold assignment is a pure projection — the x20 split-hash discipline with
  * a nonlinear twist: the example key is reduced mod 1e8 (so the Fibonacci
  * multiply can never overflow int64), multiplied by 2654435761, then taken
  * mod the PRIME 1000000007 before mod 5. The prime step matters: 5 divides
  * every power-of-ten modulus, so a direct `(k·c) % 10^j % 5` collapses to
  * `k % 5` (linear — consecutive lineitems would stripe across folds in
  * lockstep); the prime double-mod decorrelates fold from key order while
  * staying exactly reproducible on any engine with int64 arithmetic.
  *
  * 100 TB shape: the ONLY row-scale work is one partial+final aggregation to
  * (fold, x1, x2, a1, a2, cls, multiplicity) — the same distinct-vector
  * compression ChiMl.ruleBase uses, here keyed by fold too (≤ 5× the vector
  * count, still ≪ rows). Every train/test fan-out happens on that bounded
  * aggregate (a broadcast join with a ≤5-row model list), so k-fold CV and
  * the 4-tier learning curve each cost ONE shuffle over the fact table — not
  * k training scans. Per-term weights follow §7.4.2: ROUND(·,12) →
  * DECIMAL(18,12) × the multiplicity as DECIMAL(19,0) → exact order-free
  * DECIMAL(38,12) sums, digit-identical to the oracle's row-level cross join.
  */
object Crossval {
  import ChiMl.{P1, P2}

  private val K = 5

  /** Deterministic, engine-portable, key-order-decorrelated fold id. */
  private[queries] def foldExpr: Column =
    (((col("l_orderkey") % 100000000L) * lit(8L) + col("l_linenumber"))
       * lit(2654435761L) % lit(1000000007L)) % lit(K)

  /** The one row-scale shuffle: distinct vectors WITH fold, multiplicity.
    * Eagerly localCheckpointed (the Features.scala:353 idiom): the bounded
    * ≤ 5·|vectors| aggregate feeds 4+ consumers whose differing column
    * pruning defeats ReusedExchange — without the checkpoint the plan
    * re-scans the fact table once per consumer (measured: 8 scans). */
  private def gexAll(spark: SparkSession, dir: String): DataFrame =
    ChiMl.labeled(spark, dir).withColumn("fold", foldExpr)
      .groupBy("fold", "x1", "x2", "a1", "a2", "cls")
      .agg(count(lit(1)).as("mcnt"))
      .materialized

  /** Train one Chi-CS model per distinct `model` key in `trainG` and score
    * it on the matching rows of `testG` — the whole R3–R10 chain with
    * `model` threaded through every aggregate and window.
    *
    * trainG: (model, x1, x2, a1, a2, cls, mcnt); testG: (model, x1, x2,
    * cls, m). Returns (model, n_train, n_test, tp, tn, fp, fn, accuracy,
    * gm), one row per model. */
  private def evalModels(trainG: DataFrame, testG: DataFrame): DataFrame = {
    // per-model cost vector (R3) from the training class counts
    val byModel = Window.partitionBy("model")
    val costs = trainG.groupBy("model", "cls").agg(sum("mcnt").as("n"))
      .withColumn("c",
        when(col("n") === min("n").over(byModel),
             max("n").over(byModel) * lit(1.0) / col("n")).otherwise(lit(1.0)))
      .groupBy("model")
      .agg(max(when(col("cls") === 1, col("c"))).as("c1"),
           max(when(col("cls") === 0, col("c"))).as("c0"),
           sum("n").as("n_train"))

    // per-model candidate antecedents and CS-PCF weights (R4–R7)
    val ants = trainG.select(col("model").as("amodel"), col("a1").as("ra1"),
                             col("a2").as("ra2"), col("cls").as("rcls")).distinct()
    val w = round(
        when(col("cls") === 1, col("c1")).otherwise(col("c0")) *
          ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
          ChiCore.membershipAt(col("x2"), col("ra2"), P2),
        12).cast(DecimalType(18, 12)) * col("mcnt").cast(DecimalType(19, 0))
    val m = trainG.join(broadcast(costs.drop("n_train")), "model")
      .join(broadcast(ants), col("model") === col("amodel"))
      .select(col("model"), col("ra1"), col("ra2"), col("rcls"), col("cls"), w.as("w"))
      .groupBy("model", "ra1", "ra2", "rcls")
      .agg(sum(when(col("cls") === col("rcls"), col("w"))).as("w_match"),
           sum(col("w")).as("w_all"))
    val byAnt = Window.partitionBy("model", "ra1", "ra2")
      .orderBy(col("rw").desc, col("rcls"))
    val rb = m.filter(col("w_all") > 0)
      .withColumn("rw", round(col("w_match") * 2 - col("w_all"), 6).cast(DoubleType) /
                        round(col("w_all"), 6).cast(DoubleType))
      .withColumn("rn", row_number().over(byAnt))
      .filter(col("rn") === 1 && col("rw") > 0)
      .select(col("model").as("rmodel"), col("ra1"), col("ra2"), col("rcls"), col("rw"))

    // score each model's test rows against its ≤9 broadcast rules (R9)
    val perEx = Window.partitionBy("model", "x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"))
    val win = testG.join(broadcast(rb), col("model") === col("rmodel"))
      .withColumn("score",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2) * col("rw"), 12))
      .withColumn("rn", row_number().over(perEx)).filter(col("rn") === 1)
      .select(col("model"), col("cls").as("actual"), col("rcls").as("predicted"), col("m"))

    // per-model confusion + the paper's headline metrics (R10)
    val cm = win.groupBy("model").agg(
      sum(when(col("actual") === 1 && col("predicted") === 1, col("m")).otherwise(0L)).as("tp"),
      sum(when(col("actual") === 0 && col("predicted") === 0, col("m")).otherwise(0L)).as("tn"),
      sum(when(col("actual") === 0 && col("predicted") === 1, col("m")).otherwise(0L)).as("fp"),
      sum(when(col("actual") === 1 && col("predicted") === 0, col("m")).otherwise(0L)).as("fn"))
    val tpr: Column = col("tp") * lit(1.0) / (col("tp") + col("fn"))
    val tnr: Column = col("tn") * lit(1.0) / (col("tn") + col("fp"))
    cm.join(broadcast(costs.select(col("model").as("cmodel"), col("n_train"))),
            col("model") === col("cmodel"))
      .select(
        col("model"),
        col("n_train"),
        (col("tp") + col("tn") + col("fp") + col("fn")).as("n_test"),
        col("tp"), col("tn"), col("fp"), col("fn"),
        round((col("tp") + col("tn")) * lit(1.0) /
              (col("tp") + col("tn") + col("fp") + col("fn")), 6).as("accuracy"),
        round(sqrt(tpr * tnr), 6).as("gm"))
  }

  /** x198: 5-FOLD CROSS-VALIDATION — every fold's rule base trained on the
    * other four folds and scored on its own held-out fold (FSS 2015 §5). */
  def x198(spark: SparkSession, dir: String): DataFrame = {
    val gex = gexAll(spark, dir)
    val models = spark.range(K).select(col("id").cast(IntegerType).as("model"))
    // 4-of-5 fan-out over the bounded aggregate, re-compressed per model
    val trainG = gex.join(broadcast(models), col("fold") =!= col("model"))
      .groupBy("model", "x1", "x2", "a1", "a2", "cls")
      .agg(sum("mcnt").as("mcnt"))
    val testG = gex.groupBy(col("fold").cast(IntegerType).as("model"),
                            col("x1"), col("x2"), col("cls"))
      .agg(sum("mcnt").as("m"))
    evalModels(trainG, testG)
      .select(col("model").cast(LongType).as("fold"),
              col("n_test"), col("tp"), col("tn"), col("fp"), col("fn"),
              col("accuracy"), col("gm"))
      .orderBy("fold")
  }

  /** x200: LEARNING CURVE — sample-efficiency of the rule base: tier t
    * trains on folds 1..t (nested training sets, 20/40/60/80 % of the data)
    * and every tier scores the SAME held-out fold 0, so the accuracy/GM
    * trajectory isolates training-set size as the only moving part — the
    * paper family's "how much data does the FRBCS need" ablation. The
    * curve's diagnostic read: GM flat across tiers ⇒ the 18-candidate rule
    * space saturates early (more data sharpens weights, not structure). */
  def x200(spark: SparkSession, dir: String): DataFrame = {
    val gex = gexAll(spark, dir)
    val tiers = spark.range(1, K.toLong).select(col("id").cast(IntegerType).as("model"))
    val trainG = gex.join(broadcast(tiers),
        col("fold") >= 1 && col("fold") <= col("model"))
      .groupBy("model", "x1", "x2", "a1", "a2", "cls")
      .agg(sum("mcnt").as("mcnt"))
    val testG = gex.filter(col("fold") === 0)
      .crossJoin(broadcast(tiers))
      .groupBy("model", "x1", "x2", "cls")
      .agg(sum("mcnt").as("m"))
    evalModels(trainG, testG)
      .select(col("model").cast(LongType).as("tier"),
              col("n_train"), col("n_test"),
              col("tp"), col("tn"), col("fp"), col("fn"),
              col("accuracy"), col("gm"))
      .orderBy("tier")
  }
}
