package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.chi.ChiCore

/** x198: 5-FOLD CROSS-VALIDATION of the Chi-FRBCS-CS classifier — the
  * reference paper's own evaluation protocol (López/del Río/Benítez/Herrera,
  * FSS 2015 §5: 5-fold CV reporting per-fold accuracy and geometric mean)
  * run as ONE Spark plan: every fold's rule base is trained on the other
  * four folds and scored on its own held-out fold, all five models built
  * side by side with `model` as just another grouping key.
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
  * count, still ≪ rows). The 4-of-5 training fan-out happens on that bounded
  * aggregate (a broadcast inequality join with the 5-row model list), so
  * k-fold CV costs ONE shuffle over the fact table — not k training scans.
  * Per-term weights follow §7.4.2: ROUND(·,12) → DECIMAL(18,12) × the
  * multiplicity as DECIMAL(19,0) → exact order-free DECIMAL(38,12) sums,
  * digit-identical to the oracle's row-level cross join.
  */
object Crossval {
  import ChiMl.{P1, P2}

  private val K = 5

  /** Deterministic, engine-portable, key-order-decorrelated fold id. */
  private[queries] def foldExpr: Column =
    (((col("l_orderkey") % 100000000L) * lit(8L) + col("l_linenumber"))
       * lit(2654435761L) % lit(1000000007L)) % lit(K)

  def x198(spark: SparkSession, dir: String): DataFrame = {
    val lab5 = ChiMl.labeled(spark, dir).withColumn("fold", foldExpr)
    // the one row-scale shuffle: distinct vectors WITH fold, multiplicity
    val gexAll = lab5.groupBy("fold", "x1", "x2", "a1", "a2", "cls")
      .agg(count(lit(1)).as("mcnt"))
    val models = spark.range(K).select(col("id").cast(IntegerType).as("model"))
    // 4-of-5 fan-out over the bounded aggregate, re-compressed per model
    val trainG = gexAll.join(broadcast(models), col("fold") =!= col("model"))
      .groupBy("model", "x1", "x2", "a1", "a2", "cls")
      .agg(sum("mcnt").as("mcnt"))

    // per-model cost vector (R3) from the training class counts
    val byModel = Window.partitionBy("model")
    val costs = trainG.groupBy("model", "cls").agg(sum("mcnt").as("n"))
      .withColumn("c",
        when(col("n") === min("n").over(byModel),
             max("n").over(byModel) * lit(1.0) / col("n")).otherwise(lit(1.0)))
      .groupBy("model")
      .agg(max(when(col("cls") === 1, col("c"))).as("c1"),
           max(when(col("cls") === 0, col("c"))).as("c0"))

    // per-model candidate antecedents and CS-PCF weights (R4–R7)
    val ants = trainG.select(col("model").as("amodel"), col("a1").as("ra1"),
                             col("a2").as("ra2"), col("cls").as("rcls")).distinct()
    val w = round(
        when(col("cls") === 1, col("c1")).otherwise(col("c0")) *
          ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
          ChiCore.membershipAt(col("x2"), col("ra2"), P2),
        12).cast(DecimalType(18, 12)) * col("mcnt").cast(DecimalType(19, 0))
    val m = trainG.join(broadcast(costs), "model")
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

    // score each model's HELD-OUT fold against its ≤9 broadcast rules (R9)
    val testG = gexAll.groupBy(col("fold").cast(IntegerType).as("model"),
                               col("x1"), col("x2"), col("cls"))
      .agg(sum("mcnt").as("m"))
    val perEx = Window.partitionBy("model", "x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"))
    val win = testG.join(broadcast(rb), col("model") === col("rmodel"))
      .withColumn("score",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2) * col("rw"), 12))
      .withColumn("rn", row_number().over(perEx)).filter(col("rn") === 1)
      .select(col("model"), col("cls").as("actual"), col("rcls").as("predicted"), col("m"))

    // per-fold confusion + the paper's headline metrics (R10)
    val cm = win.groupBy("model").agg(
      sum(when(col("actual") === 1 && col("predicted") === 1, col("m")).otherwise(0L)).as("tp"),
      sum(when(col("actual") === 0 && col("predicted") === 0, col("m")).otherwise(0L)).as("tn"),
      sum(when(col("actual") === 0 && col("predicted") === 1, col("m")).otherwise(0L)).as("fp"),
      sum(when(col("actual") === 1 && col("predicted") === 0, col("m")).otherwise(0L)).as("fn"))
    val tpr: Column = col("tp") * lit(1.0) / (col("tp") + col("fn"))
    val tnr: Column = col("tn") * lit(1.0) / (col("tn") + col("fp"))
    cm.select(
      col("model").cast(LongType).as("fold"),
      (col("tp") + col("tn") + col("fp") + col("fn")).as("n_test"),
      col("tp"), col("tn"), col("fp"), col("fn"),
      round((col("tp") + col("tn")) * lit(1.0) /
            (col("tp") + col("tn") + col("fp") + col("fn")), 6).as("accuracy"),
      round(sqrt(tpr * tnr), 6).as("gm"))
      .orderBy("fold")
  }
}
