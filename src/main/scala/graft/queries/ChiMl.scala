package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.engine.chi.ChiCore
import graft.engine.chi.ChiCore.TriPartition

/** q38–q43: the reference's entire ML surface (Chi-FRBCS-BigDataCS operators
  * R2–R10, SURVEY.md §2.1/§2.3) as oracle-checked DataFrame queries.
  *
  * Derived classification task over lineitem: attributes x1=l_quantity
  * (range [1,50]), x2=l_discount ([0,0.1]), binary label
  * pos := l_extendedprice > 95000 (≈9.6 % minority → cost IR ≈ 9.3).
  *
  * 100 TB posture: the candidate antecedent set is bounded by Lⁿ·|C| = 18
  * rows, so it is always broadcast; the only full-data shuffle is the final
  * (antecedent, class) aggregation — the reference's single-reducer merge
  * becomes a partial+final agg. Per-term weights are rounded to 12dp and
  * summed as DECIMAL(38,12): exact, order-independent, shuffle-safe
  * (SURVEY.md §7.4.2).
  */
object ChiMl {
  private[queries] val P1 = TriPartition(1.0, 50.0)  // l_quantity
  private[queries] val P2 = TriPartition(0.0, 0.1)   // l_discount

  /** Labeled, fuzzy-labeled training view: one row per lineitem with
    * (x1, x2, cls, a1, a2) where a_i is the argmax membership label. */
  private[queries] def labeled(spark: SparkSession, dir: String): DataFrame =
    // deliberately NOT fanned out: the argmax + partial agg pipeline on a
    // single scan task beats paying a sort+shuffle of every row (measured)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity").as("x1"), col("l_discount").as("x2"),
              when(col("l_extendedprice") > 95000, 1).otherwise(0).as("cls"))
      .withColumn("a1", ChiCore.argmaxLabel(ChiCore.memberships(col("x1"), P1)))
      .withColumn("a2", ChiCore.argmaxLabel(ChiCore.memberships(col("x2"), P2)))

  /** The final rule base (the result of R4–R7): cost-sensitive PCF weight per
    * candidate (antecedent, class), conflict-resolved to max weight, RW>0.
    * With costSensitive=false this is the BASE Chi-FRBCS rule base (the
    * algorithm the CS variant extends: every example weighs 1, PCF = plain
    * penalized certainty factor) — x51/x52 expose it so the cost vector's
    * effect on the learned rules is directly observable. */
  /** Antecedent match degree of (x1, x2) against labels (ra1, ra2) under
    * the given t-norm — PRODUCT is [P1]'s choice (and every other key's);
    * MINIMUM is the other classical FRBCS conjunction, ablated by x285. */
  private def matchDegree(tnormMin: Boolean): Column = {
    val m1 = ChiCore.membershipAt(col("x1"), col("ra1"), P1)
    val m2 = ChiCore.membershipAt(col("x2"), col("ra2"), P2)
    if (tnormMin) least(m1, m2) else m1 * m2
  }

  private[queries] def ruleBase(spark: SparkSession, dir: String,
                                costSensitive: Boolean = true,
                                tnormMin: Boolean = false): DataFrame =
    // Pre-aggregate to DISTINCT feature vectors with multiplicity before the
    // candidate fan-out: W is a pure function of (x1, x2, cls), and
    // DECIMAL × integer-count is exact, so Σ_examples W ≡ Σ_vectors W·m
    // digit-for-digit — the oracle's full example×candidate cross join
    // collapses from |rows|·|candidates| decimal terms to |vectors|·|cands|.
    // (The one added shuffle keys on the vector itself; at 100 TB this is the
    // difference between 1.8 B and ~20 k weight terms for this task.)
    //
    // Every downstream input — the cost vector, the candidate set, and the
    // weight terms — is derived from THIS aggregate (class counts via
    // Σ mcnt, identical integers), so its one exchange is computed once and
    // ReusedExchange serves the other consumers; the earlier form re-derived
    // costs from the raw table and re-scanned lineitem once per consumer.
    ruleBaseFrom(vectorGex(spark, dir), costSensitive, tnormMin)

  /** The distinct-feature-vector training aggregate every fit consumes. */
  private[queries] def vectorGex(spark: SparkSession, dir: String): DataFrame =
    labeled(spark, dir).groupBy("x1", "x2", "a1", "a2", "cls")
      .agg(count(lit(1)).as("mcnt"))

  /** The fit from a prepared vector aggregate — callers fitting SEVERAL
    * variants off the same data (x285's two t-norms) pass ONE
    * localCheckpoint'd gex0 so the corpus is scanned once, not per fit. */
  private[queries] def ruleBaseFrom(gex0: DataFrame,
                                    costSensitive: Boolean,
                                    tnormMin: Boolean): DataFrame = {
    val all = Window.partitionBy()
    val costsDf = {
      val withC = gex0.groupBy("cls").agg(sum(col("mcnt")).as("n"))
        .withColumn("c",
          when(col("n") === min("n").over(all), max("n").over(all) * lit(1.0) / col("n"))
            .otherwise(lit(1.0)))
      withC.agg(max(when(col("cls") === 1, col("c"))).as("c1"),
                max(when(col("cls") === 0, col("c"))).as("c0"))
    }
    val gex = if (costSensitive) gex0.crossJoin(broadcast(costsDf)) else gex0
    val ants = gex0.select(col("a1").as("ra1"), col("a2").as("ra2"),
                           col("cls").as("rcls")).distinct()
    val costFactor =
      if (costSensitive) when(col("cls") === 1, col("c1")).otherwise(col("c0"))
      else lit(1.0)
    // DECIMAL(18,12) × DECIMAL(19,0) → exactly (38,12): scale 12 kept, any
    // long count representable; a (38,12) term would overflow against the
    // bigint count and allowPrecisionLoss would round each product to
    // scale 6 (see ChiCSClassifier.fit note)
    val w = round(costFactor * matchDegree(tnormMin),
        12).cast(DecimalType(18, 12)) * col("mcnt").cast(DecimalType(19, 0))
    val m = gex.crossJoin(broadcast(ants))
      .select(col("ra1"), col("ra2"), col("rcls"), col("cls"), w.as("w"))
      .groupBy("ra1", "ra2", "rcls")
      .agg(sum(when(col("cls") === col("rcls"), col("w"))).as("w_match"),
           sum(col("w")).as("w_all"))
    // The decimal sums are rounded to 6dp BEFORE the double cast: the scaled
    // integers then fit in 53 bits, so the decimal→double conversion is exact
    // on every engine and rw is bit-identical to the oracle's. (An unrounded
    // DECIMAL(38,12) cast can differ by 1 ulp between engines, which flipped
    // a winning-rule tie downstream.)
    val rw = m.filter(col("w_all") > 0)
      .withColumn("rw", round(col("w_match") * 2 - col("w_all"), 6).cast(DoubleType) /
                        round(col("w_all"), 6).cast(DoubleType))
    val byAnt = Window.partitionBy("ra1", "ra2")
      .orderBy(col("rw").desc, col("rcls"))
    rw.withColumn("rn", row_number().over(byAnt))
      .filter(col("rn") === 1 && col("rw") > 0)
      .select(col("ra1"), col("ra2"), col("rcls"), col("rw"))
  }

  /** Winning-rule classification against the rule base (R9), per DISTINCT
    * feature vector with multiplicity: identical examples classify
    * identically, so we group to (x1, x2, cls, m=count) first, score each
    * distinct vector once against the ≤9 broadcast rules, and weight the
    * confusion matrix by m.
    *
    * This is both the determinism fix — (l_orderkey, l_linenumber) is NOT
    * unique in the data, so partitioning by it merged different examples and
    * let cross-example score ties order arbitrarily — and the 100 TB plan:
    * distinct feature vectors ≪ rows, so the expensive fan-out shrinks by the
    * duplication factor. */
  private[queries] def classified(spark: SparkSession, dir: String,
                                  costSensitive: Boolean = true): DataFrame = {
    // ONE corpus scan (guide §1.2 "remove unnecessary passes"): the scoring
    // grain (x1, x2, cls, m) derives from the SAME distinct-vector
    // aggregate the rule-base fit consumes — (a1, a2) is a pure function of
    // (x1, x2), so each (x1, x2, cls) group has exactly one (a1, a2) row
    // and sum(mcnt) ≡ the previous direct count(1); the un-shared form
    // scanned lineitem once per consumer (the two groupBys' different keys
    // defeat ReusedExchange).
    val vg = vectorGex(spark, dir).materialized
    val gex = vg.groupBy("x1", "x2", "cls").agg(sum(col("mcnt")).as("m"))
    val scored = gex.crossJoin(
      broadcast(ruleBaseFrom(vg, costSensitive, tnormMin = false)))
      .withColumn("score",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2) * col("rw"), 12))
    val perEx = Window.partitionBy("x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"))
    scored.withColumn("rn", row_number().over(perEx)).filter(col("rn") === 1)
      .select(col("x1"), col("x2"), col("cls").as("actual"),
              col("rcls").as("predicted"), col("m"))
  }

  /** q38: class counts + cost vector (R3). */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    labeled(spark, dir).groupBy("cls").agg(count(lit(1)).as("n"))
      .select(col("cls").cast(LongType).as("cls"), col("n"),
              round(when(col("n") === min("n").over(all),
                         max("n").over(all) * lit(1.0) / col("n"))
                      .otherwise(lit(1.0)).cast(DoubleType), 6).as("cost"))
      .orderBy("cls")
  }

  /** q39: raw 3-label membership values of the two attributes (R2). */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity").as("x1"), col("l_discount").as("x2"))
    val q = ChiCore.memberships(col("x1"), P1)
    val d = ChiCore.memberships(col("x2"), P2)
    li.select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
              round(q(0), 6).as("q_lo"), round(q(1), 6).as("q_mid"), round(q(2), 6).as("q_hi"),
              round(d(0), 6).as("d_lo"), round(d(1), 6).as("d_mid"), round(d(2), 6).as("d_hi"),
              col("x1"), col("x2"))
      .orderBy("l_orderkey", "l_linenumber", "x1", "x2")
      .drop("x1", "x2")
  }

  /** q40: candidate rule generation — argmax antecedent per example (R4). */
  def q40(spark: SparkSession, dir: String): DataFrame =
    labeled(spark, dir)
      .groupBy("a1", "a2", "cls").agg(count(lit(1)).as("n"))
      .select(col("a1").cast(LongType).as("a1"), col("a2").cast(LongType).as("a2"),
              col("cls").cast(LongType).as("cls"), col("n"))
      .orderBy("a1", "a2", "cls")

  /** q41: the final rule base with CS-PCF weights (R5–R7). */
  private def ruleBaseOut(rb: DataFrame): DataFrame =
    rb.select(col("ra1").cast(LongType).as("a1"), col("ra2").cast(LongType).as("a2"),
              col("rcls").cast(LongType).as("cls"), round(col("rw"), 6).as("rw"))
      .orderBy("a1", "a2")

  private def confusionOut(cl: DataFrame): DataFrame =
    cl.groupBy("actual", "predicted").agg(sum(col("m")).as("n"))
      .select(col("actual").cast(LongType).as("actual"),
              col("predicted").cast(LongType).as("predicted"), col("n"))
      .orderBy("actual", "predicted")

  def q41(spark: SparkSession, dir: String): DataFrame =
    ruleBaseOut(ruleBase(spark, dir))

  /** q42: winning-rule classification → confusion matrix (R9/R10). */
  def q42(spark: SparkSession, dir: String): DataFrame =
    confusionOut(classified(spark, dir))

  /** x51: the BASE (non-cost-sensitive) Chi-FRBCS rule base — q41's chain
    * with unit costs. Same plan shape; the learned weights differ wherever
    * the cost vector tipped a conflict toward the minority class. */
  def x51(spark: SparkSession, dir: String): DataFrame =
    ruleBaseOut(ruleBase(spark, dir, costSensitive = false))

  /** x52: base-variant confusion matrix — q42 without cost weighting; read
    * against q42 it quantifies what cost-sensitivity buys on the minority
    * class (the reference family's own CS-vs-base comparison). */
  def x52(spark: SparkSession, dir: String): DataFrame =
    confusionOut(classified(spark, dir, costSensitive = false))

  /** q43: accuracy / TPR / TNR / GM / AUC from the confusion matrix (R10). */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val cm = classified(spark, dir).agg(
      sum(when(col("actual") === 1 && col("predicted") === 1, col("m")).otherwise(0L)).as("tp"),
      sum(when(col("actual") === 0 && col("predicted") === 0, col("m")).otherwise(0L)).as("tn"),
      sum(when(col("actual") === 0 && col("predicted") === 1, col("m")).otherwise(0L)).as("fp"),
      sum(when(col("actual") === 1 && col("predicted") === 0, col("m")).otherwise(0L)).as("fn"))
    val tpr: Column = col("tp") * lit(1.0) / (col("tp") + col("fn"))
    val tnr: Column = col("tn") * lit(1.0) / (col("tn") + col("fp"))
    val fpr: Column = col("fp") * lit(1.0) / (col("fp") + col("tn"))
    cm.select(
      round((col("tp") + col("tn")) * lit(1.0) /
            (col("tp") + col("tn") + col("fp") + col("fn")), 6).as("accuracy"),
      round(tpr, 6).as("tpr"),
      round(tnr, 6).as("tnr"),
      round(sqrt(tpr * tnr), 6).as("gm"),
      round((lit(1) + tpr - fpr) / lit(2), 6).as("auc"))
  }

  /** Winning-rule frame WITH rule identity: q42's scoring chain, but the
    * per-example tie order is refined to a TOTAL order (score desc, rcls,
    * ra1, ra2) so the winning RULE — not just its class — is deterministic.
    * Base for the explainability operators x201/x202. */
  private def winningRule(spark: SparkSession, dir: String): DataFrame = {
    // one corpus scan — the classified() single-aggregate device
    val vg = vectorGex(spark, dir).materialized
    val gex = vg.groupBy("x1", "x2", "cls").agg(sum(col("mcnt")).as("m"))
    val perEx = Window.partitionBy("x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"), col("ra1"), col("ra2"))
    gex.crossJoin(broadcast(ruleBaseFrom(vg, costSensitive = true,
        tnormMin = false)))
      .withColumn("score",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2) * col("rw"), 12))
      .withColumn("rn", row_number().over(perEx)).filter(col("rn") === 1)
      .select(col("x1"), col("x2"), col("cls").as("actual"), col("m"),
              col("ra1"), col("ra2"), col("rcls"), col("rw"), col("score"))
  }

  /** x201: PER-RULE COVERAGE — the FRBCS model card: for every rule in the
    * CS rule base, the example mass it WINS (fires as the argmax rule), how
    * much of that mass it classifies correctly, its precision, and its share
    * of the corpus — the explainability view that tells a rule-base author
    * which of the ≤9 rules do the work and which are dead weight. Rules that
    * never win stay in the report with zero mass (left join from the rule
    * base), because "this rule never fires" is the finding.
    *
    * 100 TB: the win assignment rides the q42 distinct-vector device (the
    * only row-scale work is the vector compression); the coverage rollup
    * groups ≤|vectors| rows by ≤9 rules. */
  def x201(spark: SparkSession, dir: String): DataFrame = {
    val rb = ruleBase(spark, dir)
      .select(col("ra1").as("ba1"), col("ra2").as("ba2"),
              col("rcls").as("bcls"), col("rw").as("brw"))
    val winAgg = winningRule(spark, dir)
      .groupBy("ra1", "ra2", "rcls")
      .agg(sum(col("m")).as("n_won"),
           sum(when(col("actual") === col("rcls"), col("m")).otherwise(0L)).as("n_correct"))
    val total = Window.partitionBy() // over the ≤9-row joined aggregate
    rb.join(winAgg,
        col("ba1") === col("ra1") && col("ba2") === col("ra2") &&
        col("bcls") === col("rcls"), "left")
      .select(col("ba1").cast(LongType).as("a1"), col("ba2").cast(LongType).as("a2"),
              col("bcls").cast(LongType).as("cls"), round(col("brw"), 6).as("rw"),
              coalesce(col("n_won"), lit(0L)).as("n_won"),
              coalesce(col("n_correct"), lit(0L)).as("n_correct"))
      .withColumn("rule_precision",
        when(col("n_won") > 0, round(col("n_correct") * lit(1.0) / col("n_won"), 6)))
      .withColumn("win_share",
        round(col("n_won") * lit(1.0) / sum(col("n_won")).over(total), 6))
      .orderBy("a1", "a2")
  }

  /** x202: CONFIDENCE CALIBRATION of the winning rule's ACTIVATION —
    * reliability table: the matching degree μ₁·μ₂ ∈ [0,1] of each example
    * against its winning rule, bucketed into deciles, per bucket the
    * example mass, the mean activation, and the empirical accuracy. Read as
    * "when the example matches its firing rule at degree 0.8–0.9, how often
    * is the verdict right?" — the calibration story behind q43's single
    * headline number. (Calibrating on the rw-weighted SCORE would be
    * useless here: rule weights are ~0.001–0.03, so every score lands in
    * decile 0; activation is the [0,1]-scaled confidence the fuzzy
    * semantics actually define. The WINNER is still chosen by score — the
    * classifier's real decision rule.)
    *
    * 100 TB: same distinct-vector chassis; the bucket rollup is ≤10 keys.
    * Mean activation is the exact-integer trick at 6 dp (the report's own
    * precision): SUM(round(act,6)·1e6·m) is an exact BIGINT that cannot
    * overflow below ~9×10¹² examples, and the mean divides two exact
    * integers once — no float accumulation order to disagree across
    * engines. (×1e12 would be exacter but overflows int64 at ~9M rows.) */
  def x202(spark: SparkSession, dir: String): DataFrame = {
    val win = winningRule(spark, dir)
      .withColumn("act",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2), 12))
      .withColumn("bucket",
        least(floor(col("act") * 10).cast(LongType), lit(9L)))
      .withColumn("act_p6", round(col("act") * 1e6, 0).cast(LongType))
    win.groupBy("bucket")
      .agg(sum(col("m")).as("n"),
           sum(col("act_p6") * col("m")).as("sp6"),
           sum(when(col("actual") === col("rcls"), col("m")).otherwise(0L)).as("n_correct"))
      .select(col("bucket"), col("n"),
              round(col("sp6") * lit(1.0) / (col("n") * lit(1e6)), 6).as("mean_activation"),
              col("n_correct"),
              round(col("n_correct") * lit(1.0) / col("n"), 6).as("accuracy"))
      .orderBy("bucket")
  }

  /** x199: McNEMAR'S PAIRED TEST, CS vs base classifier — the reference
    * family's own protocol for claiming one classifier beats another on THE
    * SAME examples (paired, not two independent accuracy runs): the
    * continuity-corrected statistic (|b−c|−1)²/(b+c) over the discordant
    * counts b = CS-only-correct mass, c = base-only-correct mass, with the
    * 1-df 95 % critical value (3.841) applied as a literal so the verdict
    * is engine-portable. Read with x52/q42 it answers "does the cost vector
    * SIGNIFICANTLY change classification, or just shuffle ties?".
    *
    * 100 TB: both classifications are per DISTINCT feature vector with
    * multiplicity (the q42 device), so the pairing join is bounded by
    * |vectors| — broadcast — and each example's (cs, base) verdict pair is
    * weighted by its multiplicity in one final 1-row aggregate. */
  def x199(spark: SparkSession, dir: String): DataFrame = {
    val cs = classified(spark, dir)
      .select(col("x1"), col("x2"), col("actual"),
              col("predicted").as("pred_cs"), col("m"))
    val base = classified(spark, dir, costSensitive = false)
      .select(col("x1").as("bx1"), col("x2").as("bx2"),
              col("actual").as("bactual"), col("predicted").as("pred_base"))
    // (x1, x2, actual) is the classification grain on both sides → 1:1 join
    val csOk = col("pred_cs") === col("actual")
    val baseOk = col("pred_base") === col("bactual")
    val agg = cs.join(broadcast(base),
        col("x1") === col("bx1") && col("x2") === col("bx2") &&
        col("actual") === col("bactual"))
      .agg(sum(when(csOk && baseOk, col("m")).otherwise(0L)).as("n11"),
           sum(when(csOk && !baseOk, col("m")).otherwise(0L)).as("n10"),
           sum(when(!csOk && baseOk, col("m")).otherwise(0L)).as("n01"),
           sum(when(!csOk && !baseOk, col("m")).otherwise(0L)).as("n00"))
    val b = col("n10"); val c = col("n01")
    val num = (abs(b - c) - 1) * (abs(b - c) - 1)
    // zero-discordance guard: when the two classifiers never disagree
    // (b+c = 0) the statistic is undefined — emit NULL on both engines
    // (Spark double division would yield NaN, DuckDB NULL; the guard
    // makes the agreement explicit instead of data-dependent).
    val defined = (b + c) > 0
    agg.select(col("n11"), col("n10"), col("n01"), col("n00"),
      when(defined, round(num * lit(1.0) / (b + c), 6)).as("chi2_stat"),
      when(defined, num * lit(1.0) / (b + c) > 3.841).as("significant_95"))
  }

  /** x272: DECILE LIFT & GAINS TABLE — the model-eval readout every scored
    * campaign/ranking review reads: test examples ordered by the
    * classifier's winning-rule score, cut into 10 exact population deciles,
    * each reporting size, positives, positive rate, cumulative capture of
    * all positives, and lift vs the base rate (all ppm — exact integer
    * floor division; lift is defined as ppm-rate over ppm-base-rate, so no
    * term ever exceeds rate·10⁶ ≤ 10¹² and the arithmetic stays exact
    * BIGINT to ~9·10¹² examples without HUGEINT).
    *
    * Decile assignment is EXACT under ties and group multiplicity: scoring
    * happens at the distinct-feature-vector grain (the q42 device — the
    * classification grain, GRID-bounded at ≤ \|x1 grid\|·\|x2 grid\|·2
    * rows regardless of data size), each group occupies the row interval
    * [cum+1, cum+m] under the total order (score DESC, x1, x2, cls), and
    * its overlap with each decile interval [⌊(d−1)N/10⌋+1, ⌊dN/10⌋] is
    * computed by interval intersection — a group straddling a boundary
    * splits exactly, no per-row rank ever materializes.
    *
    * 100 TB: the data-sized work is ONE groupBy to the grid-bounded grain
    * (map-side combinable); ranking, spans and decile cells all live on
    * that bounded frame (the unpartitioned windows sit over aggregate
    * output — hundreds of rows). A per-row global sort (the ntile idiom)
    * would shuffle every example; this never ranks rows at all. */
  def x272(spark: SparkSession, dir: String): DataFrame = {
    // one corpus scan — the classified() single-aggregate device
    val vg = vectorGex(spark, dir).materialized
    val gex = vg.groupBy("x1", "x2", "cls").agg(sum(col("mcnt")).as("m"))
    val scored = gex.crossJoin(
      broadcast(ruleBaseFrom(vg, costSensitive = true, tnormMin = false)))
      .withColumn("score",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2) * col("rw"), 12))
    val perEx = Window.partitionBy("x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"))
    val best = scored.withColumn("rn", row_number().over(perEx))
      .filter(col("rn") === 1)
      .select(col("x1"), col("x2"), col("cls"), col("m"), col("score"))
    val ord = Window.orderBy(col("score").desc, col("x1"), col("x2"), col("cls"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = best
      .withColumn("lo", coalesce(sum(col("m")).over(ord), lit(0L)) + lit(1L))
      .withColumn("hi", col("lo") + col("m") - lit(1L))
    val tot = best.agg(sum(col("m")).as("tot_n"),
      sum(when(col("cls") === 1, col("m")).otherwise(0L)).as("tot_p"))
    val deciles = spark.range(1, 11).select(col("id").as("decile"))
    val cells = spans.crossJoin(broadcast(tot)).crossJoin(broadcast(deciles))
      .withColumn("dlo", expr("(decile - 1) * tot_n DIV 10 + 1"))
      .withColumn("dhi", expr("decile * tot_n DIV 10"))
      .withColumn("ov", greatest(lit(0L),
        least(col("hi"), col("dhi")) - greatest(col("lo"), col("dlo")) + lit(1L)))
      .filter(col("ov") > 0)
    val perD = cells.groupBy("decile")
      .agg(sum(col("ov")).as("n"),
           sum(when(col("cls") === 1, col("ov")).otherwise(0L)).as("n_pos"),
           max(col("tot_n")).as("tot_n"), max(col("tot_p")).as("tot_p"))
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perD.withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .select(col("decile"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 DIV n").as("pos_rate_ppm"),
        expr("cum_pos * 1000000 DIV tot_p").as("cum_capture_ppm"),
        expr("(n_pos * 1000000 DIV n) * 1000000 DIV (tot_p * 1000000 DIV tot_n)")
          .as("lift_ppm"))
      .orderBy("decile")
  }

  /** x281: m-CHUNK MAP-SIDE LEARNING ABLATION — the paper's actual
    * MapReduce scheme ([P1 §4.2], SURVEY §2.1 R5/R7): each of m mappers
    * learns a rule base over ITS data chunk only (chunk-local CS-PCF
    * weights, chunk-local conflict resolution) and the reducer fuses the
    * partial bases keeping, per antecedent, the rule with maximum weight
    * (tie → lowest class). Every other key here computes the exact GLOBAL
    * rule base (≡ m = 1 — a strictly better, mapper-count-independent
    * answer the paper's single-pass scheme cannot reach); this key
    * reproduces the paper's m-SENSITIVITY — its §5.3 scaling axis — at
    * m ∈ {1, 4, 16} with DETERMINISTIC chunking: the portable Knuth mix of
    * (l_orderkey, l_linenumber), a reproducible stand-in for HDFS split
    * assignment both engines replay. The cost vector and majority class
    * stay GLOBAL (the paper derives the IR costs from the full training
    * distribution before the map phase). Output per m: fused RB size and
    * training accuracy / GM in bit-stable micro-units.
    *
    * m = 1 is the identity leg — Round12Spec pins its fused RB ≡ the
    * global q41/x06 rule base rule-for-rule. At m > 1 each chunk's RW
    * denominator sees only that chunk's counter-example mass, so partial
    * RWs drift UP for locally-clean antecedents and max-RW fusion keeps
    * the most optimistic chunk's consequent. Measured drift at sf0.01
    * (driver-checked values): RB size stays 9 at every m — the antecedent
    * grid is saturated — but the CONSEQUENTS flip: accuracy climbs
    * 458 967 → 489 067 → 819 000 ppm while GM collapses
    * 502 129 → 508 505 → 307 556 ppm from m=1 to m=16. That is the paper's
    * §5.3 observation reproduced: chunk-local weighting dissolves the
    * cost-sensitive minority protection as the mapper count grows, trading
    * minority recall (GM) for raw accuracy.
    *
    * 100 TB: the chunk id is one map-side column; candidates stay ≤
    * m·L²·|C| rows (broadcast both sides of the weight join); the weight
    * aggregation is ONE (chunk, antecedent, class)-keyed partial+final agg
    * — the paper's m single-JVM mappers become m logical key groups in the
    * same shuffle, so m scales freely without re-planning. The corpus is
    * scanned ONCE for all three m values (round 13): the FINEST (m = 16)
    * chunk aggregate is checkpointed and the coarser legs re-chunk it by
    * `chunk % m` — exact because every declared m divides 16, so
    * (k mod 16) mod m ≡ k mod m, and summing the finer multiplicities is
    * the same partial+final aggregation the direct build runs. */
  def x281(spark: SparkSession, dir: String): DataFrame = {
    val gex16 = mChunkGex(spark, dir, 16).materialized
    // the three per-m reports each run an eager bounded-grid fuse off the
    // same checkpointed aggregate — independent work, submitted
    // concurrently (guide §2.6, graft.engine.Par); identical outputs
    graft.engine.Par.all(
        Seq(1, 4, 16).map(m => () => mChunkReportFrom(rechunk(gex16, m), m)))
      .reduce(_ unionByName _).orderBy("m")
  }

  /** x308: THE Chi-FRBCS-BigData-AVE FUSION VARIANT — x281's m-chunk
    * ablation under the paper's SECOND reducer ([P2]'s Max/Ave pair,
    * SURVEY §2.3's last OPEN algorithm): instead of keeping the single
    * maximum-weight partial rule per antecedent, Ave first AVERAGES the
    * weights of equal-(antecedent, consequent) rules across the partial
    * RBs that learned them, then keeps the consequent with the higher
    * averaged weight. Averaging rewards CONSISTENCY across chunks where
    * Max rewards one optimistic chunk — the paper's motivation for
    * shipping both. Same grid (m ∈ {1, 4, 16}), same single-scan
    * checkpointed-gex device, same (m, n_rules, acc_ppm, gm_ppm) report;
    * Round14Spec pins the m=1 degeneracy (Ave ≡ Max when there is one
    * chunk) and an Ave-vs-Max consequent flip on a planted conflict.
    * Measured at sf0.01 (driver-checked): identical at m=1 (458967 /
    * 502129 ppm), then Ave softens Max's drift — acc 578600 vs 489067 at
    * m=4, and at m=16 Ave holds GM at 359130 ppm where Max collapses to
    * 307556 (accuracy 776450 vs 819000): averaging damps the optimistic
    * chunk-local weights that dissolve minority protection under Max,
    * exactly the paper's stated reason for shipping the Ave reducer.
    *
    * 100 TB: identical shape to x281 — the fuse's only new work is a
    * (antecedent, consequent)-keyed BIGINT partial+final aggregate over
    * the ≤ m·L²·|C| partial rules, bounded and broadcast-sized at any m. */
  def x308(spark: SparkSession, dir: String): DataFrame = {
    val gex16 = mChunkGex(spark, dir, 16).materialized
    // concurrent per-m reports (x281's discipline; identical outputs)
    graft.engine.Par.all(Seq(1, 4, 16).map(m =>
        () => mChunkReportFrom(rechunk(gex16, m), m, mChunkAveFusedRbFrom)))
      .reduce(_ unionByName _).orderBy("m")
  }

  /** Re-chunk the finest (16-chunk) aggregate to m chunks. Exact for any
    * m | 16: the chunk id is a mod-16 residue of the Knuth mix, and
    * (k mod 16) mod m = k mod m when m divides 16. */
  private def rechunk(gex16: DataFrame, m: Int): DataFrame = {
    require(16 % m == 0, s"x281 re-chunking needs m | 16, got $m")
    if (m == 16) gex16
    else gex16.withColumn("chunk", col("chunk") % m)
      .groupBy("chunk", "x1", "x2", "a1", "a2", "cls")
      .agg(sum(col("mcnt")).as("mcnt"))
  }

  /** The fused rule base of the m-chunk scheme (x281's core; also the
    * Round12Spec m=1 identity probe). Returns (ra1, ra2, rcls, rw). */
  private[graft] def mChunkFusedRb(spark: SparkSession, dir: String,
                                   m: Int): DataFrame =
    mChunkFusedRbFrom(mChunkGex(spark, dir, m))

  /** The CHUNK-LOCAL partial rule bases (each mapper's resolved RB): the
    * shared first half of both fusion variants — chunk-local CS-PCF weight
    * sums, chunk-local conflict resolution, positive-RW filter. Returns
    * (chunk, ra1, ra2, rcls, rw). */
  private def mChunkPartialRb(gex: DataFrame): DataFrame = {
    val all = Window.partitionBy()
    val costsDf = {
      val withC = gex.groupBy("cls").agg(sum(col("mcnt")).as("n"))
        .withColumn("c",
          when(col("n") === min("n").over(all),
               max("n").over(all) * lit(1.0) / col("n"))
            .otherwise(lit(1.0)))
      withC.agg(max(when(col("cls") === 1, col("c"))).as("c1"),
                max(when(col("cls") === 0, col("c"))).as("c0"))
    }
    val ants = gex.select(col("chunk").as("achunk"), col("a1").as("ra1"),
                          col("a2").as("ra2"), col("cls").as("rcls")).distinct()
    val w = round(
        when(col("cls") === 1, col("c1")).otherwise(col("c0")) *
          ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
          ChiCore.membershipAt(col("x2"), col("ra2"), P2),
        12).cast(DecimalType(18, 12)) * col("mcnt").cast(DecimalType(19, 0))
    val sums = gex.crossJoin(broadcast(costsDf))
      .join(broadcast(ants), col("chunk") === col("achunk"))
      .select(col("chunk"), col("ra1"), col("ra2"), col("rcls"), col("cls"),
              w.as("w"))
      .groupBy("chunk", "ra1", "ra2", "rcls")
      .agg(sum(when(col("cls") === col("rcls"), col("w"))).as("w_match"),
           sum(col("w")).as("w_all"))
    val rw = sums.filter(col("w_all") > 0)
      .withColumn("rw",
        round(col("w_match") * 2 - col("w_all"), 6).cast(DoubleType) /
          round(col("w_all"), 6).cast(DoubleType))
    // chunk-local conflict resolution (the mapper's R6/R7)
    val byChunkAnt = Window.partitionBy("chunk", "ra1", "ra2")
      .orderBy(col("rw").desc, col("rcls"))
    rw.withColumn("rn", row_number().over(byChunkAnt))
      .filter(col("rn") === 1 && col("rw") > 0)
      .select(col("chunk"), col("ra1"), col("ra2"), col("rcls"), col("rw"))
  }

  /** The reducer's MAX-RW fusion across chunks (Chi-FRBCS-BigData-Max,
    * [P2]): per antecedent keep the single partial rule with maximum
    * weight, tie → lowest class; equal (rw, cls) rows from different
    * chunks carry identical output values, so the pick among them is
    * value-deterministic. */
  private[graft] def mChunkFusedRbFrom(gex: DataFrame): DataFrame = {
    val byAnt = Window.partitionBy("ra1", "ra2")
      .orderBy(col("rw").desc, col("rcls"))
    mChunkPartialRb(gex).withColumn("fn", row_number().over(byAnt))
      .filter(col("fn") === 1)
      .select(col("ra1"), col("ra2"), col("rcls"), col("rw"))
  }

  /** The reducer's AVERAGED-RW fusion (Chi-FRBCS-BigData-Ave, [P2] — the
    * SURVEY §2.3 Max/Ave pair's second member): per (antecedent,
    * consequent), average the rule weight across the partial RBs that
    * contain the rule; per antecedent keep the consequent with the
    * maximum averaged weight, tie → lowest class.
    *
    * Determinism protocol: each partial rw quantizes ONCE to integer
    * micro-units (round-to-0-decimals on `rw·10⁶` — the bit-stable
    * cross-engine device), the average's numerator is then an exact
    * BIGINT sum, and the cross-consequent comparison multiplies by
    * `720720 DIV cnt` (720720 = lcm(1..16) ≥ every chunk count), so
    * averages over DIFFERENT chunk counts compare in exact integers —
    * never a float divide inside an ORDER BY. The emitted rw is the
    * quantized average (s_micro / (cnt·10⁶), one IEEE divide both
    * engines spell identically). m = 1 degenerates to Max modulo the
    * micro quantization (Round14Spec pins report equality at sf0.001). */
  private[graft] def mChunkAveFusedRbFrom(gex: DataFrame): DataFrame = {
    val ave = mChunkPartialRb(gex)
      .withColumn("rw_micro", round(col("rw") * 1000000, 0).cast(LongType))
      .groupBy("ra1", "ra2", "rcls")
      .agg(sum(col("rw_micro")).as("s_micro"), count(lit(1)).as("cnt"))
    val byAnt = Window.partitionBy("ra1", "ra2")
      .orderBy(expr("s_micro * (720720 DIV cnt)").desc, col("rcls"))
    ave.withColumn("fn", row_number().over(byAnt))
      .filter(col("fn") === 1)
      .select(col("ra1"), col("ra2"), col("rcls"),
              (col("s_micro").cast(DoubleType) /
                (col("cnt") * 1000000L).cast(DoubleType)).as("rw"))
  }

  /** Chunk-compressed training view: one row per DISTINCT
    * (chunk, feature vector, argmax antecedent, class) with multiplicity —
    * every downstream input of the m-chunk chain derives from this ONE
    * aggregate (ReusedExchange serves the other consumers). */
  private def mChunkGex(spark: SparkSession, dir: String, m: Int): DataFrame =
    labeled(spark, dir)
      .withColumn("chunk",
        (((col("l_orderkey") % 100000000L) * lit(2654435761L) +
          col("l_linenumber") * lit(97564181L)) % lit(2147483647L) % m)
          .cast(IntegerType))
      .groupBy("chunk", "x1", "x2", "a1", "a2", "cls")
      .agg(count(lit(1)).as("mcnt"))

  /** One (m, n_rules, acc_ppm, gm_ppm) report row: fuse, score the full
    * training corpus with the fused base (winning-rule, global-majority
    * no-match fallback), reduce to micro-unit accuracy / GM. The gex
    * argument is a (re-chunked view of the) checkpointed chunk aggregate —
    * the only corpus-derived input of the whole chain. */
  private def mChunkReportFrom(gex: DataFrame, m: Int,
      fuse: DataFrame => DataFrame = mChunkFusedRbFrom): DataFrame = {
    // the fused base is ≤ L²·|C| rows read by two consumers — materialize
    // once instead of re-deriving the whole chunked chain per consumer
    val fused = fuse(gex).materialized
    val majDf = gex.groupBy("cls").agg(sum(col("mcnt")).as("n"))
      .orderBy(col("n").desc, col("cls")).limit(1)
      .select(col("cls").as("maj"))
    val gexS = gex.groupBy("x1", "x2", "cls").agg(sum(col("mcnt")).as("mm"))
    val scored = gexS.crossJoin(broadcast(fused))
      .withColumn("score",
        round(ChiCore.membershipAt(col("x1"), col("ra1"), P1) *
              ChiCore.membershipAt(col("x2"), col("ra2"), P2) * col("rw"), 12))
    val perEx = Window.partitionBy("x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"))
    val win = scored.withColumn("rn", row_number().over(perEx))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(majDf))
      .select(col("cls").as("actual"),
              when(col("score") > 0, col("rcls")).otherwise(col("maj"))
                .as("pred"),
              col("mm"))
    val cm = win.agg(
      sum(when(col("actual") === 1 && col("pred") === 1, col("mm")).otherwise(0L)).as("tp"),
      sum(when(col("actual") === 0 && col("pred") === 0, col("mm")).otherwise(0L)).as("tn"),
      sum(when(col("actual") === 0 && col("pred") === 1, col("mm")).otherwise(0L)).as("fp"),
      sum(when(col("actual") === 1 && col("pred") === 0, col("mm")).otherwise(0L)).as("fn"))
    val tpr: Column = col("tp") * lit(1.0) / (col("tp") + col("fn"))
    val tnr: Column = col("tn") * lit(1.0) / (col("tn") + col("fp"))
    cm.crossJoin(broadcast(fused.agg(count(lit(1)).as("n_rules"))))
      .select(lit(m.toLong).as("m"), col("n_rules"),
              round((col("tp") + col("tn")) * lit(1000000.0) /
                    (col("tp") + col("tn") + col("fp") + col("fn")), 0)
                .cast(LongType).as("acc_ppm"),
              round(sqrt(tpr * tnr) * 1000000, 0).cast(LongType).as("gm_ppm"))
  }

  /** x285: FUZZY REASONING METHOD ABLATION — the FRBCS design grid the Chi
    * family is defined over: inference = {winning rule, additive
    * combination} × t-norm = {product, minimum}. [P1] fixes (winner,
    * product); the additive (normalized-sum) FRM and the min conjunction
    * are the other classical choices (Cordón/del Jesus/Herrera's FRM
    * study), and which cell you pick changes the learned weights AND the
    * decision boundary — this key measures all four cells on the same
    * task, train-to-metrics. The t-norm threads through BOTH phases:
    * rule-weight learning (the match degree inside the CS-PCF sums,
    * [[matchDegree]]) and classification scoring, exactly as the FRBCS
    * definition requires. The additive FRM sums per-class evidence in
    * EXACT pico-unit integers (round(score·10¹², 0) per rule term, ≤ 9
    * bounded terms, order-free BIGINT sum — the x202 device), so the class
    * argmax is bit-stable; no-evidence vectors fall back to the global
    * majority class, mirroring the winner FRM's no-match fallback.
    *
    * 100 TB: the corpus is scanned ONCE — both t-norm fits, the scoring
    * grain and the majority class derive from one checkpointed
    * distinct-vector aggregate (the q41 broadcast-candidate shape works on
    * that grid); both FRMs read the same grid-bounded scored frame
    * (localCheckpoint'd — ≤ grid·|RB| rows), so the whole 4-cell ablation
    * costs one shuffle over the data plus grid-sized work. */
  def x285(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan: both t-norm fits, the scoring grain and the majority
    // class all derive from the same checkpointed vector aggregate
    val gex0 = vectorGex(spark, dir).materialized
    // concurrent per-t-norm reports (independent eager fits off the one
    // checkpointed aggregate; identical outputs)
    graft.engine.Par.all(Seq(false, true).map(tn => () => frmReports(gex0, tn)))
      .reduce(_ unionByName _).orderBy("frm", "tnorm")
  }

  /** Both FRM rows (winner + additive) for one t-norm. */
  private def frmReports(gex0: DataFrame, tnormMin: Boolean): DataFrame = {
    val tname = if (tnormMin) "min" else "prod"
    val fused = ruleBaseFrom(gex0, costSensitive = true, tnormMin = tnormMin)
      .materialized
    val nRules = fused.agg(count(lit(1)).as("n_rules"))
    val gexS = gex0.groupBy("x1", "x2", "cls")
      .agg(sum(col("mcnt")).as("mm"))
    val majDf = gexS.groupBy("cls").agg(sum(col("mm")).as("n"))
      .orderBy(col("n").desc, col("cls")).limit(1)
      .select(col("cls").as("maj"))
    // grid-bounded (≤ |x1 grid|·|x2 grid|·2·|RB| rows): materialize once,
    // both FRMs and the majority fallback read it without re-scanning
    val scored = gexS.crossJoin(broadcast(fused))
      .withColumn("score", round(matchDegree(tnormMin) * col("rw"), 12))
      .withColumn("si", round(col("score") * lit(1e12), 0).cast(LongType))
      .materialized
    val perEx = Window.partitionBy("x1", "x2", "cls")
      .orderBy(col("score").desc, col("rcls"))
    val winW = scored.withColumn("rn", row_number().over(perEx))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(majDf))
      .select(col("cls").as("actual"),
              when(col("score") > 0, col("rcls")).otherwise(col("maj"))
                .as("pred"), col("mm"))
    val votes = scored.groupBy("x1", "x2", "cls", "mm", "rcls")
      .agg(sum(col("si")).as("v"))
    val perCls = Window.partitionBy("x1", "x2", "cls")
      .orderBy(col("v").desc, col("rcls"))
    val winA = votes.withColumn("rn", row_number().over(perCls))
      .filter(col("rn") === 1)
      .crossJoin(broadcast(majDf))
      .select(col("cls").as("actual"),
              when(col("v") > 0, col("rcls")).otherwise(col("maj"))
                .as("pred"), col("mm"))
    def report(win: DataFrame, frm: String): DataFrame = {
      val cm = win.agg(
        sum(when(col("actual") === 1 && col("pred") === 1, col("mm")).otherwise(0L)).as("tp"),
        sum(when(col("actual") === 0 && col("pred") === 0, col("mm")).otherwise(0L)).as("tn"),
        sum(when(col("actual") === 0 && col("pred") === 1, col("mm")).otherwise(0L)).as("fp"),
        sum(when(col("actual") === 1 && col("pred") === 0, col("mm")).otherwise(0L)).as("fn"))
      val tpr: Column = col("tp") * lit(1.0) / (col("tp") + col("fn"))
      val tnr: Column = col("tn") * lit(1.0) / (col("tn") + col("fp"))
      cm.crossJoin(broadcast(nRules))
        .select(lit(frm).as("frm"), lit(tname).as("tnorm"), col("n_rules"),
                round((col("tp") + col("tn")) * lit(1000000.0) /
                      (col("tp") + col("tn") + col("fp") + col("fn")), 0)
                  .cast(LongType).as("acc_ppm"),
                round(sqrt(tpr * tnr) * 1000000, 0).cast(LongType).as("gm_ppm"))
    }
    report(winW, "winner").unionByName(report(winA, "additive"))
  }
}
