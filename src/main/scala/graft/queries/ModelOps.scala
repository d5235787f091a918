package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.engine.chi.{ChiCSClassifier, ChiCSModel}

/** x204/x205: the MODEL LIFECYCLE operators — persistence round-trip and the
  * reference's own KEEL-file training path. Both must reproduce q42's
  * confusion matrix EXACTLY (same oracle SQL registered): serialization is
  * only correct if the deserialized artifact is bit-for-bit the same
  * classifier.
  */
object ModelOps {

  private def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  private def features(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_quantity").as("x1"), col("l_discount").as("x2"),
      when(col("l_extendedprice") > 95000, 1).otherwise(0).as("label"))

  private def fit(df: DataFrame): ChiCSModel =
    new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1))
      .fit(df)

  private def confusion(scored: DataFrame): DataFrame =
    scored.groupBy(col("label").cast(LongType).as("actual"),
                   col("prediction").cast(LongType).as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")

  /** x204: MODEL SAVE/LOAD ROUND TRIP — fit → `MLWriter.save` (rules,
    * partitions, and param metadata as three parquet artifacts) → a FRESH
    * `ChiCSModel.load` → classify. The deployment path every production
    * model takes: the classifier that scores traffic is never the in-memory
    * object that was fitted, it is the deserialized artifact — so the
    * round-trip identity (exactly q42's confusion matrix) is the contract
    * that makes offline training + online serving coherent.
    *
    * 100 TB: the artifact is the ≤ Lⁿ·|C| rule base — KBs; save/load is
    * driver-side metadata I/O, classification stays the broadcast stateless
    * projection. */
  def x204(spark: SparkSession, dir: String): DataFrame = {
    val train = features(spark, dir).materialized // fit + transform
    val path = s"/tmp/graft_model_${tag(dir)}"
    fit(train).write.overwrite().save(path)
    val loaded = ChiCSModel.load(path)
    confusion(loaded.transform(train))
  }

  /** x205: KEEL END-TO-END TRAINING PATH — the reference system's actual
    * I/O loop: the training set is materialized as a KEEL `.dat` file
    * (`format("keel")`, the registered data source with R11 header
    * generation), read back THROUGH the KEEL header's schema, and the
    * classifier is fitted and evaluated on the re-read data. A
    * Chi-FRBCS-BigDataCS user's corpus lives in `.dat`; this pins that our
    * source neither perturbs a value (lossless numeric round trip) nor the
    * learned model (exactly q42's confusion matrix).
    *
    * 100 TB: the `.dat` write/read is the distributed Keel relation (one
    * task per split, PrunedFilteredScan on read); everything downstream is
    * the q38–q42 chain. */
  def x205(spark: SparkSession, dir: String): DataFrame = {
    val path = s"/tmp/graft_keel_${tag(dir)}"
    features(spark, dir).write.format("keel").mode("overwrite").save(path)
    val back = spark.read.format("keel").load(path)
      .select(col("x1").cast(DoubleType), col("x2").cast(DoubleType),
              col("label").cast(IntegerType).as("label"))
    confusion(fit(back).transform(back))
  }

  /** x207: MULTICLASS Chi-CS — the registered surface's binary task widened
    * to three quantity bands whose boundaries are OFFSET from the fuzzy-cell
    * crossings (18/42 vs 13.25/37.75), so cells are impure but dominated:
    * the rule base is non-empty AND the confusion is non-diagonal. (A first
    * attempt on price bands learned NOTHING — price is independent of
    * (quantity, discount) in this synthetic data, every cell split ~47/43/10
    * and all PCF weights went negative; a multiclass key whose rule base is
    * empty would vacuously "pass" as majority-voting.) The cost vector, rule
    * conflict resolution, winning-rule scoring, and the majority no-match
    * policy all generalize past |C|=2, emitting the full 3×3 confusion —
    * the reference family is defined for any class count, and this makes
    * that a driver-checked fact, not a spec-only one (GoldenMulticlassSpec
    * pins the arithmetic; this pins the engine twin against DuckDB's
    * per-class cost-joined restatement).
    *
    * 100 TB: rule space ≤ Lⁿ·|C| = 27 candidates, still broadcast;
    * everything else is the q38–q42 chain. */
  def x207(spark: SparkSession, dir: String): DataFrame = {
    val train = Tables.lineitem(spark, dir).select(
      col("l_quantity").as("x1"), col("l_discount").as("x2"),
      when(col("l_quantity") > 42, 2)
        .when(col("l_quantity") > 18, 1)
        .otherwise(0).as("label"))
      .materialized // fit + transform read it
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1))
      .fit(train)
    confusion(model.transform(train))
  }

  /** x208: AUTO-DESCRIPTOR RANGES (R11's data-derived path) — no declared
    * `featureRanges`: the estimator computes each attribute's [min, max] in
    * one aggregation pass and builds the fuzzy grid on top (the reference
    * generates the KEEL descriptor from data when the header lacks ranges).
    * The oracle recomputes the same min/max as scalar subqueries — both
    * engines then run identical IEEE grid arithmetic on identical bounds,
    * so data-derived grids are exactly as checkable as declared ones.
    *
    * 100 TB: the range pass is one partial+final min/max aggregate —
    * the single extra scan the auto path costs. */
  def x208(spark: SparkSession, dir: String): DataFrame = {
    val train = features(spark, dir).materialized // fit + transform
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .fit(train)
    confusion(model.transform(train))
  }

  /** x206: LABEL-GRANULARITY ABLATION — the Chi-FRBCS family's headline
    * hyperparameter (the number L of linguistic labels per attribute, FSS
    * 2015 §5 studies 3 vs more): fit at L = 3 and L = 5 over the same
    * ranges, report per-L (rule count, accuracy, GM). More labels = finer
    * fuzzy grid = more, more-specific rules — whether that buys accuracy or
    * just rules is THE granularity trade-off this measures.
    *
    * 100 TB: the corpus is scanned ONCE for both granularities (the x215
    * single-gex device through the estimator's weightCol); each fit then
    * works the bounded distinct-vector grid (rule space ≤ Lⁿ·|C| — 18 vs
    * 50 candidates, both broadcast); scoring is the stateless projection
    * over the same grid with multiplicity-weighted confusion sums; the
    * union is 2 rows. */
  def x206(spark: SparkSession, dir: String): DataFrame = {
    // ONE corpus scan for both granularities (round 13, the x215 device):
    // the distinct-vector aggregate with multiplicity feeds every fit via
    // weightCol and the scoring grain — digit-identical by the estimator's
    // own compression theorem
    val gex = features(spark, dir)
      .groupBy("x1", "x2", "label").agg(count(lit(1)).as("w"))
      .materialized
    // concurrent per-L fits (x215's discipline; identical outputs)
    graft.engine.Par.all(Seq(3, 5).map { l => () =>
      val model = new ChiCSClassifier()
        .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
        .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1))
        .setNumLabels(l)
        .setWeightCol("w")
        .fit(gex)
      val scored = model.transform(gex)
      val cm = scored.agg(
        sum(when(col("label") === 1 && col("prediction") === 1, col("w")).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("prediction") === 0, col("w")).otherwise(0L)).as("tn"),
        sum(when(col("label") === 0 && col("prediction") === 1, col("w")).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("prediction") === 0, col("w")).otherwise(0L)).as("fn"))
      val tpr = col("tp") * lit(1.0) / (col("tp") + col("fn"))
      val tnr = col("tn") * lit(1.0) / (col("tn") + col("fp"))
      cm.select(
        lit(l.toLong).as("num_labels"),
        lit(model.rules.length.toLong).as("n_rules"),
        round((col("tp") + col("tn")) * lit(1.0) /
              (col("tp") + col("tn") + col("fp") + col("fn")), 6).as("accuracy"),
        round(sqrt(tpr * tnr), 6).as("gm"))
    }).reduce(_ unionByName _).orderBy("num_labels")
  }

  /** x215: WIDE-ANTECEDENT ABLATION — the estimator fitted at n = 2, 4 and
    * 6 features (prefixes of one 6-feature projection of lineitem), per
    * width (rule count, accuracy, GM). [P1 §5.1]'s datasets are
    * 41-attribute; every other driver-checked chain here trains 2 — this
    * key makes the Lⁿ growth path a verified fact: at n = 6 the rule space
    * is 3⁶·2 = 1458 candidates and the learned base lands near the 729-cell
    * cap, so the compressed distinct-vector aggregation, the ≤2ⁿ neighbor
    * explosion, and the broadcast-rule transform all run at real width.
    * The label depends on a feature (l_tax) OUTSIDE the 2-wide prefix, so
    * the ablation measures something: accuracy/GM must IMPROVE when the
    * grid first sees tax at n = 4 (pinned in WideChiSpec).
    *
    * Oracle: the FULL train+score chain GENERATED over the same feature
    * list (OracleSqlRound10 — the x206 device with the per-feature
    * fragments emitted by iteration, not hand-spelled, so the same
    * generator covers any width).
    *
    * 100 TB: the corpus is scanned ONCE for all three widths (round 13,
    * the x285 one-gex discipline generalized through the estimator's
    * `weightCol`): the 6-wide DISTINCT-vector aggregate with multiplicity
    * is checkpointed and every width-n fit consumes it as pre-aggregated
    * input — a width-n fit off the 6-wide aggregate is digit-identical to
    * fitting the raw rows because the weight term is a pure function of
    * (features, cls) and DECIMAL × count is exact (the same theorem the
    * estimator's internal compression rests on; its internal re-grouping
    * to the n-wide grain just sums the supplied multiplicities). Scoring
    * runs on the same compressed frame with multiplicity-weighted
    * confusion sums. Each fit is then one (antecedent, class)-keyed
    * shuffle over the BOUNDED aggregate; the 2ⁿ neighbor explosion prunes
    * exactly-zero μ terms; the rule base (≤ Lⁿ·|C|, here ≤ 1458 rows)
    * stays broadcastable — width grows the BROADCAST payload, never the
    * corpus-side work. The %7 slice bounds the oracle's quadratic
    * restatement, not the engine. */
  def x215(spark: SparkSession, dir: String): DataFrame = {
    val ranges = Array(1.0, 50.0, 0.0, 0.1, 0.0, 0.08, 1.0, 7.0,
                       1.0, 12.0, 0.0, 2.0)
    // ONE corpus scan: the 6-wide distinct-vector aggregate serves every
    // width's fit AND the scoring grain (multiplicity column "w")
    val gex = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(
        col("l_quantity").as("x1"),
        col("l_discount").as("x2"),
        col("l_tax").as("x3"),
        col("l_linenumber").cast(DoubleType).as("x4"),
        month(col("l_shipdate")).cast(DoubleType).as("x5"),
        when(col("l_returnflag") === "A", 0.0)
          .when(col("l_returnflag") === "N", 1.0).otherwise(2.0).as("x6"),
        when(col("l_quantity") > 30 && col("l_tax") >= 0.04, 1)
          .otherwise(0).as("label"))
      .groupBy("x1", "x2", "x3", "x4", "x5", "x6", "label")
      .agg(count(lit(1)).as("w"))
      .materialized
    // the three width-n fits are independent eager estimator fits off the
    // one checkpointed aggregate — run concurrently (guide §2.6,
    // graft.engine.Par); per-fit data/params unchanged, outputs identical
    graft.engine.Par.all(Seq(2, 4, 6).map { n => () =>
      val model = new ChiCSClassifier()
        .setFeatureCols((1 to n).map(i => s"x$i").toArray).setLabelCol("label")
        .setFeatureRanges(ranges.take(2 * n))
        .setWeightCol("w")
        .fit(gex)
      val scored = model.transform(gex)
      val cm = scored.agg(
        sum(when(col("label") === 1 && col("prediction") === 1, col("w")).otherwise(0L)).as("tp"),
        sum(when(col("label") === 0 && col("prediction") === 0, col("w")).otherwise(0L)).as("tn"),
        sum(when(col("label") === 0 && col("prediction") === 1, col("w")).otherwise(0L)).as("fp"),
        sum(when(col("label") === 1 && col("prediction") === 0, col("w")).otherwise(0L)).as("fn"))
      val tpr = col("tp") * lit(1.0) / (col("tp") + col("fn"))
      val tnr = col("tn") * lit(1.0) / (col("tn") + col("fp"))
      cm.select(
        lit(n.toLong).as("n_features"),
        lit(model.rules.length.toLong).as("n_rules"),
        round((col("tp") + col("tn")) * lit(1.0) /
              (col("tp") + col("tn") + col("fp") + col("fn")), 6).as("accuracy"),
        round(sqrt(tpr * tnr), 6).as("gm"))
    }).reduce(_ unionByName _).orderBy("n_features")
  }

  /** One (n_rules, confusion, accuracy, gm) row for a fitted model scored
    * on its training frame — the x260/x263 reporting shape. */
  private def fitReport(model: ChiCSModel, train: DataFrame): DataFrame = {
    val scored = model.transform(train)
    val cm = scored.agg(
      sum(when(col("label") === 1 && col("prediction") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("label") === 0 && col("prediction") === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(col("label") === 0 && col("prediction") === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("label") === 1 && col("prediction") === 0, 1L).otherwise(0L)).as("fn"))
    val tpr = col("tp") * lit(1.0) / (col("tp") + col("fn"))
    val tnr = col("tn") * lit(1.0) / (col("tn") + col("fp"))
    cm.select(
      lit(model.rules.length.toLong).as("n_rules"),
      col("tp"), col("tn"), col("fp"), col("fn"),
      round((col("tp") + col("tn")) * lit(1.0) /
            (col("tp") + col("tn") + col("fp") + col("fn")), 6).as("accuracy"),
      round(sqrt(tpr * tnr), 6).as("gm"))
  }

  /** x260: NOMINAL-ATTRIBUTE Chi-CS — the top remaining fidelity gap vs
    * [P1 §5.1] (KDD Cup 99 carries protocol_type/service/flag): a native
    * StringType feature with CRISP SINGLETON membership (μ = 1 iff the
    * value equals the rule's category) and one linguistic label PER
    * CATEGORY, trained MIXED with a numeric fuzzy attribute. The nominal
    * attribute here is o_orderpriority — FIVE categories, where x215's
    * CASE-encode-to-numeric trick provably breaks: 5 values under L = 3
    * triangular MFs blend adjacent categories (μ(code 1 vs label 0) = 1/2,
    * not 0), while the estimator's dictionary grid (numLabels = |V| = 5,
    * halfWidth exactly 1) keeps every category crisp. The label depends on
    * BOTH attributes (urgent/high priority AND price > 150k), so learned
    * rules must bind the category and the fuzzy price band jointly.
    *
    * Oracle: the x215 generated-chain device extended with a CATEGORICAL
    * fragment (OracleSqlRound11) — the dictionary is restated as a
    * ROW_NUMBER rank over the sorted distinct values (the estimator's
    * sorted-distinct scan), the crisp μ is GREATEST(0, 1 − ABS(code −
    * label)) (IEEE-identical to the engine's triangular arithmetic at
    * halfWidth 1), and every per-feature fragment is emitted by iterating
    * the same feature list.
    *
    * 100 TB: the dictionary adds ONE aggregate pass (collect_set per
    * nominal attribute, all in one agg); encoding is an in-map
    * array_position against a broadcast literal; nominal attributes add NO
    * fan-out to the neighbor explosion (exactly one nonzero label). Rule
    * space 5·3·2 = 30 candidates, broadcast. */
  def x260(spark: SparkSession, dir: String): DataFrame = {
    val train = Tables.orders(spark, dir).select(
      col("o_totalprice").as("x1"),
      col("o_orderpriority").as("x2"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
             col("o_totalprice") > 150000, 1).otherwise(0).as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setNominalCols(Array("x2"))
      .setFeatureRanges(Array(0.0, 600000.0, 0.0, 0.0)) // nominal slot ignored
      .fit(train)
    fitReport(model, train)
  }

  /** x264: KEEL NOMINAL ROUND TRIP — the reference's full I/O loop for a
    * MIXED numeric+nominal dataset: x260's training frame is written as a
    * KEEL `.dat` (R11 header generation emits `@attribute x2 {…}` — the
    * category dictionary, sorted), read back THROUGH the header's schema,
    * and the classifier trains with the dictionary taken FROM THE KEEL
    * HEADER (`setNominalDictionaries`, the [P1 §4.2] path: the DataBase
    * derives from the declaration, not a data scan — fit pays NO distinct
    * pass, and a training category outside the declaration is rejected
    * loudly, the reference's contract). Must reproduce x260's report
    * EXACTLY (same oracle registered): the source neither perturbs a
    * value nor the dictionary, and header-declared vs data-derived
    * dictionaries are the same model when the header covers the data.
    *
    * 100 TB: the `.dat` write/read is the distributed Keel relation; the
    * declared dictionary removes the one extra aggregate pass x260 pays —
    * the header IS the descriptor. */
  def x264(spark: SparkSession, dir: String): DataFrame = {
    val path = s"/tmp/graft_keel_nom_${tag(dir)}"
    Tables.orders(spark, dir).select(
        col("o_totalprice").as("x1"),
        col("o_orderpriority").as("x2"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
               col("o_totalprice") > 150000, 1).otherwise(0).as("label"))
      .write.format("keel").mode("overwrite").save(path)
    val header = graft.sources.Keel.readHeader(spark, path)
    val dict = header.attributes.find(_.name == "x2")
      .flatMap(_.nominalValues)
      .getOrElse(sys.error("KEEL header lost the x2 dictionary"))
    val back = spark.read.format("keel").load(path)
      .select(col("x1").cast(DoubleType), col("x2"),
              col("label").cast(IntegerType).as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setNominalCols(Array("x2"))
      .setNominalDictionaries(Map("x2" -> dict))
      .setFeatureRanges(Array(0.0, 600000.0, 0.0, 0.0))
      .fit(back)
    fitReport(model, back)
  }

  /** x263: MISSING-VALUE PROTOCOL through the ML chain — KEEL declares
    * `<null>`/`?` (SURVEY §1.1) and the Keel reader parses them; this key
    * pins the documented policy end-to-end with nulls in train AND test,
    * over a MIXED numeric+nominal feature set:
    *  - a NULL attribute is SKIPPED in the product t-norm (factor 1) in
    *    both rule-weight aggregation and scoring — the example
    *    supports/matches every label of that attribute equally (the common
    *    KEEL-Chi choice; [P1] is silent);
    *  - a null-bearing example seeds NO candidate antecedent (a rule must
    *    constrain every attribute) but contributes weight mass to every
    *    rule its observed attributes match;
    *  - a NULL label drops the row from training entirely.
    * Nulls are planted on one numeric attribute (discount, ~1/13 of rows)
    * and one nominal attribute (returnflag, ~1/17) via key arithmetic both
    * engines restate exactly.
    *
    * Oracle: the x260 generator's null-aware fragments — every μ factor is
    * CASE WHEN x IS NULL THEN 1.0 ELSE <fragment> END, candidates require
    * all-non-null antecedents, and the engine's explode-to-all-labels
    * support is equivalent to the oracle's cross-join factor-1 restatement
    * BY CONSTRUCTION (the exploded row meets exactly the candidates the
    * cross join scores at factor 1).
    *
    * 100 TB: only null-bearing rows pay the |labels| fan-out (≤ L·|V| per
    * fully-null row, bounded by the grid, never by data); everything else
    * is the x215 chain. */
  def x263(spark: SparkSession, dir: String): DataFrame = {
    val train = Tables.lineitem(spark, dir).select(
      col("l_quantity").as("x1"),
      when(col("l_partkey") % 13 === 5, lit(null).cast(DoubleType))
        .otherwise(col("l_discount")).as("x2"),
      when(col("l_partkey") % 17 === 2, lit(null).cast(StringType))
        .otherwise(col("l_returnflag")).as("x3"),
      when(col("l_quantity") > 30 && col("l_tax") >= 0.04, 1)
        .otherwise(0).as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2", "x3")).setLabelCol("label")
      .setNominalCols(Array("x3"))
      .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1, 0.0, 0.0))
      .fit(train)
    fitReport(model, train)
  }

  /** x302: LEARNED QUALITY FILTER — distill the x47 heuristic quality gate
    * into a trained classifier (the fastText-device of GPT-3/LLaMA-era
    * curation: hand-written rules label a seed set, a cheap classifier
    * learns the decision surface and generalizes it): the Chi-CS estimator
    * is fitted on two per-document features — x1 = token count, x2 =
    * repetition percentage (max token count ·100 / tokens) — with the x47
    * gate verdict as the weak label, then scores the whole corpus. Output
    * per source: docs, gate-keeps, classifier-keeps, and classifier↔gate
    * agreement in exact ppm — the drift dashboard a curation team watches
    * when the learned filter replaces the rules. The classifier sees only
    * (length, repetition); the gate also reads the char band and the
    * stopword bit, so agreement < 10⁶ ppm is structural, not noise — the
    * number MEASURES how much of the gate the two features explain.
    *
    * 100 TB: ONE corpus scan (token_stats fused pass + the stopword
    * membership bit) materialized as the checkpointed feature frame; fit
    * compresses to distinct (x1, x2) vectors internally (the grid is
    * ≤ 90·~10³ cells — tiny) and transform is the stateless broadcast-rule
    * projection; the rollup is source-keyed. The weak-label device means
    * NO human labels anywhere in the loop — exactly why the pattern scales
    * to corpus size. */
  /** The x302/x305 weak-label feature frame: (doc_id, source, x1 = token
    * count, x2 = repetition %, label = the x47 gate verdict). ONE corpus
    * scan; both consumers checkpoint it. */
  private[graft] def qualityFeatures(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    Tables.documents(spark, dir)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("source"), col("n_chars"),
              call_function("token_stats", col("text")).as("ts"),
              (array_contains(toks, "the") || array_contains(toks, "a"))
                .as("stop_ok"))
      .select(col("doc_id"), col("source"),
              col("ts.n_tokens").cast(DoubleType).as("x1"),
              (col("ts.max_cnt").cast(DoubleType) * lit(100.0) /
                col("ts.n_tokens").cast(DoubleType)).as("x2"),
              when(col("n_chars").between(100, 500) &&
                   col("ts.max_cnt") * 5 < col("ts.n_tokens") &&
                   col("stop_ok"), 1).otherwise(0).as("label"))
  }

  def x302(spark: SparkSession, dir: String): DataFrame = {
    val base = qualityFeatures(spark, dir)
      .materialized // feeds fit AND transform — one corpus scan
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(10.0, 100.0, 0.0, 100.0))
      .fit(base)
    model.transform(base)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("label").cast(LongType)).as("n_keep_label"),
           sum(when(col("prediction") === 1, 1L).otherwise(0L))
             .as("n_keep_pred"),
           sum(when(col("prediction") === col("label"), 1L).otherwise(0L))
             .as("agree"))
      .withColumn("agree_ppm", expr("agree * 1000000 DIV n_docs"))
      .select("source", "n_docs", "n_keep_label", "n_keep_pred", "agree_ppm")
      .orderBy("source")
  }

  /** x305: LEAVE-ONE-SOURCE-OUT DATA ATTRIBUTION — which source's data
    * actually shapes the learned quality filter? For every corpus source
    * the x302 task's BASE-Chi rule base (cost-free — holding the cost
    * scalar fixed isolates the DATA effect from the class-balance effect)
    * is retrained WITHOUT that source and compared to the full model:
    * rule count, rules changed (consequent flips + appearing/vanishing
    * antecedents — a candidate seeded ONLY by the left-out source leaves
    * the grid entirely, the Chi-specific attribution channel), and
    * weak-label agreement over the FULL corpus (generalization of the
    * ablated filter). The group-ablation ("what if we drop source X")
    * protocol of LLM data curation, EXACT by construction: the retrain is
    * never re-run — per-(candidate, source) weight sums live on the
    * bounded grid and each LOSO model is the total MINUS one source's
    * slice, a DECIMAL subtraction that is digit-identical to refitting
    * (Σ over sources ≠ s ≡ Σ_total − Σ_s). A '(full)' control row rides
    * along (subtracting nothing) and must equal the full fit.
    *
    * 100 TB: the corpus-scale work is ONE distinct-vector aggregate at
    * the (source, x1, x2, label) grain; everything after — the 18-row
    * candidate grid × |sources| subtraction lattice, the per-model
    * conflict resolution, the vector-grid scoring — is bounded grid work
    * under partitioned (model, antecedent) windows. Adding a source costs
    * one more grid slice, never another corpus pass. */
  def x305(spark: SparkSession, dir: String): DataFrame = {
    val (gex, models, rb) = losoCore(spark, dir)
    x305Report(gex, models, rb)
  }

  /** x305's subtraction lattice up to the per-model rule bases: returns
    * (gex, models, rb) — rb carries one rule base per `lo` (every source
    * plus the '(full)' control). Exposed so Round13Spec can pin the
    * subtraction ≡ refit theorem against an independent estimator fit. */
  private[graft] def losoCore(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.engine.chi.ChiCore
    import graft.engine.chi.ChiCore.TriPartition
    val Q1 = TriPartition(10.0, 100.0)
    val Q2 = TriPartition(0.0, 100.0)
    // Subtraction arithmetic: Spark demotes (38,12) − (38,12) to (38,11)
    // (precision overflow → scale loss), and the downstream promotions then
    // DOUBLE-round the rw numerator — one rule's rw drifted 1e-8 from the
    // estimator's before this was pinned. Subtract at (25,12) — EXACT (the
    // sums carry ≤13 integer digits even at 10^12 docs: each term ≤ 1) —
    // and cast back to (38,12) so the rw expression below goes through
    // exactly the estimator's type promotions, making LOSO-by-subtraction
    // rule-for-rule identical to refitting (Round13Spec pins it).
    val dec0 = lit(0).cast(DecimalType(25, 12))
    val gex = qualityFeatures(spark, dir)
      .groupBy("source", "x1", "x2", "label").agg(count(lit(1)).as("m"))
      .withColumn("a1", ChiCore.argmaxLabel(ChiCore.memberships(col("x1"), Q1)))
      .withColumn("a2", ChiCore.argmaxLabel(ChiCore.memberships(col("x2"), Q2)))
      .materialized // the ONLY corpus-derived frame (5 consumers)
    // candidate antecedents + seeding sources: a candidate seeded only by
    // the left-out source is not generated by the LOSO fit at all.
    // seeds/sums and the model list are independent eager materializations
    // off the one checkpointed gex — overlap them (guide §2.6, Par);
    // identical frames.
    val ((seeds, sums), models) = graft.engine.Par.two(() => {
      val seeds = gex.select(col("a1").as("ra1"), col("a2").as("ra2"),
                             col("label").as("rcls"), col("source")).distinct()
        .groupBy("ra1", "ra2", "rcls")
        .agg(countDistinct(col("source")).as("n_seed_src"),
             max(col("source")).as("a_seed_src"))
        .materialized
      val ants = seeds.select("ra1", "ra2", "rcls")
      // exact per-(candidate, source) weight sums (cost-free base Chi)
      val term = round(ChiCore.membershipAt(col("x1"), col("ra1"), Q1) *
                       ChiCore.membershipAt(col("x2"), col("ra2"), Q2), 12)
        .cast(DecimalType(18, 12)) * col("m").cast(DecimalType(19, 0))
      val sums = gex.crossJoin(broadcast(ants))
        .select(col("source"), col("ra1"), col("ra2"), col("rcls"),
                col("label"), term.as("w"))
        .groupBy("source", "ra1", "ra2", "rcls")
        .agg(sum(when(col("label") === col("rcls"), col("w"))).as("s_match"),
             sum(col("w")).as("s_all"))
        .materialized
      (seeds, sums)
    }, () =>
      gex.select(col("source").as("lo")).distinct()
        .unionByName(gex.select(lit("(full)").as("lo")).limit(1))
        .materialized)
    val tot = sums.groupBy("ra1", "ra2", "rcls")
      .agg(sum(col("s_match")).as("t_match"), sum(col("s_all")).as("t_all"))
    val rb = tot.crossJoin(broadcast(models))
      .join(sums.withColumnRenamed("source", "lo"),
            Seq("lo", "ra1", "ra2", "rcls"), "left")
      .join(broadcast(seeds), Seq("ra1", "ra2", "rcls"))
      .filter(col("n_seed_src") > 1 || col("a_seed_src") =!= col("lo"))
      .withColumn("w_match",
        (col("t_match").cast(DecimalType(25, 12)) -
          coalesce(col("s_match").cast(DecimalType(25, 12)), dec0))
          .cast(DecimalType(38, 12)))
      .withColumn("w_all",
        (col("t_all").cast(DecimalType(25, 12)) -
          coalesce(col("s_all").cast(DecimalType(25, 12)), dec0))
          .cast(DecimalType(38, 12)))
      .filter(col("w_all") > 0)
      .withColumn("rw",
        round(col("w_match") * 2 - col("w_all"), 6).cast(DoubleType) /
          round(col("w_all"), 6).cast(DoubleType))
      .filter(col("rw") > 0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("lo", "ra1", "ra2")
          .orderBy(col("rw").desc, col("rcls"))))
      .filter(col("rn") === 1)
      .select(col("lo"), col("ra1"), col("ra2"), col("rcls"), col("rw"))
      .materialized // scoring + change-count + n_rules read it
    (gex, models, rb)
  }

  /** The x305 readout from the core frames. */
  private def x305Report(gex: DataFrame, models: DataFrame,
                         rb: DataFrame): DataFrame = {
    import graft.engine.chi.ChiCore
    import graft.engine.chi.ChiCore.TriPartition
    val Q1 = TriPartition(10.0, 100.0)
    val Q2 = TriPartition(0.0, 100.0)
    // per-model majority fallback, recomputed over the REMAINING data
    val clsMass = gex.groupBy("source", "label").agg(sum(col("m")).as("n"))
    val maj = clsMass.crossJoin(broadcast(models))
      .groupBy("lo", "label")
      .agg(sum(when(col("source") === col("lo"), 0L).otherwise(col("n")))
        .as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lo").orderBy(col("n").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("lo"), col("label").as("maj"))
    // score every model over the FULL corpus vector grid
    val vecs = gex.groupBy("x1", "x2", "label").agg(sum(col("m")).as("mm"))
    val scoreCol = round(ChiCore.membershipAt(col("x1"), col("ra1"), Q1) *
                         ChiCore.membershipAt(col("x2"), col("ra2"), Q2) *
                         col("rw"), 12)
    val win = vecs.crossJoin(broadcast(models))
      .join(broadcast(rb), Seq("lo"), "left")
      .withColumn("score", coalesce(scoreCol, lit(-1.0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lo", "x1", "x2", "label")
          .orderBy(col("score").desc, col("rcls"))))
      .filter(col("rn") === 1)
      .join(broadcast(maj), "lo")
      .select(col("lo"), col("label"),
              when(col("score") > 0, col("rcls")).otherwise(col("maj"))
                .as("pred"),
              col("mm"))
    val acc = win.groupBy("lo")
      .agg(sum(col("mm")).as("n_docs"),
           sum(when(col("label") === col("pred"), col("mm")).otherwise(0L))
             .as("agree"))
    // symmetric difference vs the full model's rule set
    val fullR = rb.filter(col("lo") === lit("(full)"))
      .select("ra1", "ra2", "rcls")
    val inter = rb.join(broadcast(fullR), Seq("ra1", "ra2", "rcls"))
      .groupBy("lo").agg(count(lit(1)).as("n_inter"))
    val nRules = rb.groupBy("lo").agg(count(lit(1)).as("n_rules"))
    val nFullDf = fullR.agg(count(lit(1)).as("n_full"))
    acc.join(nRules, Seq("lo"), "left")
      .join(inter, Seq("lo"), "left")
      .crossJoin(broadcast(nFullDf))
      .select(col("lo").as("left_out"),
              coalesce(col("n_rules"), lit(0L)).as("n_rules"),
              (coalesce(col("n_rules"), lit(0L)) + col("n_full") -
                coalesce(col("n_inter"), lit(0L)) * 2L).as("rules_changed"),
              col("n_docs"),
              expr("agree * 1000000 DIV n_docs").as("agree_ppm"))
      .orderBy("left_out")
  }
}
