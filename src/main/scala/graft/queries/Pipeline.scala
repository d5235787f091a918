package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** x20–x21: training-corpus assembly operators — the split/decontaminate
  * steps between raw documents and a training set (SURVEY.md §2.4 mandate).
  * Both are oracle-checked: the math is plain BIGINT arithmetic and string
  * normalization, portable to DuckDB digit-for-digit.
  */
object Pipeline {

  /** x20: deterministic train/val/test assignment. Fibonacci-multiplicative
    * hash of doc_id into 1000 buckets → 80/10/10 split; per-(split, lang)
    * counts. The assignment is a pure projection: no shuffle, no RNG, no
    * sampling seed to desynchronize across runs/executors — the same row
    * lands in the same split on 1 partition or 10 000. The id is reduced
    * mod 1e8 BEFORE the multiply so the product (< 2.7e17) can never
    * overflow int64 for ANY id — Spark would wrap silently while DuckDB
    * errors, so an unbounded product is a portability bug lying in wait,
    * not just a precision one. The only shuffle is the tiny count
    * aggregation. */
  def x20(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", ((col("doc_id") % 100000000L) * lit(2654435761L)) % 1000)
      .withColumn("split",
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("split", "lang")

  /** x139: SPLIT-LEAKAGE AUDIT — the check every x20-style split must pass
    * before training: count normalized-text groups (q44's dedup key) whose
    * members land in MORE THAN ONE of x20's train/val/test splits — i.e.
    * duplicates that cross the split boundary and leak evaluation data into
    * training. x21 removes leakage against an EXTERNAL benchmark; this
    * audits the corpus's own split against its own duplicates. Reported per
    * ordered split pair (train↔test etc.) plus each group's size mass, all
    * exact integers. The split hash keys on doc_id while the leak key is
    * the TEXT — precisely why leakage is possible and must be measured
    * (hash-splitting by text instead is the fix x33's canonical ids feed).
    * The corpus is duplicate-free at every sf, so a doc_id%7 slice is
    * re-added at +1000003 (x110's planted-twin device; the offset must NOT
    * be ≡ 0 mod 1000 — the multiplicative split hash is linear mod 1000,
    * so a +1e6 twin would land in its original's split every time and the
    * audit would vacuously pass): twins then hash to independent splits,
    * making the measured leakage a deterministic non-trivial matrix.
    *
    * 100 TB: one text-keyed aggregate (the q44 shuffle) collecting a ≤
    * 3-element split set per group (collect_set, bounded by |splits|);
    * pair expansion is over groups that actually leak — output is ≤ 3
    * pair rows. */
  def x139(spark: SparkSession, dir: String): DataFrame = {
    val split =
      when((((col("doc_id") % 100000000L) * lit(2654435761L)) % 1000) < 800, "train")
        .when((((col("doc_id") % 100000000L) * lit(2654435761L)) % 1000) < 900, "val")
        .otherwise("test")
    // same planted-twin guard as the recall matrices: base ids must sit
    // below the twin offset or planted/real ids could collide
    val base = RecallMatrices.guardIds(
      Tables.documents(spark, dir), "doc_id", 1000003L)
    val planted = base.unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000003L))
    val groups = planted
      .select(lower(col("text")).as("norm"), split.as("split"))
      .groupBy("norm")
      .agg(sort_array(collect_set(col("split"))).as("splits"),
           count(lit(1)).as("n_members"))
      .filter(size(col("splits")) > 1)
    groups
      .select(explode(expr(
        """flatten(transform(splits, (a, i) ->
          |  transform(slice(splits, i + 2, size(splits)), b -> struct(a, b))))"""
            .stripMargin)).as("p"),
        col("n_members"))
      .groupBy(col("p.a").as("split_a"), col("p.b").as("split_b"))
      .agg(count(lit(1)).as("n_leaking_groups"),
           sum(col("n_members")).as("n_leaking_docs"))
      .orderBy("split_a", "split_b")
  }

  /** x21: benchmark decontamination — drop every document whose normalized
    * text appears in the held-out benchmark set, then count survivors per
    * lang. The benchmark here is a deterministic slice of the corpus
    * (doc_id % 97 = 0) so the oracle can rebuild it; in production it is a
    * small external table. The anti-join keys on lower(text) — Spark plans a
    * LeftAnti that broadcasts the benchmark while it is small and falls back
    * to a shuffle on the normalized key when it is not (no hint: a benchmark
    * list is usually tiny but not provably bounded). */
  def x21(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(lower(col("text")).as("bnorm")).distinct()
    docs.withColumn("norm", lower(col("text")))
      .join(bench, col("norm") === col("bnorm"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_clean"), sum(col("n_chars")).as("n_chars"))
      .orderBy("lang")
  }

  /** x31: N-GRAM decontamination — the industry-standard stronger form of
    * x21: a document is contaminated if it shares ANY 5-token rolling-hash
    * fingerprint (x13's machinery) with the held-out benchmark slice, not
    * only if its whole text matches. Catches partial copies, quoted answers,
    * and templated paraphrases that exact-text matching misses.
    *
    * 100 TB: the fingerprint join is keyed on fp (bucketed, never all-pairs);
    * the benchmark fingerprint set is small and stats-driven broadcastable;
    * the final anti-join keys on doc_id. Documents shorter than one window
    * (< 5 tokens) have no fingerprints and pass through — by construction
    * the n-gram rule has nothing to say about them. */
  def x31(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fp = LlmExt2.docFingerprints(docs).distinct()
    val benchFps = fp.filter(col("doc_id") % 97 === 0).select("fp").distinct()
    val contaminated = fp.join(benchFps, "fp").select("doc_id").distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_clean"), sum(col("n_chars")).as("n_chars"))
      .orderBy("lang")
  }

  /** x30: corpus MIXING — per-language sampling rates applied by
    * deterministic hash threshold, the step that turns raw corpora into a
    * training mix (downsample the majority language, keep the rest). Same
    * multiplicative-hash machinery as x20 but a DIFFERENT odd constant, so
    * mix membership is independent of split assignment (a correlated
    * constant would make "test" systematically over-sample downweighted
    * languages). No RNG, no sampling seed: the same row is kept on 1
    * partition or 10 000 — and the operand is bounded (< 2.3e17) so the
    * product can never overflow int64 on either engine. The only shuffle is
    * the 5-row aggregate. */
  def x30(spark: SparkSession, dir: String): DataFrame = {
    val bucket = ((col("doc_id") % 100000000L) * lit(2246822519L)) % 1000
    // per-language keep rates ×1000: en is downsampled hardest (majority)
    val thresh = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 800)
      .when(col("lang") === "fr", 700)
      .when(col("lang") === "zh", 900)
      .otherwise(1000)
    val kept = col("bucket") < col("thresh")
    Tables.documents(spark, dir)
      .withColumn("bucket", bucket).withColumn("thresh", thresh)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
           sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
           sum(when(kept, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("lang")
  }

  /** x32: SEQUENCE PACKING — concatenate documents per shard in doc_id order
    * and chop the stream into fixed 16384-char context windows (the GPT-style
    * pack-then-chop step that turns a cleaned corpus into training sequences;
    * documents may straddle a window boundary by design). A doc's start
    * offset is the running sum of prior doc lengths, so window assignment is
    * `start_off div 16384` — pure window-function algebra, no RNG, no
    * sequential driver loop.
    *
    * 100 TB: packing is embarrassingly parallel ACROSS shards — the window
    * function partitions by shard, so each shard's running sum is an
    * independent sorted stream; shard count (8 here, doc_id mod) scales with
    * the cluster and nothing is global. The output aggregate is one narrow
    * (shard, window) groupBy that reuses the shard partitioning. */
  def x32(spark: SparkSession, dir: String): DataFrame = {
    val prior = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"), col("n_chars"))
      .withColumn("start_off", coalesce(sum(col("n_chars")).over(prior), lit(0L)))
      .groupBy(col("shard"), expr("start_off div 16384").as("window_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("shard", "window_id")

  }

  /** x213: PACKING-EFFICIENCY AUDIT — the KPI report on x32's
    * pack-then-chop policy, per shard: window count against the
    * ceil(total/C) LOWER BOUND (pack-then-chop is window-count-optimal by
    * construction — the audit measures both sides of that theorem and the
    * spec demands equality), the BOUNDARY-STRADDLE rate (documents split
    * across two training sequences — the attention-contamination /
    * truncation cost the chop policy pays for its zero padding), and the
    * tail padding (the only padded chars: the final window's remainder).
    * These are the numbers a training-data team weighs when choosing chop
    * vs doc-aligned packing.
    *
    * 100 TB: same shard-parallel window algebra as x32 (per-shard running
    * sums, nothing global), collapsing to one 8-row shard aggregate. All
    * quantities are exact integers; the one division (straddle share) is
    * a single double op over exact BIGINTs, rounded 6 dp. */
  def x213(spark: SparkSession, dir: String): DataFrame = {
    val C = 16384L
    val prior = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"), col("n_chars"))
      .withColumn("start_off", coalesce(sum(col("n_chars")).over(prior), lit(0L)))
      // zero-char docs occupy no window and cannot straddle — guard them
      .withColumn("last_win",
        when(col("n_chars") > 0, expr(s"(start_off + n_chars - 1) div $C")))
      .withColumn("straddle",
        when(col("n_chars") > 0 &&
             expr(s"start_off div $C") =!= col("last_win"), 1L).otherwise(0L))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           (max(col("last_win")) + lit(1L)).as("n_windows"),
           sum(col("straddle")).as("straddled_docs"))
      .select(col("shard"), col("n_docs"), col("total_chars"),
              col("n_windows"),
              expr(s"(total_chars + ${C - 1}) div $C").as("lb_windows"),
              col("straddled_docs"),
              round(col("straddled_docs") * lit(1.0) / col("n_docs"), 6)
                .as("straddle_share"),
              (col("n_windows") * lit(C) - col("total_chars")).as("tail_pad"))
      .orderBy("shard")
  }

  /** x33: dedup SURVIVOR SELECTION — the step after x24's cluster formation:
    * per near-dup component keep one canonical document (longest text, ties
    * to the smallest doc_id) and report the cluster's mass. Together
    * x13 → x24 → x33 is the complete fingerprint-dedup pipeline: detect
    * shared shingles, form components, elect survivors.
    *
    * 100 TB: one key-partitioned join (components ⋈ doc lengths on doc_id),
    * one window rank partitioned by component, one groupBy(comp) — all
    * shuffles on keys whose cardinality shrinks with dedup, never all-pairs.
    * Oracle: x24's recursive-CTE closure extended with the same ranking. */
  def x33(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val byPref = Window.partitionBy("comp")
      .orderBy(col("n_chars").desc, col("doc_id"))
    x24(spark, dir).join(docs, "doc_id")
      .withColumn("rn", row_number().over(byPref))
      .groupBy("comp")
      .agg(count(lit(1)).as("n_members"),
           sum(col("n_chars")).as("total_chars"),
           max(when(col("rn") === 1, col("doc_id"))).as("survivor_id"),
           max(when(col("rn") === 1, col("n_chars"))).as("survivor_chars"))
      .orderBy("comp")
  }

  /** x22: skew-salted fact⋈dim join ([[graft.engine.Skew.saltedJoin]]) —
    * events joined to per-user totals on user_id, spread 8 ways so a hot
    * user cannot serialize one reducer. The salt is pmod(xxhash64(event_id))
    * — deterministic per row, engine-internal, never in the output — and the
    * aggregate result is row-identical to the unsalted join, so the oracle
    * is the plain SQL join. */
  def x22(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val userTotals = ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
    graft.engine.Skew
      .saltedJoin(ev, userTotals, "user_id", xxhash64(col("event_id")), 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("user_events")).as("sum_user_events"))
      .orderBy("event_type")
  }

  /** x23: q11's as-of semantics through the NATIVE operator
    * ([[graft.plans.AsOf]]) instead of the equi-join + max composition —
    * one merge pass over (key, ts)-sorted sides, no pair materialization.
    * Registered against q11's oracle SQL: identical results, different plan. */
  def x23(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    graft.plans.AsOf.joinAsOf(p, c, "user_id", "ts", "ts", "prior_click_ts")
      .filter(col("prior_click_ts").isNotNull)
      .select(col("event_id"), unix_micros(col("prior_click_ts")).as("prior_click_us"))
      .orderBy("event_id")
  }

  /** Star edges over fingerprint buckets: every doc sharing fingerprint `fp`
    * links to the bucket's MINIMUM doc_id (both directions, so min-label
    * propagation flows either way). A star has exactly the same connected
    * components as the clique the round-1 all-pairs self-join built, but
    * O(bucket) edges instead of O(bucket²) — one ubiquitous boilerplate
    * 5-gram shared by k docs costs 2(k−1) edge rows, not k². The groupBy and
    * the join share the `fp` key, so this is one exchange reused.
    * Linearity is property-tested in LlmExtSpec (planted boilerplate). */
  private[graft] def fingerprintStarEdges(fp: DataFrame): DataFrame = {
    // rep per bucket via a window over ONE fp-partitioned shuffle — the
    // groupBy+self-join formulation evaluated the (expensive) fingerprint
    // subtree twice; this reads it once and never joins
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val star = fp.withColumn("rep", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("doc_id").as("u"), col("rep").as("v"))
    star.unionByName(star.select(col("v").as("u"), col("u").as("v"))).distinct()
  }

  /** x24: dedup CLUSTER formation — pairs are not enough; deduplication needs
    * whole near-dup groups with one canonical representative. Documents are
    * vertices, sharing any x13 rolling-hash fingerprint is an edge (star
    * edges per bucket — see [[fingerprintStarEdges]]; identical components to
    * the all-pairs clique at O(bucket) cost), and the component label is the
    * minimum doc_id — computed by min-label propagation run to fixpoint, each
    * round one join + one min-aggregate, both key-partitioned (no driver
    * data, convergence checked by a 1-row sum that can only decrease).
    * Rounds grow with component diameter; pointer doubling below keeps the
    * fixpoint at O(log diameter) rounds.
    * Oracle: DuckDB recursive-CTE transitive closure, min per node —
    * unchanged by the star rewrite because components are identical. */
  def x24(spark: SparkSession, dir: String): DataFrame = x24Impl(spark, dir)

  /** x100: THE CURATION DAG AS ONE ORACLE-CHECKED QUERY — the capstone:
    * x47's integer quality gate → exact dedup on the q44 key (min-id
    * survivor among GATED docs) → x86's portable near-dup pair removal
    * (drop the higher id of every candidate pair) → x21's benchmark
    * decontamination (doc_id % 97 slice) → per-source survivor report.
    * Every stage reuses a registered operator's exact rule, so the DuckDB
    * oracle is an assembly of already-proven CTE fragments and the WHOLE
    * pipeline's composition — stage order, key choices, survivor
    * tie-breaks — is hash-verified end to end (CorpusPipelineDemo is the
    * narrative twin; this is the gate).
    *
    * 100 TB: the gate is a map-only scan (native token_stats); dedup is
    * one text-keyed shuffle; near-dup losers come from the banded LSH path
    * (never all-pairs); decontamination keys are the (tiny) benchmark
    * slice, broadcast. No stage widens data — the DAG only shrinks. */
  def x100(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    // 1. x47's gate: length band + repetition cap + stopword witness
    val gated = docs.filter(trim(col("text")) =!= "")
      .withColumn("ts", call_function("token_stats", col("text")))
      .filter(col("n_chars").between(100, 500) &&
              col("ts.max_cnt") * 5 < col("ts.n_tokens") &&
              (array_contains(toks, "the") || array_contains(toks, "a")))
      .select(col("doc_id"), col("source"), col("n_chars"),
              lower(col("text")).as("norm"))
    // 2. q44's key: min doc_id survives per normalized text
    val deduped = gated
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm").orderBy("doc_id")))
      .filter(col("rn") === 1)
    // 3. x86's near-dup pairs (raw corpus): the higher id of each pair loses
    val losers = LlmExt2.x86(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    // 4. x21's rule: drop anything text-identical to the benchmark slice
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(lower(col("text")).as("norm")).distinct()
    deduped
      .join(losers, Seq("doc_id"), "left_anti")
      .join(broadcast(bench), Seq("norm"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy("source")
  }

  private def x24Impl(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the distinct() is load-bearing for the window that follows: it shrinks
    // repeated (doc, fp) pairs BEFORE the fp-partitioned window shuffle
    // (measured ~15% faster than letting the star builder's edge-dedup
    // absorb the duplicates)
    val fp = LlmExt2.docFingerprints(docs).distinct()
    // persisted pre-partitioned on v — every round's propagation join reads
    // edges by v, so the exchange happens once here, not once per round
    val edges = fingerprintStarEdges(fp).repartition(col("v")).persist()
    // Each round MUST cut lineage (eager localCheckpoint): a persisted-only
    // loop leaves the logical plan nesting one level per round, and Catalyst
    // re-optimizes the whole ever-growing tree — round 8 took 60s on 3k
    // edges before this; with checkpointing every round is ~0.5s flat.
    // seed labels with the star-neighborhood min (self ∪ neighbors) — this
    // IS round 1 of plain min-propagation, computed as one narrow agg
    // instead of a full loop round (join + union-agg + doubling join +
    // checkpoint); the loop below then starts from distance-1 labels.
    // The LOOP runs over edge-touched nodes ONLY: an isolated document's
    // label is itself forever, so iterating over it is pure waste — and at
    // corpus scale near-dup members are a small fraction of all documents,
    // so the fixpoint's working set shrinks from |docs| to |dup candidates|.
    // Isolated docs are attached by one left join after convergence.
    var labels = edges.groupBy("u").agg(min(col("v")).as("nb"))
      .select(col("u").as("node"),
              least(col("u"), col("nb")).as("label"))
      .materialized
    // sum() of an empty input is SQL NULL — treat as 0 (empty corpus: the
    // loop converges immediately and returns an empty component table)
    def labelSum(d: DataFrame): Long = {
      val row = d.agg(sum(col("label"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      // neighbor min-propagation …
      val prop = edges.join(labels, col("v") === col("node"))
        .select(col("u").as("node"), col("label"))
      // nm feeds BOTH sides of the doubling join below — checkpoint it
      // eagerly or the union+agg subtree runs twice per round (measured
      // ~15-25% off x24/x33 at sf0.1; a lazy persist would also work but
      // checkpointing additionally keeps the doubling join's lineage flat)
      val nm = labels.unionByName(prop)
        .groupBy("node").agg(min(col("label")).as("label"))
        .materialized
      // … then pointer doubling (adopt the label's own label), which squares
      // the propagation distance per round: O(log diameter) rounds total.
      // (A leapfrog variant running two of these passes per checkpoint was
      // measured 2× SLOWER at sf0.1 — the joins, not the checkpoint+sum
      // actions, dominate a round; don't re-try it.)
      val jumped = nm.as("x")
        .join(nm.select(col("node").as("jn"), col("label").as("jl")).as("y"),
              col("x.label") === col("jn"), "left")
        .select(col("x.node").as("node"),
                least(col("x.label"), coalesce(col("jl"), col("x.label"))).as("label"))
      val next = jumped.materialized
      val s = labelSum(next)
      // superseded rounds' checkpoint blocks are reclaimed by the
      // ContextCleaner once the old Dataset is unreferenced (localCheckpoint
      // bypasses the cache manager, so Dataset.unpersist would be a no-op);
      // each round's table is |docs| rows, so the transient footprint is
      // bounded by rounds × |docs| ids until GC runs
      labels = next
      converged = s == prevSum // labels only ever decrease
      prevSum = s
      rounds += 1
    }
    // attach the (untouched) isolated documents: comp = own doc_id
    val out = docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
              coalesce(col("label"), col("doc_id")).as("comp"))
      .orderBy("doc_id")
      .materialized
    edges.unpersist()
    out
  }
}
