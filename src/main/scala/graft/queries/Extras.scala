package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables
import graft.engine.chi.ChiCSClassifier

/** Extended operators x01/x05/x06 (SURVEY.md §2.5). All oracle-checked:
  * x01 in theorem form (exact prefix-filtered pair set + an engine-computed
  * MinHash contract flag — the bucketing itself is xxhash64-salted, not
  * SQL-portable), x05 against a direct statement of its deterministic
  * map-rebuild output, x06 against q42's oracle (it must reproduce the
  * estimator pipeline exactly).
  */
object Extras {

  /** x01: near-duplicate document pairs via MinHash LSH over token shingles —
    * the sub-quadratic scale path for q44-style dedup: shingle → min-hash per
    * seed → band bucket-join → exact Jaccard confirm (shared engine with x08,
    * 3 bands here; LlmExt2.jaccardPairs is the user-facing raw path).
    * Deterministic (xxhash64, fixed seeds).
    *
    * Registered entry in THEOREM FORM (the x15/x18/x108 device): the emitted
    * rows are the EXACT Jaccard-≥-4/5 pairs as DISTANCES in integer
    * micro-units, from LlmExt2.exactJaccardPairs (prefix-filtered exhaustive
    * join; the oracle recomputes it via a plain inverted-index all-pairs
    * join). The engine-computed `lsh_ok` flag states the 3-band MinHash
    * chain's two contracts — SOUNDNESS (every banded+confirmed pair is in
    * the exact set; the confirm shares the exact integer threshold) and
    * EXACT-DUP COMPLETENESS (identical shingle sets give identical
    * signatures, so every distance-0 pair is found) — both theorems of the
    * construction; the oracle states TRUE. The probabilistic recall regime
    * stays in LlmExtSpec + the x110 recall matrix.
    *
    * 100 TB: the LSH leg is O(docs × shingles) for signatures plus the
    * bucket join; the exact leg probes only each doc's ~|A|/5+1 rarest
    * shingles against the inverted index — never the O(docs²) cross join on
    * either leg. (MLlib's MinHashLSH.approxSimilarityJoin computes the LSH
    * leg's result; the hand-rolled form halves the runtime and keeps the
    * exact-Jaccard confirm.) */
  def x01(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // one shingle materialization serves the exact leg and the LSH leg
    // (the x08 sharing device)
    val shSets = LlmExt2.shingleSets(docs).materialized
    // materialize the tiny confirmed-pair OUTPUTS once: `exact` is consumed
    // 3× and `lsh3` 2× below, and Spark has no cross-subtree CSE, so the
    // lazy form re-ran the whole prefix-filter / banded chains per consumer
    // (the x08 r16 device). The signature frame feeds both sides of the
    // band self-join — materialize it too so the 6-minhash aggregate runs
    // once. pruneConfirm: the exact-Jaccard re-attach touches candidate
    // docs only (guide §2.3/§3.2).
    // the exact and LSH chains are independent given shSets — materialize
    // them concurrently (guide §2.6)
    val (exact, lsh3) = graft.engine.Par.two(
      () => LlmExt2.exactJaccardPairsFrom(shSets, pruneConfirm = true)
        .materialized,
      () => {
        val sigs = LlmExt2.minhashSigs(shSets, 3).materialized
        LlmExt2.bandedPairs(shSets, sigs, 3, pruneConfirm = true)
          .select("a", "b").materialized
      })
    val unsound = lsh3.join(exact.select("a", "b"), Seq("a", "b"), "left_anti")
      .agg(count(lit(1)).as("n_unsound"))
    val missedDup = exact.filter(col("is_exact_dup")).select("a", "b")
      .join(lsh3, Seq("a", "b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    exact.crossJoin(broadcast(unsound)).crossJoin(broadcast(missedDup))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
              (lit(1000000L) - col("jacc_micro")).as("jacc_dist_micro"),
              (col("n_unsound") === 0 && col("n_missed") === 0).as("lsh_ok"))
      .orderBy("doc_a", "doc_b")
  }

  /** x05: MapType function family — str_to_map/map_keys/element_at. Map key
    * order is engine-dependent, so output only order-insensitive derivations
    * (sorted keys, single lookups). */
  def x05(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
              // props is {"k": <int>}; rebuild as "k=<int>,type=<event_type>"
              concat(lit("k="), get_json_object(col("props"), "$.k"),
                     lit(",type="), col("event_type")).as("kv"))
      .select(col("event_id"), str_to_map(col("kv"), lit(","), lit("=")).as("m"))
      .select(col("event_id"),
              // sorted keys joined to ONE string: array-typed output columns
              // crash the driver comparator (output-type protocol, Relational1)
              concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
              // BIGINT, not int32: the no-int32 output rule (ADVICE r2) —
              // both engines emit int64 so the driver compare is load-path-proof
              element_at(col("m"), "k").cast(LongType).as("k_val"),
              element_at(col("m"), "type").as("type_val"))
      .orderBy("event_id")

  /** x06: the full MLlib pipeline twin of q38–q43 — Estimator.fit →
    * Model.transform → confusion matrix; must equal q42 exactly (same oracle
    * SQL is registered for it). */
  def x06(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.lineitem(spark, dir).select(
      col("l_quantity").as("x1"), col("l_discount").as("x2"),
      when(col("l_extendedprice") > 95000, 1).otherwise(0).as("label"))
    val model = new ChiCSClassifier()
      .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
      .setFeatureRanges(Array(1.0, 50.0, 0.0, 0.1))
      .fit(df)
    model.transform(df)
      .groupBy(col("label").cast(LongType).as("actual"),
               col("prediction").cast(LongType).as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  /** x106: TYPED JSON PARSE — `from_json` with an explicit schema over
    * `events.props`, then typed-struct aggregation. Complements q32
    * (per-field string `get_json_object`): here the row is parsed ONCE into
    * a struct and every downstream field access is a free struct read —
    * the right shape whenever more than one field is consumed, since N
    * `get_json_object` taps re-parse the string N times. `parsed` counts
    * non-null parse results, making the malformed-row policy (NULL, not
    * error) part of the checked contract.
    *
    * 100 TB: JsonToStructs is a map-only codegen'd expression; Catalyst
    * prunes the parse schema to the fields actually consumed
    * (OptimizeJsonExprs), so a wide props schema costs only the used
    * subset. One aggregate after — |event_type| groups, map-side combined. */
  def x106(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
              from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).as("p"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
           count(col("p.k")).as("parsed"),
           sum(col("p.k")).as("sum_k"),
           min(col("p.k")).cast(LongType).as("min_k"),
           max(col("p.k")).cast(LongType).as("max_k"))
      .orderBy("event_type")

  /** x138: VARIANT EXTRACTION — x106's JSON stats through Spark 4's native
    * VARIANT type: `parse_json` shreds the document once into the binary
    * variant encoding and `variant_get` navigates it with a typed path —
    * the schema-on-read path for semi-structured columns at scale, where
    * `from_json` re-parses text per access and demands a schema up front.
    * BOTH extractions use `try_variant_get`, matching the oracle's
    * `TRY_CAST` on both paths: a present-but-non-numeric `k` yields NULL
    * (the x106 NULL-on-malformed policy) instead of throwing, and the
    * ABSENT path pins the same NULL-not-error policy observably
    * (`n_no_path` = every row, stated in the output).
    *
    * 100 TB: one map-side parse per row feeding a partial+final aggregate;
    * variant shredding is what lets the scan skip untouched fields when
    * the column is stored as VARIANT in parquet. */
  def x138(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
              expr("try_variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
              expr("try_variant_get(parse_json(props), '$.absent', 'bigint')")
                .as("miss"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
           count(col("k")).as("parsed"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"),
           sum(when(col("miss").isNull, 1L).otherwise(0L)).as("n_no_path"))
      .orderBy("event_type")
}
