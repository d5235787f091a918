package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Thin registry only; engine code lives in graft.queries / graft.engine.
  * Every key in [[queries]] has a matching DuckDB statement in [[oracleSql]]
  * unless the operator is not SQL-expressible (SURVEY.md §2.5).
  */
object SparkEntry {
  /** Flagship query (TPC-H Q5 five-way join) on /root/testdata/sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational1.q10(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.2/§2.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project"         -> (Relational1.q01 _),
    "q02_filter_pushdown"      -> (Relational1.q02 _),
    "q03_filter_complex"       -> (Relational1.q03 _),
    "q04_join_inner"           -> (Relational1.q04 _),
    "q05_join_broadcast"       -> (Relational1.q05 _),
    "q06_join_left_histogram"  -> (Relational1.q06 _),
    "q07_join_semi"            -> (Relational1.q07 _),
    "q08_join_anti"            -> (Relational1.q08 _),
    "q09_join_range_pairs"     -> (Relational1.q09 _),
    "q10_join_multiway_tpch_q5" -> (Relational1.q10 _),
    "q11_join_asof_prior"      -> (Relational1.q11 _),
    "q12_agg_tpch_q1"          -> (Relational1.q12 _),
    "q13_agg_count_distinct"   -> (Relational1.q13 _),
    "q14_agg_rollup"           -> (Relational1.q14 _),
    "q15_agg_cube"             -> (Relational1.q15 _),
    "q16_agg_grouping_sets"    -> (Relational1.q16 _),
    "q17_agg_having"           -> (Relational1.q17 _),
    "q18_agg_stats"            -> (Relational1.q18 _),
    "q19_window_rank"          -> (Relational2.q19 _),
    "q20_window_topk_group"    -> (Relational2.q20 _),
    "q21_window_lag_delta"     -> (Relational2.q21 _),
    "q22_window_moving_rows"   -> (Relational2.q22 _),
    "q23_window_range_interval" -> (Relational2.q23 _),
    "q24_topk_global"          -> (Relational2.q24 _),
    "q25_set_union_all"        -> (Relational2.q25 _),
    "q26_set_intersect"        -> (Relational2.q26 _),
    "q27_set_except"           -> (Relational2.q27 _),
    "q28_string_funcs"         -> (Relational2.q28 _),
    "q29_date_funcs"           -> (Relational2.q29 _),
    "q30_math_funcs"           -> (Relational2.q30 _),
    "q31_conditional_funcs"    -> (Relational2.q31 _),
    "q32_json_extract"         -> (Relational2.q32 _),
    "q33_array_funcs"          -> (Relational2.q33 _),
    "q34_explode_posexplode"   -> (Relational2.q34 _),
    "q35_window_tumbling"      -> (Temporal.q35 _),
    "q36_window_sliding"       -> (Temporal.q36 _),
    "q37_sessionize_gap"       -> (Temporal.q37 _),
    "q38_ml_class_costs"       -> (ChiMl.q38 _),
    "q39_ml_fuzzy_membership"  -> (ChiMl.q39 _),
    "q40_ml_chi_rulegen"       -> (ChiMl.q40 _),
    "q41_ml_chi_rule_weights"  -> (ChiMl.q41 _),
    "q42_ml_chi_classify"      -> (ChiMl.q42 _),
    "q43_ml_metrics"           -> (ChiMl.q43 _),
    "q44_dedup_exact"          -> (LlmExt.q44 _),
    "q45_similarity_cosine_topk" -> (LlmExt.q45 _),
    // q46 is the ORACLE-EXACT kNN baseline (broadcasts all candidates —
    // deliberately not a 100 TB plan); x18_ann_ivf / x09_embedding_neardup_lsh
    // are its bucketed scale paths, recall-tested against it. docs/PLANS.md.
    "q46_knn_label_vote"       -> (LlmExt.q46 _),
    "q47_text_tokenize_topk"   -> (LlmExt.q47 _),
    "q48_text_tfidf"           -> (LlmExt.q48 _),
    "q49_text_lang_stats"      -> (LlmExt.q49 _),
    "x01_dedup_minhash_lsh"    -> (Extras.x01 _),
    "x02_stream_tumbling_watermark" -> (graft.streaming.StreamingOps.x02 _),
    "x03_stream_session_window" -> (graft.streaming.StreamingOps.x03 _),
    "x04_stream_late_data"     -> (graft.streaming.StreamingOps.x04 _),
    "x05_map_funcs"            -> (Extras.x05 _),
    "x06_chi_estimator_fit"    -> (Extras.x06 _),
    "x07_dedup_simhash"        -> (LlmExt2.x07 _),
    "x08_dedup_ngram_jaccard"  -> (LlmExt2.x08 _),
    "x09_embedding_neardup_lsh" -> (LlmExt2.x09 _),
    "x10_text_langid"          -> (LlmExt2.x10 _),
    "x11_text_quality"         -> (LlmExt2.x11 _),
    "x12_text_tokencount"      -> (LlmExt2.x12 _),
    "x13_text_fingerprint"     -> (LlmExt2.x13 _),
    "x14_multimodal_features"  -> (MultimodalOps.x14 _),
    "x15_approx_sketches"      -> (Reshape.x15 _),
    "x16_pivot_wide"           -> (Reshape.x16 _),
    "x17_unpivot_long"         -> (Reshape.x17 _),
    "x18_ann_ivf"              -> (AnnIvf.x18 _),
    "x19_stream_custom_state"  -> (graft.streaming.StreamingOps.x19 _),
    "x20_split_hash"           -> (Pipeline.x20 _),
    "x21_decontaminate"        -> (Pipeline.x21 _),
    "x22_skew_salted_join"     -> (Pipeline.x22 _),
    "x23_asof_join_native"     -> (Pipeline.x23 _),
    "x24_dedup_components"     -> (Pipeline.x24 _),
    "x25_stream_dedup"         -> (graft.streaming.StreamingOps.x25 _),
    "x26_multimodal_frames"    -> (MultimodalOps.x26 _),
    "x27_stream_static_join"   -> (graft.streaming.StreamingOps.x27 _),
    "x28_percentile_exact"     -> (Reshape.x28 _),
    "x29_stream_stream_join"   -> (graft.streaming.StreamingOps.x29 _),
    "x30_corpus_mix"           -> (Pipeline.x30 _),
    "x31_decontaminate_ngram"  -> (Pipeline.x31 _),
    "x32_sequence_pack"        -> (Pipeline.x32 _),
    "x33_dedup_canonical"      -> (Pipeline.x33 _),
    "x34_text_clean"           -> (TextOps.x34 _),
    "x35_text_repetition"      -> (TextOps.x35 _),
    "x36_vocab_build"          -> (TextOps.x36 _),
    "x37_analytic_ranks"       -> (Mining.x37 _),
    "x38_fuzzy_match_join"     -> (Mining.x38 _),
    "x39_event_transitions"    -> (Mining.x39 _),
    "x40_bpe_pair_counts"      -> (Mining.x40 _),
    "x41_class_rebalance"      -> (Mining.x41 _),
    "x42_feature_hash"         -> (Mining.x42 _),
    "x43_cooccurrence"         -> (Mining.x43 _),
    "x44_token_entropy"        -> (Curation.x44 _),
    "x45_embedding_quantize"   -> (Curation.x45 _),
    "x46_bigram_novelty"       -> (Curation.x46 _),
    "x47_quality_gate"         -> (Curation.x47 _),
    "x48_label_centroid"       -> (Curation.x48 _),
    "x49_source_cap"           -> (Curation.x49 _),
    "x50_length_histogram"     -> (Curation.x50 _),
    "x51_ml_chi_base_weights"  -> (ChiMl.x51 _),
    "x52_ml_chi_base_classify" -> (ChiMl.x52 _),
    "x53_funnel_ordered"       -> (Analytics.x53 _),
    "x54_cohort_retention"     -> (Analytics.x54 _),
    "x55_inverted_index"       -> (Analytics.x55 _),
    "x56_encode_tokens"        -> (TextOps.x56 _),
    "x57_doc_chunk"            -> (Wrangle.x57 _),
    "x58_upsert_latest"        -> (Wrangle.x58 _),
    "x59_bigram_pmi"           -> (Wrangle.x59 _),
    "x60_source_kl"            -> (Wrangle.x60 _),
    "x61_bloom_semi_join"      -> (Wrangle.x61 _),
    "x62_heavy_hitters"        -> (Wrangle.x62 _),
    "x63_stratified_sample"    -> (Wrangle.x63 _),
    "x64_integrity_audit"      -> (Wrangle.x64 _),
    "x65_scd2_intervals"       -> (Wrangle.x65 _),
    "x66_bigram_surprisal"     -> (Wrangle.x66 _),
    "x67_token_pagerank"       -> (Wrangle.x67 _),
    "x68_forward_fill"         -> (Wrangle.x68 _),
    "x69_date_spine"           -> (Wrangle.x69 _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.all
}
