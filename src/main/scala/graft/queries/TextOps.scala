package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** Text-cleaning and vocabulary stages of the training-data pipeline:
  * boilerplate/stopword stripping (x34), repetition signal (x35), and
  * tokenizer-vocabulary construction (x36). All three are token-level
  * arithmetic — portable to DuckDB term-for-term, so every one is
  * oracle-checked (not just property-tested).
  */
object TextOps {

  /** Non-empty lowercase whitespace tokens of the `text` column. */
  private def toks =
    filter(split(lower(col("text")), " "), t => t =!= "")

  /** x34: TEXT CLEANING — strip filler tokens ("a", "the" here; a config
    * list in production) and report per document how much was removed and
    * the cleaned length. Token-level filtering (split → filter → rejoin)
    * rather than regex replacement: the token algebra is exact and
    * engine-portable, where regex word-boundary semantics differ subtly
    * between Java regex and RE2.
    *
    * 100 TB: a pure per-row projection — no shuffle at all except the
    * output ordering; cleaning pipelines stream map-only over the corpus. */
  def x34(spark: SparkSession, dir: String): DataFrame = {
    val all = filter(split(col("text"), " "), t => t =!= "")
    val kept = filter(split(col("text"), " "),
      t => t =!= "" && t =!= "a" && t =!= "the")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
              (size(all) - size(kept)).cast(LongType).as("n_removed"),
              length(array_join(kept, " ")).cast(LongType).as("clean_chars"))
      .orderBy("doc_id")
  }

  /** x35: REPETITION SIGNAL — the Gopher-style "most frequent token
    * fraction" quality heuristic: a document whose single most common token
    * dominates is boilerplate or generation loop output. Complements x11's
    * lexical-diversity score (distinct/total) with the max-frequency view.
    *
    * 100 TB: SHUFFLE-FREE — the per-doc token distribution is a pure
    * per-row function, fused into the native `token_stats` expression
    * (expr/TextExpressions.scala); the earlier explode → groupBy(doc,tok) →
    * groupBy(doc) form shuffled the whole token stream twice for the same
    * three numbers. The n_tokens>0 filter reproduces explode semantics
    * (token-less docs emit no rows). */
  def x35(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // trim-guard ≡ n_tokens>0 (space-split drops only space runs), placed
      // BEFORE token_stats so pushdown cannot duplicate the fused pass into
      // the filter (it did: see the pre-fix x44 plan note in docs/PLANS.md)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), call_function("token_stats", col("text")).as("ts"))
      .select(col("doc_id"),
              col("ts.n_tokens").as("n_tokens"),
              col("ts.max_cnt").as("max_tok_cnt"),
              round(col("ts.max_cnt") * lit(1.0) / col("ts.n_tokens"), 6)
                .as("rep_frac"))
      .orderBy("doc_id")

  /** x36: VOCABULARY CONSTRUCTION — count every token across the corpus,
    * keep those above a minimum frequency (5), and assign dense token IDs by
    * descending count (ties lexicographic) — the id-assignment step of
    * building a tokenizer vocab from a corpus.
    *
    * 100 TB: the heavy stage (token counting) is one distributed groupBy
    * with map-side partials over ~10^12 tokens; the global row_number window
    * runs AFTER the min-count threshold, on the surviving vocabulary — a set
    * bounded by the language (≤ a few million rows), not by corpus size, so
    * the single-partition rank is deliberate and safe. */
  /** x56: TOKENIZER APPLY — encode each document's first 20 tokens through
    * x36's vocabulary (token_id, OOV → 0), emitted as one CSV string under
    * the no-array output protocol. Build (x36) → apply (x56) is the full
    * tokenizer round trip a training pipeline runs over the corpus.
    *
    * 100 TB: the vocabulary is bounded by the language (≤ millions of rows),
    * so the encode join is a BROADCAST join against the full corpus scan —
    * per-doc reassembly is one groupBy(doc) whose payload is capped at 20
    * ids/doc. The ordered rebuild sorts structs per group (array_sort on
    * (pos, id)), never a global sort. */
  def x56(spark: SparkSession, dir: String): DataFrame = {
    val vocab = x36(spark, dir).select(col("tok"), col("token_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(slice(toks, 1, 20)))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("p"),
              coalesce(col("token_id"), lit(0L)).as("id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_enc"),
           concat_ws(",",
             transform(array_sort(collect_list(struct(col("p"), col("id")))),
                       s => s.getField("id").cast("string"))).as("ids"))
      .orderBy("doc_id")
  }

  def x36(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
    // token ids via the distributed rank (graft.engine.Ranks): a frontier
    // vocabulary is 10⁷–10⁸ entries, too many for the single-partition
    // row_number window this used through round 5
    graft.engine.Ranks
      .globalRowNumber(vocab, Seq(col("cnt").desc, col("tok")), "token_id")
      .select(col("token_id"), col("tok"), col("cnt"))
      .orderBy("token_id")
  }

  /** Conservative PII patterns shared with the oracle: restricted to the
    * regex subset where Java and RE2 (DuckDB) agree — ASCII classes,
    * bounded repetition, `\b` word boundaries; no lookaround, no unicode
    * classes (x34's Scaladoc records why that subset matters). */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** x116: PII REDACTION — the scrub stage every LLM training pipeline runs
    * before anything else touches the text: detect and mask emails and
    * IPv4 addresses, report per source how many documents carried PII, how
    * many instances of each type, and how many characters redaction
    * removed. The synthetic corpus is PII-free, so (x110's planting trick)
    * a deterministic slice (doc_id % 13) gets a synthetic contact line
    * appended in-query — both engines plant the identical string, so every
    * count is oracle-pinned, including that the OTHER 12/13 of the corpus
    * yields zero matches (no false positives on clean text).
    *
    * 100 TB: detection and masking are codegen'd per-row regex projections
    * — a map-only scan; the only shuffle is the |sources|-row aggregate
    * with map-side partials. Redaction replaces with fixed tags rather
    * than deleting, preserving token positions for downstream chunkers. */
  /** x312: SECRET / CREDENTIAL TOKEN SCAN — the high-entropy-string
    * scrubbing pass every code/web corpus runs before training (the
    * detect-secrets / Copilot-era "no API keys in the training set"
    * gate), as a per-source audit with PLANTED ground truth (the x110
    * device — the synthetic corpus contains no natural secrets, so the
    * key plants its own): every doc with doc_id ≡ 0 (mod 53) gains one
    * deterministic credential-shaped token `sk` + the zero-padded 14
    * digits of (doc_id·2654435761 mod 10¹⁴) — 16 chars, letters+digits
    * by construction, both engines replay it exactly. Detector: a token
    * is secret-like when length ≥ 16 AND it contains a digit AND a
    * letter — exact integer/regex tests, no float entropy (the
    * distinct-char diversity that entropy measures is EMITTED as a
    * stat, not used as a criterion, keeping the flag bit-stable). Every
    * planted token matches the rule by construction, so per source
    * caught_planted = n_planted is a THEOREM the oracle states; natural
    * corpus tokens (≤ ~10 chars) never trigger it here, and on a real
    * corpus the same audit reports the natural hit mass.
    *
    * 100 TB: map-only until the bounded per-source rollup — the token
    * explode is the only fan-out, the detector is a per-token predicate,
    * and no shuffle touches the token grain (partial+final agg on
    * (doc, source) then source). */
  def x312(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.fanOut(Tables.documents(spark, dir)
        .select("doc_id", "source", "text"))
      .withColumn("is_planted", (col("doc_id") % 53 === 0).cast(LongType))
      .withColumn("t",
        when(col("is_planted") === 1L,
          concat(col("text"), lit(" sk"),
                 lpad((col("doc_id") * 2654435761L % 100000000000000L)
                        .cast("string"), 14, "0")))
          .otherwise(col("text")))
    val toks = planted
      .select(col("doc_id"), col("source"), col("is_planted"),
              explode(filter(split(col("t"), " "), t => t =!= "")).as("tok"))
      .withColumn("hit",
        (length(col("tok")) >= 16 &&
         col("tok").rlike("[0-9]") && col("tok").rlike("[A-Za-z]"))
          .cast(LongType))
    val perDoc = toks.groupBy("doc_id", "source", "is_planted")
      .agg(sum(col("hit")).as("hits"),
           sum(when(col("hit") === 1L,
                    size(array_distinct(split(col("tok"), ""))).cast(LongType))
             .otherwise(0L)).as("hit_distinct_chars"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged_docs"),
           sum(col("hits")).as("n_flagged_tokens"),
           sum(col("is_planted")).as("n_planted"),
           sum(when(col("is_planted") === 1L && col("hits") > 0, 1L)
             .otherwise(0L)).as("caught_planted"),
           sum(col("hit_distinct_chars")).as("sum_hit_distinct_chars"))
      .withColumn("all_planted_caught",
        col("caught_planted") === col("n_planted"))
      .select("source", "n_docs", "n_flagged_docs", "n_flagged_tokens",
              "n_planted", "caught_planted", "sum_hit_distinct_chars",
              "all_planted_caught")
      .orderBy("source")
  }

  def x116(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir).withColumn("t",
      when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" contact u"),
               col("doc_id").cast("string"), lit("@example.com from 10.2."),
               (col("doc_id") % 256).cast("string"), lit("."),
               (col("doc_id") % 100).cast("string")))
        .otherwise(col("text")))
    val red = planted
      .withColumn("n_emails",
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast(LongType))
      .withColumn("n_ips",
        size(regexp_extract_all(col("t"), lit(Ipv4Re), lit(0))).cast(LongType))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"))
    red.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_ips") > 0, 1L).otherwise(0L)).as("n_pii_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_ips")).as("n_ips"),
        sum((length(col("t")) - length(col("clean"))).cast(LongType)).as("chars_removed"))
      .orderBy("source")
  }
}
