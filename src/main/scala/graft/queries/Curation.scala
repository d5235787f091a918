package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.engine.Tables

/** Corpus-curation stages of the training-data pipeline beyond the cleaning
  * verbs in [[TextOps]]: information-content scoring (x44), embedding
  * compression (x45), cross-document novelty (x46), a composite quality gate
  * (x47), and per-class embedding geometry (x48). All five are oracle-checked
  * — the math is double/integer arithmetic portable to DuckDB term-for-term
  * under the repr protocol (SURVEY.md §7.4: BIGINT/DOUBLE-rounded outputs
  * only).
  */
object Curation {

  /** Non-empty lowercase whitespace tokens of the `text` column. */
  private def toks: Column =
    filter(split(lower(col("text")), " "), t => t =!= "")

  /** x44: TOKEN ENTROPY — per-document Shannon entropy of the token
    * distribution, H = ln(n) − Σ c·ln(c)/n. Low entropy flags repetitive /
    * templated documents (the information-theoretic sibling of x35's
    * max-frequency fraction); pretraining filters drop the low-H tail.
    *
    * 100 TB: SHUFFLE-FREE — H is a pure per-row function of the token
    * distribution; the native `token_stats` expression returns the
    * sufficient statistics (n, Σ c·ln c) in one fused pass, replacing the
    * double token-stream shuffle of the explode formulation. */
  def x44(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // trim-guard ≡ n_tokens>0 (space-split drops only space runs), placed
      // BEFORE token_stats so pushdown cannot duplicate the fused pass into
      // the filter (it did: see the pre-fix x44 plan note in docs/PLANS.md)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"), call_function("token_stats", col("text")).as("ts"))
      .select(col("doc_id"),
              col("ts.n_tokens").as("n_tokens"),
              round(log(col("ts.n_tokens")) -
                    col("ts.sum_clnc") / col("ts.n_tokens"), 6).as("entropy"))
      .orderBy("doc_id")

  /** x45: EMBEDDING QUANTIZATION — symmetric int8: scale = max|x|/127,
    * q_i = round(x_i/scale). Reports the reconstruction error and the exact
    * integer checksum of the codes. Storage/ANN pipelines quantize before
    * indexing; the checksum is the determinism witness (codes are integers —
    * bit-exact across engines), max_abs_err the quality metric.
    *
    * 100 TB: pure per-row array arithmetic (higher-order functions, codegen,
    * no UDF) — map-only over the vector table, no shuffle but the output
    * ordering. Elements are cast float→double (exact) before any division so
    * both engines run the same IEEE ops. */
  def x45(spark: SparkSession, dir: String): DataFrame = {
    val emb = transform(col("embedding"), x => x.cast(DoubleType))
    val mx = array_max(transform(emb, x => abs(x)))
    val scale = col("mx") / lit(127.0)
    val codes = transform(col("emb"), x => round(x / scale, 0))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), emb.as("emb"), mx.as("mx"))
      .filter(col("mx") > 0)
      .select(
        col("vec_id"),
        size(col("emb")).cast(LongType).as("dim"),
        round(scale, 8).as("scale"),
        aggregate(codes, lit(0L), (acc, q) => acc + q.cast(LongType))
          .as("code_sum"),
        round(
          array_max(transform(col("emb"),
            x => abs(x - round(x / scale, 0) * scale))), 8)
          .as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** x46: BIGRAM NOVELTY — per document: its distinct bigrams, their mean
    * document frequency across the corpus, and how many are corpus-unique.
    * High mean-df documents are near-boilerplate even when no single document
    * duplicates them (the cross-doc complement of x08's pairwise Jaccard);
    * df=1 bigrams measure what the document alone contributes.
    *
    * 100 TB: distinct (doc_id, bigram) → df aggregate (map-side partials,
    * key cardinality = vocabulary², self-limited by language) → one shuffle
    * join back on bigram → per-doc aggregate. Never all-pairs; the join is
    * the same bucketed shape as tf-idf's (q48). */
  def x46(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = when(size(col("tk")) >= 2,
      transform(sequence(lit(1), size(col("tk")) - 1),
        i => concat(element_at(col("tk"), i), lit(" "),
                    element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val docBg = Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("tk"))
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .distinct()
    val df = docBg.groupBy("bg").agg(count(lit(1)).as("df"))
    docBg.join(df, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(col("df")), 4).as("avg_df"),
           sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .orderBy("doc_id")
  }

  /** x47: QUALITY GATE — the composite Gopher-style keep/drop verdict:
    * length in [100, 500] chars, max-token fraction < 1/5 (integer-exact as
    * 5·max < total — no float compare), and at least one stopword present.
    * Reported as per-source admission rates — the shape a curation dashboard
    * consumes when deciding which crawls to keep.
    *
    * 100 TB: SHUFFLE-FREE except the tiny per-source aggregate — every
    * check (length band, token_stats repetition, stopword membership) is a
    * per-row projection, so the gate is a map-only corpus scan. The verdict
    * itself is integer algebra. */
  def x47(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      // trim-guard ≡ n_tokens>0, before the project (see x44's plan note)
      .filter(trim(col("text")) =!= "")
      .select(col("source"), col("n_chars"),
              (array_contains(toks, "the") || array_contains(toks, "a"))
                .as("stop_ok"),
              call_function("token_stats", col("text")).as("ts"))
    val keep = col("n_chars").between(100, 500) &&
      col("ts.max_cnt") * 5 < col("ts.n_tokens") && col("stop_ok")
    docs
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(keep, 1L).otherwise(0L)).as("n_keep"),
           round(sum(when(keep, 1L).otherwise(0L)) * lit(1.0) /
                 count(lit(1)), 4).as("keep_rate"))
      .orderBy("source")
  }

  /** x49: PER-SOURCE QUOTA CAP — keep at most 20 documents per source,
    * preferring the longest (ties to the smallest doc_id), and report what
    * the cap admitted. The anti-domination step of corpus assembly: one
    * crawl/domain must not flood the mix regardless of its size (the
    * per-source twin of x30's per-language rates).
    *
    * 100 TB: rank + cap is a single source-partitioned window — no global
    * sort, no driver state; per-source data is the only thing co-located.
    * Skewed sources are exactly the ones the cap truncates, so the window's
    * worst partition is bounded by the biggest source, pre-cap — if that
    * itself overwhelms an executor, cap in two stages (per-partition pre-cap
    * to 20, then the window over survivors). */
  def x49(spark: SparkSession, dir: String): DataFrame = {
    val byPref = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(byPref))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("rn") <= 20, 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("rn") <= 20, col("n_chars")).otherwise(0L))
             .as("chars_kept"))
      .orderBy("source")
  }

  /** x50: LENGTH HISTOGRAM — fixed-width (50-char) document-length bins per
    * language: the distribution a curation run inspects before choosing
    * length cutoffs (x47's band is read off exactly this histogram).
    *
    * 100 TB: one map-side-combinable aggregate on a derived integer key;
    * output width is bounded by bins × languages, independent of corpus
    * size. */
  def x50(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), expr("n_chars DIV 50").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("n_chars")).as("min_chars"),
           max(col("n_chars")).as("max_chars"))
      .orderBy("lang", "bin")

  /** x48: LABEL-CENTROID GEOMETRY — per class: the mean cosine similarity of
    * its vectors to the class centroid. The standard embedding-space health
    * check (tight classes ⇒ high mean cosine) run before training a
    * classifier head or pruning outliers.
    *
    * 100 TB: posexplode → centroid aggregate keyed (label, pos) — at most
    * |labels|·dim rows, broadcast back (map-side join, no second shuffle of
    * the big side) → per-vector dot/norm aggregate (one shuffle keyed vec_id,
    * map-side partials) → tiny per-label aggregate. The broadcast side is
    * bounded by the label space, never by corpus size. */
  def x48(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
              posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("pos"),
              col("col").cast(DoubleType).as("v"))
    val centroid = e.groupBy("label", "pos").agg(avg(col("v")).as("cv"))
    e.join(broadcast(centroid), Seq("label", "pos"))
      .groupBy("vec_id", "label")
      .agg(sum(col("v") * col("cv")).as("dot"),
           sum(col("v") * col("v")).as("nv"),
           sum(col("cv") * col("cv")).as("nc"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
           round(avg(col("dot") / sqrt(col("nv") * col("nc"))), 6)
             .as("mean_cos"))
      .orderBy("label")
  }

  /** x130: QUANTILE NORMALIZATION ACROSS SOURCES — each document's score
    * (n_chars) replaced by the POOLED distribution's value at the same
    * quantile position: rank r of n_s within its source maps to pooled
    * index 1 + (r−1)·(N−1) DIV (n_s−1) (endpoints map to endpoints;
    * singleton sources take the pooled median). The bioinformatics
    * quantile-normalization recipe applied to corpus scores — after it,
    * every source has an identical score distribution, so a single global
    * threshold cuts every source at the same quantile (otherwise a verbose
    * source dominates any length-based gate). All-integer: ranks, DIV
    * index arithmetic, and integer scores — no interpolation.
    *
    * 100 TB: the per-source rank is a source-keyed window; the POOLED rank
    * must never be a single-partition window, so it runs the distributed
    * two-phase rank ([[graft.engine.Ranks.globalRowNumber]] — range
    * shuffle + offset broadcast); the remap is one join keyed on the
    * pooled index. */
  def x130(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val bySrc = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val withRank = docs
      .withColumn("r", row_number().over(bySrc).cast(LongType))
      .withColumn("n_s", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
    val pooled = graft.engine.Ranks.globalRowNumber(
        docs.select(col("n_chars"), col("doc_id")),
        Seq(col("n_chars"), col("doc_id")), "g")
      .select(col("g"), col("n_chars").as("norm_chars"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    withRank.crossJoin(broadcast(total))
      .withColumn("g",
        when(col("n_s") === 1, expr("(n_total + 1) DIV 2"))
          .otherwise(lit(1) +
            expr("(r - 1) * (n_total - 1) DIV (n_s - 1)")))
      .join(pooled, "g")
      .select(col("doc_id"), col("source"), col("n_chars"), col("norm_chars"))
      .orderBy("doc_id")
  }

  /** x126: QUALITY-MASS BUDGET CAP ("nucleus" curation) — keep each
    * source's best documents until HALF its total quality mass is spent,
    * the score-weighted refinement of x49's fixed per-source COUNT cap:
    * a source of many thin docs keeps many, a source of few dense docs
    * keeps few — budget follows mass, not headcount (the top-p/nucleus
    * rule of sampling, applied to corpus curation). The crossing doc is
    * kept (nucleus convention), so every source keeps ≥ 1. All-integer:
    * mass is BIGINT chars and the budget line is the cross-multiplied
    * `2·(cum − score) < total` — no float share anywhere.
    *
    * 100 TB: one source-keyed window cumsum (O(1) state) over a
    * source-keyed 1-row-per-source total — same single shuffle lineage;
    * output is |sources| rows. */
  def x126(spark: SparkSession, dir: String): DataFrame = {
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(cum))
      .withColumn("total", sum(col("n_chars")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")))
      .withColumn("keep", lit(2) * (col("cum") - col("n_chars")) < col("total"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("mass_total"),
           sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("mass_kept"))
      .orderBy("source")
  }

  /** x295: CURRICULUM PACING — competence-based curriculum (Platanios et
    * al.): rank documents easy→hard (n_chars ascending — the standard
    * length-difficulty proxy — tie doc_id), and under the root pacing
    * function c(t) = √(f₀² + (1−f₀²)·t/T) with f₀ = 1/10, T = 10 000
    * training steps, compute each document's UNLOCK step — the first t
    * with rank/N ≤ c(t), i.e. 0 when 100r² ≤ N², else
    * ⌈T·(100r² − N²) / (99N²)⌉ — in EXACT BIGINT cross-multiplied
    * arithmetic (no float pacing curve to drift cross-engine; headroom
    * T·100·r² = 10⁶·r² < 2⁶³ through ~3.0 M docs (r < 3.04·10⁶), the
    * x185 DECIMAL escape hatch past that). Output = the unlock-step histogram in 1 000-step buckets
    * with two theorems riding as flags: full coverage (Σ n_docs = N) and
    * completion (max unlock ≤ T — the hardest doc unlocks exactly at T).
    *
    * 100 TB: the rank is Ranks.globalRowNumber (two-phase distributed
    * rank, never a single-partition window); the unlock arithmetic is
    * map-side; the histogram is a ≤ 11-bucket aggregate and the flags run
    * on it under bounded windows. A loader consumes (doc, unlock) as the
    * per-step admission predicate. */
  def x295(spark: SparkSession, dir: String): DataFrame = {
    val T = 10000L
    val docs = Tables.documents(spark, dir).select("doc_id", "n_chars")
    val ranked = graft.engine.Ranks.globalRowNumber(
      docs, Seq(col("n_chars"), col("doc_id")), "r")
    val tot = ranked.agg(count(lit(1)).as("nn"))
    val all =
      Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked.crossJoin(broadcast(tot))
      .withColumn("unlock",
        when(lit(100L) * col("r") * col("r") <= col("nn") * col("nn"), 0L)
          .otherwise(expr(
            s"($T * (100 * r * r - nn * nn) + 99 * nn * nn - 1)" +
            " DIV (99 * nn * nn)")))
      .groupBy(expr("unlock DIV 1000").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("unlock")).as("min_unlock"),
           max(col("unlock")).as("max_unlock"), max(col("nn")).as("nn"))
      .withColumn("coverage_ok", sum(col("n_docs")).over(all) === col("nn"))
      .withColumn("complete_ok",
        max(col("max_unlock")).over(all) <= lit(T))
      .select(col("bucket"), col("n_docs"), col("min_unlock"),
              col("max_unlock"), col("coverage_ok"), col("complete_ok"))
      .orderBy("bucket")
  }


  /** x222: TEMPERATURE-SAMPLED MIXTURE — multilingual-LM dataset mixing
    * (sampling weight ∝ massᵅ, α = 1/2) with the budget made EXACT: per
    * source the token mass m, the tempered weight w = isqrt(m) (integer
    * square root — floor(sqrt) plus a ±1 integer correction, so the
    * weight is exact arithmetic on both engines, immune to pow()'s
    * cross-engine ULP drift), and a 1 000 000-token budget apportioned
    * over w by x165's largest-remainder device. Two theorems ride the
    * output as oracle-recomputed flags: Σalloc = B exactly (Hamilton),
    * and flatten_ok — tempering never INCREASES the largest source's
    * share (w_max·Σm ≤ m_max·Σw, the concavity fact that is the entire
    * point of temperature sampling), checked by BIGINT cross-
    * multiplication, no division anywhere.
    *
    * 100 TB: identical posture to x165 — the corpus-scale work is one
    * partial+final token-mass rollup; everything after runs on the
    * ≤|sources| aggregate with a 1-row broadcast stitch. The cross-
    * multiply rides BIGINT here (w ≤ isqrt(Σm) and m ≤ Σm keep the
    * products < 2⁶³ through ~10¹² tokens per source); past that the
    * x185 escape hatch is DECIMAL(38,0). */
  def x222(spark: SparkSession, dir: String): DataFrame = {
    val B = 1000000L
    val mass = Tables.documents(spark, dir)
      .select(col("source"),
              size(filter(split(lower(col("text")), " "), t => t =!= ""))
                .cast(LongType).as("toks"))
      .groupBy("source").agg(sum(col("toks")).as("m"))
    val s0 = floor(sqrt(col("m").cast(DoubleType))).cast(LongType)
    val wted = mass.withColumn("wt",
      when((s0 + 1L) * (s0 + 1L) <= col("m"), s0 + 1L)
        .when(s0 * s0 > col("m"), s0 - 1L)
        .otherwise(s0))
    val tot = wted.agg(sum(col("m")).as("tm"), sum(col("wt")).as("tw"),
                       max(col("m")).as("m_max"), max(col("wt")).as("w_max"))
    val w = Window.orderBy(col("rem").desc, col("source"))
    val all =
      Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wted.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"wt * $B DIV tw"))
      .withColumn("rem", expr(s"(wt * $B) % tw"))
      .withColumn("rk", row_number().over(w))
      .withColumn("leftover", lit(B) - sum(col("base")).over(all))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("sum_ok", sum(col("alloc")).over(all) === lit(B))
      .withColumn("flatten_ok", col("w_max") * col("tm") <=
                                  col("m_max") * col("tw"))
      .select(col("source"), col("m"), col("wt"), col("base"), col("alloc"),
              col("sum_ok"), col("flatten_ok"))
      .orderBy("source")
  }

  /** x274: WATER-FILLING TOKEN-BUDGET ALLOCATION — the CAPPED max-min fair
    * allocator that complements x222's uncapped proportional apportionment:
    * given per-source token capacities and a budget B (95% of the corpus),
    * raise a common water level L until Σ min(capₛ, L) = B — small sources
    * are taken WHOLE (capped), everyone else gets the level, and the
    * integer remainder goes +1 to the first r uncapped sources in the
    * (cap, source) total order. Exact integer solution of the classic
    * real-valued recursion: k = max{ i : capᵢ·(n−i) + prefᵢ ≤ B } under
    * caps sorted ascending, L = (B − pref_k) DIV (n−k) — maximality proves
    * every uncapped cap ≥ L+1, so the +1 remainder never overfills
    * (Round11Spec pins ΣallocS = B and both boundary theorems).
    *
    * 100 TB: the corpus-scale work is ONE partial+final token rollup;
    * the sort, prefix sums and level search all run on the ≤|sources|
    * aggregate (unpartitioned windows over aggregate output — bounded);
    * products stay < 2⁶³ through ~10¹² tokens/source (x185's
    * DECIMAL(38,0) escape hatch past that). */
  def x274(spark: SparkSession, dir: String): DataFrame = {
    val caps = Tables.documents(spark, dir)
      .select(col("source"),
              size(filter(split(lower(col("text")), " "), t => t =!= ""))
                .cast(LongType).as("toks"))
      .groupBy("source").agg(sum(col("toks")).as("cap"))
    val tot = caps.agg(sum(col("cap")).as("totcap"),
                       count(lit(1)).as("nsrc"))
    val ord = Window.orderBy(col("cap"), col("source"))
    val ranked = caps.crossJoin(broadcast(tot))
      .withColumn("budget", expr("totcap * 95 DIV 100"))
      .withColumn("i", row_number().over(ord).cast(LongType))
      .withColumn("pref", sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("afford",
        col("i") < col("nsrc") &&
        col("cap") * (col("nsrc") - col("i")) + col("pref") <= col("budget"))
    val summary = ranked.agg(
      max(when(col("afford"), col("i")).otherwise(0L)).as("k"),
      max(when(col("afford"), col("pref")).otherwise(0L)).as("prefk"))
    ranked.crossJoin(broadcast(summary))
      .withColumn("lvl", expr("(budget - prefk) DIV (nsrc - k)"))
      .withColumn("rmd", expr("(budget - prefk) % (nsrc - k)"))
      .withColumn("capped", col("i") <= col("k"))
      .withColumn("allocated",
        when(col("capped"), col("cap"))
          .otherwise(col("lvl") +
            when(col("i") - col("k") <= col("rmd"), 1L).otherwise(0L)))
      .select(col("source"), col("cap"), col("allocated"), col("capped"),
              expr("allocated * 1000000 DIV cap").as("util_ppm"))
      .orderBy("source")
  }

  /** x299: DSIR IMPORTANCE SELECTION — Data Selection via Importance
    * Resampling (Xie et al. 2023), the model-free "pick raw data that
    * looks like the target domain" curation stage: two add-one-smoothed
    * unigram LMs over the SHARED corpus vocabulary — target = the `en`
    * slice (the domain being matched), raw = the whole corpus — and per
    * document the exact log-likelihood-ratio score
    * Σ_tok c·ln(P_t(tok)/P_r(tok)). A document scores > 0 iff it is
    * likelier under the target LM than the raw LM — DSIR's importance
    * weight with the natural parameter-free acceptance threshold standing
    * in for the paper's Gumbel resampling (which is sampling noise on top
    * of exactly this score). Arithmetic is the x293 device: each vocab
    * term's λ = ln((c_t+1)(N_r+V) / ((c_r+1)(N_t+V))) is micro-rounded
    * ONCE on the bounded vocab grid, and every doc score is a
    * BIGINT-weighted Σ c·λ_micro — order-free, bit-stable cross-engine.
    * Output per source: token-bearing docs, selected docs, selection ppm,
    * selected score mass (µ-units).
    *
    * 100 TB: ONE token-explode scan builds the (doc, tok, c) grain
    * (checkpointed — it feeds both LMs and the scoring pass); both LMs
    * collapse to one vocab-keyed aggregate; λ lives on the vocab grid and
    * BROADCASTS into the scoring join (production hashes tokens into a
    * bounded bucket space — the DSIR paper's own device — precisely so
    * the model side stays broadcastable); the doc score is one doc-keyed
    * partial+final agg and the source rollup is bounded. Documents with
    * zero tokens carry no evidence and are out of scope (both engines
    * restate the same grain). */
  def x299(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.fanOut(Tables.documents(spark, dir)
        .select("doc_id", "lang", "source", "text"))
      .select(col("doc_id"), col("lang"), col("source"),
              explode(toks).as("tok"))
      .groupBy("doc_id", "lang", "source", "tok")
      .agg(count(lit(1)).as("c"))
      .materialized // feeds the LM aggregate AND the scoring join
    val vocabCnt = tf.groupBy("tok")
      .agg(sum(col("c")).as("c_raw"),
           sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("c_tgt"))
    val totals = vocabCnt.agg(sum(col("c_raw")).as("n_raw"),
                              sum(col("c_tgt")).as("n_tgt"),
                              count(lit(1)).as("v"))
    // Each factor casts to DOUBLE BEFORE the multiply (engine and oracle
    // in lockstep): a BIGINT product (c_tgt+1)·(n_raw+v) overflows — and
    // Spark WRAPS where DuckDB errors — once corpus token counts pass
    // ~3e9 at 100 TB scale (ADVICE r13). Double-per-factor never
    // overflows; below 2^53 per factor the products are exactly
    // representable, so small-scale values are digit-identical to the
    // integer form and the cross-engine hash is unchanged.
    val lam = vocabCnt.crossJoin(broadcast(totals))
      .select(col("tok"),
        round(log(((col("c_tgt") + 1L).cast(DoubleType) *
                   (col("n_raw") + col("v")).cast(DoubleType)) /
                  ((col("c_raw") + 1L).cast(DoubleType) *
                   (col("n_tgt") + col("v")).cast(DoubleType))) * 1000000, 0)
          .cast(LongType).as("lam_micro"))
    val perDoc = tf.join(broadcast(lam), "tok")
      .groupBy("doc_id", "source")
      .agg(sum(col("c") * col("lam_micro")).as("score_micro"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("score_micro") > 0, 1L).otherwise(0L)).as("n_sel"),
           sum(when(col("score_micro") > 0, col("score_micro"))
             .otherwise(0L)).as("sel_mass_micro"))
      .withColumn("sel_ppm", expr("n_sel * 1000000 DIV n_docs"))
      .select("source", "n_docs", "n_sel", "sel_ppm", "sel_mass_micro")
      .orderBy("source")
  }
}
