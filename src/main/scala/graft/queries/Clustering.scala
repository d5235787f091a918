package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** x140–x142: corpus-organization operators over the embedding / document
  * tables — deterministic (oracle-checked) clustering, product-quantization
  * encoding, and BM25 relevance scoring. These complete the similarity stack:
  * x18 holds the ML-trained IVF index (seeded KMeans; oracle-checked in
  * theorem form — exact top-20 + locality flag, AnnIvf.x18);
  * x140/x141 are its EXACTLY-REPRODUCIBLE twins, built so every
  * arithmetic step pins to the determinism protocol (SURVEY §7.4: cast
  * float→double before arithmetic, round at every cross-engine boundary,
  * total-order tie-breaks) and therefore hash-match DuckDB bit for bit.
  */
object Clustering {

  private val kCells = 8

  /** Squared L2 between a double-array column and a float-array column,
    * folded left-to-right — the same sequential order DuckDB's `list_sum`
    * over a comprehension uses, so the un-rounded doubles are bit-identical
    * across engines (identical inputs, identical op order). */
  private def l2sqExpr(ce: String, emb: String): Column = expr(
    s"""aggregate(zip_with($ce, $emb,
       |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
       |  0D, (s, x) -> s + x)""".stripMargin)

  /** Nearest-centroid assignment: broadcast the (bounded) centroid table,
    * score every (vector, centroid) pair in-map, and collapse to the argmin
    * with a `min_by` partial aggregate — the shuffle carries ONE row per
    * vector, never the |V|×k distance grid. Distances round at 6 dp before
    * the argmin so the (d2, cell) total order is identical on both engines. */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("d2", round(l2sqExpr("ce", "embedding"), 6))
      .groupBy("vec_id")
      .agg(min_by(struct(col("cell"), col("d2")),
                  struct(col("d2"), col("cell"))).as("best"))
      .select(col("vec_id"),
              col("best.cell").as("cell"), col("best.d2").as("d2"))

  /** x140: DETERMINISTIC K-MEANS (2 Lloyd rounds, k = 8, init = the first k
    * vectors by id) — per-cell population and mean squared distance after
    * the second assignment. The oracle-checked twin of x18's seeded ML
    * KMeans: same algorithm, but every step is exactly reproducible, so the
    * whole clustering — not just a recall proxy — is verified against
    * DuckDB.
    *
    * Determinism protocol: centroid components ROUND at 6 dp after the AVG
    * (a ~1e-12-relative FP-order difference between engines is crushed by
    * the rounding grain, so round-2 inputs are bit-identical arrays);
    * distances round at 6 dp before every argmin; ties break on cell id.
    *
    * 100 TB: per round, one broadcast of k·d doubles + a map-side `min_by`
    * (shuffle = |V| rows), then a posexplode partial-agg whose shuffle is
    * k·d rows — the canonical distributed Lloyd shape. Rounds are a fixed
    * small constant (2 here; convergence-driven in production, each round
    * the same two exchanges). */
  def x140(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val c0 = emb.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("cell"),
              transform(col("embedding"), _.cast(DoubleType)).as("ce"))
    val a1 = assign(emb, c0)
    val c1 = a1.join(emb, "vec_id")
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy("cell", "pos")
      .agg(round(avg(col("col").cast(DoubleType)), 6).as("cv"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pv"))
      .select(col("cell"), expr("transform(pv, x -> x.cv)").as("ce"))
    val a2 = assign(emb, c1)
    // mean_d2 via the exact-integer device (x202): d2 is already 6-dp
    // rounded, so d2·1e6 is an exact BIGINT — summing integers is
    // order-free, and the single double division at emit is identical
    // across engines. ROUND(AVG(double),6) here would sit one ulp from a
    // rounding boundary on some cells (the x141 round-8 failure mode).
    a2.withColumn("d2_p6", round(col("d2") * 1e6, 0).cast(LongType))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2_p6")).as("sp6"))
      .select(col("cell").cast(LongType).as("cell"), col("n_vecs"),
              round(col("sp6") * lit(1.0) / (col("n_vecs") * lit(1e6)), 6)
                .as("mean_d2"))
      .orderBy("cell")
  }

  /** x141: PRODUCT-QUANTIZATION ENCODE — split the 64-dim embedding into 4
    * subspaces of 16 dims, encode each subvector as its nearest codeword
    * (codebook = the first 8 vectors' subvectors — fixed, so the encoding is
    * oracle-checkable; production would train per-subspace codebooks with
    * x18's KMeans device), and report per-(subspace, codeword) population
    * and mean reconstruction error. PQ is the memory side of large-scale
    * ANN: 64 floats compress to 4 code bytes, and x18's IVF cells + these
    * codes are the classic IVF-PQ layout.
    *
    * 100 TB: the codebook broadcast is k·d doubles; encoding is one map
    * pass (each vector scores 8 codewords per subspace in-line); the argmin
    * collapses through the same `min_by` partial-aggregate shape as x140,
    * so the shuffle carries 4 rows per vector (one per subspace), then the
    * stats aggregate to the 32-row (subspace, code) grid. */
  def x141(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val cb = emb.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("code"),
              transform(col("embedding"), _.cast(DoubleType)).as("ce"))
    emb.withColumn("sub", explode(sequence(lit(0), lit(3))))
      .crossJoin(broadcast(cb))
      .withColumn("d2", round(expr(
        """aggregate(zip_with(slice(ce, sub * 16 + 1, 16),
          |                   slice(embedding, sub * 16 + 1, 16),
          |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
          |  0D, (s, x) -> s + x)""".stripMargin), 6))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("code"), col("d2")),
                  struct(col("d2"), col("code"))).as("best"))
      // mean_err via the exact-integer device (x202): best.d2 is 6-dp
      // rounded, so ·1e6 is an exact BIGINT; integer summation is
      // order-free and the one double division at emit matches DuckDB
      // bit for bit. (Round 8's ROUND(AVG(d2),6) landed one ulp from the
      // 5e-7 boundary on cell (sub 0, code 4) and hash-mismatched.)
      .withColumn("d2_p6", round(col("best.d2") * 1e6, 0).cast(LongType))
      .groupBy(col("sub").cast(LongType).as("subspace"),
               col("best.code").as("code"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2_p6")).as("sp6"))
      .select(col("subspace"), col("code"), col("n_vecs"),
              round(col("sp6") * lit(1.0) / (col("n_vecs") * lit(1e6)), 6)
                .as("mean_err"))
      .orderBy("subspace", "code")
  }

  /** Per-(vector, subspace) nearest-codeword assignment against a
    * (sub, code, ce) codebook — x141's encode shape, codebook-agnostic:
    * broadcast join keyed on sub (8 codewords per (vector, subspace)
    * in-map), 6-dp-rounded subspace kernel, `min_by` argmin so the
    * shuffle carries one row per (vector, subspace). */
  private[graft] def pqAssign(emb: DataFrame, cb: DataFrame): DataFrame =
    emb.withColumn("sub", explode(sequence(lit(0), lit(3))))
      .join(broadcast(cb), "sub")
      .withColumn("d2", round(expr(
        """aggregate(zip_with(ce,
          |                   slice(embedding, sub * 16 + 1, 16),
          |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
          |  0D, (s, x) -> s + x)""".stripMargin), 6))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("code"), col("d2")),
                  struct(col("d2"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"),
              col("best.code").as("code"), col("best.d2").as("d2"))

  /** The fixed first-8-vectors codebook as a (sub, code, ce) frame —
    * x141/x182's oracle-checkable codebook, already sliced per subspace. */
  private def fixedCodebook(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < kCells)
      .withColumn("sub", explode(sequence(lit(0), lit(3))))
      .select(col("sub"), col("vec_id").as("code"),
              expr("transform(slice(embedding, sub * 16 + 1, 16)," +
                   " b -> CAST(b AS DOUBLE))").as("ce"))

  /** TRAINED per-subspace PQ codebooks — the x140 deterministic Lloyd
    * device applied INSIDE each of the 4 subspaces at once: init = the
    * fixed first-8 codebook (so training strictly refines what x141
    * ships), then `rounds` Lloyd updates under the same determinism
    * protocol (codeword components ROUND at 6 dp after the AVG, distances
    * round at 6 dp before every argmin, ties break on code). A codeword
    * whose cell empties keeps its previous position (standard Lloyd).
    *
    * This closes the "production would train per-subspace codebooks"
    * caveat on x141: [[pqEncodeTrained]] runs the identical encode path
    * with this codebook, and ClusteringSpec proves the trained total
    * reconstruction error never exceeds the fixed codebook's.
    *
    * 100 TB: all 4 subspaces train in ONE job per round — the codebook
    * broadcast is 4·8·16 doubles, assignment shuffles one row per
    * (vector, subspace), and the update is a posexplode partial-agg
    * whose shuffle is 4·8·16 rows. Rounds are a small constant. */
  private[graft] def trainedCodebooks(spark: SparkSession, dir: String,
                                      rounds: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    var cb = fixedCodebook(emb)
    for (_ <- 1 to rounds) {
      val a = pqAssign(emb, cb)
      val means = a.join(emb, "vec_id")
        .select(col("sub"), col("code"),
                posexplode(expr("slice(embedding, sub * 16 + 1, 16)")))
        .groupBy("sub", "code", "pos")
        .agg(round(avg(col("col").cast(DoubleType)), 6).as("cv"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pv"))
        .select(col("sub"), col("code"),
                expr("transform(pv, x -> x.cv)").as("nce"))
      cb = cb.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
                coalesce(col("nce"), col("ce")).as("ce"))
        .localCheckpoint(true) // flatten per-round lineage (x140's discipline)
    }
    cb
  }

  /** x141's encode against the TRAINED codebooks — same output grid
    * (subspace, code, n_vecs, mean_err) and the same exact-integer mean
    * device; the fixed-codebook x141 stays the oracle key. */
  private[graft] def pqEncodeTrained(spark: SparkSession, dir: String,
                                     rounds: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    pqAssign(emb, trainedCodebooks(spark, dir, rounds))
      .withColumn("d2_p6", round(col("d2") * 1e6, 0).cast(LongType))
      .groupBy(col("sub").cast(LongType).as("subspace"), col("code"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2_p6")).as("sp6"))
      .select(col("subspace"), col("code"), col("n_vecs"),
              round(col("sp6") * lit(1.0) / (col("n_vecs") * lit(1e6)), 6)
                .as("mean_err"))
      .orderBy("subspace", "code")
  }

  /** Total PQ reconstruction error (sum over (vector, subspace) of the
    * best 6-dp-rounded d2, in exact integer micros) for a given codebook
    * — the training objective ClusteringSpec compares across codebooks. */
  private[graft] def pqTotalErrMicros(spark: SparkSession, dir: String,
                                      cb: DataFrame): Long = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    pqAssign(emb, cb)
      .agg(sum(round(col("d2") * 1e6, 0).cast(LongType)))
      .head.getLong(0)
  }

  private[graft] def fixedCodebook(spark: SparkSession, dir: String): DataFrame =
    fixedCodebook(Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** x182's ADC top-k against an arbitrary (sub, code, ce) codebook — the
    * serving half parameterized the same way [[pqAssign]] parameterizes
    * the encode half, so the TRAINED codebooks drop straight into the
    * IVF-PQ serving path: LUT = query×codebook subspace distances (32
    * rows, broadcast), database vectors encoded via pqAssign, approximate
    * distance = 4 integer table lookups summed (exact BIGINT micros,
    * order-free), (adc, vec_id)-total-ordered top-10. x182 itself stays
    * the fixed-codebook oracle key; ClusteringSpec drives this with
    * [[trainedCodebooks]] and pins the guarantee PQ serving actually
    * makes: every ADC estimate sits within the vector's quantization
    * radius of the true distance, and training shrinks the total squared
    * radius (the Lloyd objective). */
  private[graft] def pqAdcTopK(spark: SparkSession, dir: String,
                               cb: DataFrame, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val lut = cb.crossJoin(broadcast(q))
      .withColumn("lm", round(round(expr(
        """aggregate(zip_with(ce, slice(qe, sub * 16 + 1, 16),
          |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
          |  0D, (s, x) -> s + x)""".stripMargin), 6) * 1000000d, 0)
        .cast(LongType))
      .select("sub", "code", "lm")
    pqAssign(emb, cb).select("vec_id", "sub", "code")
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy("vec_id")
      .agg(sum(col("lm")).as("adc_micros"))
      .orderBy(col("adc_micros"), col("vec_id"))
      .limit(k)
  }

  /** x142: BM25 RELEVANCE SCORING — the strongest term per document under
    * BM25 (k1 = 1.2, b = 0.75), the ranking function behind every classical
    * retrieval stack (and the lexical half of hybrid search next to
    * x95's RRF fusion). Extends q48's tf-idf: same (tf, df, N) statistics
    * plus the document-length normalization tf-idf lacks.
    *
    * idf uses the BM25+1 form LN((N - df + 0.5)/(df + 0.5) + 1) — strictly
    * positive, so the argmax never flips sign on corpus-frequent terms.
    *
    * 100 TB: tokenize+count is a partial+final agg on (doc, token); df is a
    * second partial+final agg on token; N and avgdl are one broadcast scalar
    * row; the per-doc argmax is a `max_by` partial aggregate — one shuffled
    * row per document, no window sort. */
  def x142(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
                       avg(col("dl").cast(DoubleType)).as("avgdl"))
    tf.filter(col("doc_id") < 50)
      .join(dl, "doc_id")
      .join(df, "tok")
      .crossJoin(broadcast(stats))
      .withColumn("bm25", round(
        expr("""LN((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
               |  (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"""
          .stripMargin), 6))
      .groupBy("doc_id")
      // argmax under (bm25 DESC, tok ASC): min_by over the (−bm25, tok)
      // struct — scores are strictly positive so the negation is safe
      .agg(min_by(struct(col("bm25"), col("tok")),
                  struct(negate(col("bm25")), col("tok"))).as("best"))
      .select(col("doc_id"), col("best.tok").as("tok"),
              col("best.bm25").as("bm25"))
      .orderBy("doc_id")
  }

  /** x182: PQ ASYMMETRIC-DISTANCE TOP-K — the SERVING half of IVF-PQ,
    * completing x141's encoding: the query (vec 0) precomputes a 4×8
    * lookup table of subspace distances to every codeword; each database
    * vector's approximate distance is then FOUR integer table lookups
    * summed — never a 64-dim kernel against the query. Distances round
    * at 6 dp then scale to integer micros, so the ADC sum is an exact
    * BIGINT (order-free) and the (adc, vec_id) top-10 is total-ordered.
    *
    * 100 TB: the LUT is 32 rows broadcast (this is WHY PQ serves fast —
    * the per-vector cost is table lookups, not arithmetic against the
    * query); encoding reuses x141's argmin shape (one shuffled row per
    * (vector, subspace)); the top-10 is TakeOrderedAndProject. The
    * recall story against exact search lives with x111's matrix —
    * this key pins the serving arithmetic itself. */
  def x182(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val cb = emb.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("code"),
              transform(col("embedding"), _.cast(DoubleType)).as("ce"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val subKernel = expr(
      """round(aggregate(zip_with(slice(ce, sub * 16 + 1, 16),
        |                         slice(qe, sub * 16 + 1, 16),
        |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
        |  0D, (s, x) -> s + x), 6)""".stripMargin)
    val lut = cb.crossJoin(broadcast(q))
      .withColumn("sub", explode(sequence(lit(0), lit(3))))
      .withColumn("lm", round(subKernel * 1000000d, 0).cast(LongType))
      .select("sub", "code", "lm")
    val codes = emb.withColumn("sub", explode(sequence(lit(0), lit(3))))
      .crossJoin(broadcast(cb))
      .withColumn("d2", round(expr(
        """aggregate(zip_with(slice(ce, sub * 16 + 1, 16),
          |                   slice(embedding, sub * 16 + 1, 16),
          |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
          |  0D, (s, x) -> s + x)""".stripMargin), 6))
      .groupBy("vec_id", "sub")
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy("vec_id")
      .agg(sum(col("lm")).as("adc_micros"))
      .orderBy(col("adc_micros"), col("vec_id"))
      .limit(10)
  }
}
