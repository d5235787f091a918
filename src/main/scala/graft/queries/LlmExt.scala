package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Tables, VectorKernels}

/** q44–q49: LLM-training-data pipeline operators (dedup, similarity search,
  * text analysis) — the oracle-checked exact variants. The approximate /
  * sub-quadratic scale paths (MinHash LSH etc.) live in
  * [[graft.queries.Extras]]; these exact forms double as their ground truth.
  */
object LlmExt {

  /** q44: exact deduplication on normalized text — hash groupBy, one shuffle
    * keyed on the normalized string; at 100 TB the key should be a digest
    * (see Extras.dedupExactDigest) but semantics are identical. */
  def q44(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(lower(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .orderBy("rep")

  /** q45: brute-force cosine top-k against one query vector — the correctness
    * baseline for similarity search. The query side is a 1-row broadcast; the
    * scan side is embarrassingly parallel; top-20 is TakeOrderedAndProject.
    * Kernels are unrolled fixed-dim expressions (whole-stage codegen); the
    * LSH scale path is LlmExt2.nearDupPairs. */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
              VectorKernels.cosine6(col("embedding"), col("qe"))
                .cast(DoubleType).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }

  /** q46: 5-NN majority-vote label — exact kNN as a SINGLE STREAMING PASS
    * over the candidate table. The bounded side of the all-pairs kernel is
    * the QUERY set (100 rows), so that is what gets broadcast; candidates
    * stay partitioned on their scan and never leave their executor at full
    * width. Per (candidate-partition, query) the 5 nearest collapse into a
    * [[graft.engine.expr.TopKPairs]] partial state (score = −d2 so
    * "strongest" = nearest; tag = nid breaks ties exactly like the oracle's
    * `ORDER BY d2, nid`), and the exchange carries only |queries| k-pair
    * states — not the |queries|×|candidates| distance grid the window idiom
    * would shuffle-and-sort. Labels re-attach to the 500 winning (qid, nid)
    * pairs by a keyed join against the embedding table, and the majority
    * vote runs on that bounded set.
    *
    * SCALE CONTRACT: unlike the pre-round-8 broadcast-BNLJ form, this plan
    * IS the 100 TB shape for exact kNN with a bounded query set — compute
    * stays O(|C|·|Q|) by definition of "exact", but memory is O(|Q|) per
    * executor and shuffle is O(|Q|·k·partitions). x18 (IVF) / x09 (LSH)
    * remain the sub-linear approximate paths for when the query set itself
    * scales, recall-tested against exactly this query (AnnIvfSpec,
    * LlmExtSpec). See PLANS.md. */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"),
                           col("label"))
    // parallelism comes from the candidate SCAN's own splits — repartitioning
    // the big side before a broadcast join would shuffle the full table for
    // nothing (at sf0.1 the kernel is 2·10⁵ evals; at scale, many splits)
    val scored = cands.join(broadcast(queries),
        col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
              (-round(VectorKernels.l2Sq(col("qe"), col("ne")), 6)).as("negd2"))
    val top5 = scored.groupBy("qid")
      .agg(call_function("topk_pairs", col("negd2"), col("nid"), lit(5)).as("tk"))
      .select(col("qid"), explode(col("tk.tag")).as("nid"))
    val votes = top5.join(cands.select("nid", "label"), "nid")
      .groupBy("qid", "label").agg(count(lit(1)).as("v"))
    val byVotes = Window.partitionBy("qid").orderBy(col("v").desc, col("label"))
    votes.withColumn("rn", row_number().over(byVotes)).filter(col("rn") === 1)
      .select(col("qid").as("vec_id"), col("label").cast(LongType).as("predicted"))
      .orderBy("vec_id")
  }

  /** q47: tokenize + global top-k tokens — explode is a Generator (no UDTF
    * needed); the count is a partial+final agg so the shuffle carries only
    * (token, partial count). */
  def q47(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(50)

  /** q48's DAG before materialization, exposed so PlanSpec can assert the
    * single-scan property on the live plan. Returns (tf, result): tf is
    * PERSISTED because it has three consumers (scored/df/n) and Catalyst's
    * column pruning specializes each branch's subtree, defeating exchange
    * reuse — uncached, the source scan + explode + aggregate would run three
    * times. The caller owns the unpersist. */
  private[graft] def tfidfDag(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")).persist()
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // n = corpus size over documents, NOT distinct doc_id over tf: a doc with
    // empty/whitespace-only text still counts toward N in standard tf-idf
    // (ADVICE r3). One extra 1-column parquet scan — cheap at any scale.
    val n = docs.agg(count(col("doc_id")).as("n"))
    val scored = tf.filter(col("doc_id") < 50)
      .join(df, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
              round(col("tf") * log(col("n") * lit(1.0) / col("df")), 6).as("tfidf"))
    val perDoc = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    val out = scored.withColumn("rn", row_number().over(perDoc)).filter(col("rn") === 1)
      .select(col("doc_id"), col("tok"), col("tfidf"))
      .orderBy("doc_id")
    (tf, out)
  }

  /** q48: tf·idf top term per document. The corpus count is a 1-row
    * broadcast; the df side is UNhinted — a vocabulary is unbounded on a real
    * corpus (typos, unicode), so stats pick broadcast at test scale and a
    * token-keyed shuffle join at 100 TB. tf shuffles once on (doc_id, tok);
    * df derives FROM it (tf is already distinct per (doc_id, tok), so df is
    * a plain count); n is the corpus size counted over documents itself
    * (empty docs count toward N — standard tf-idf, mirrored in the oracle
    * CTE); the persisted tf serves both consumers from one
    * corpus scan (see [[tfidfDag]]). The tiny result is materialized
    * (x24's localCheckpoint pattern) so tf can be unpersisted HERE — a bare
    * persist would leak a session-lifetime cache entry per directory and let
    * a re-run serve tf from cache, timing only the tail of the query. */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    val (tf, out) = tfidfDag(spark, dir)
    val snap = out.materialized
    tf.unpersist()
    snap
  }

  /** q49: per-(lang, source) corpus statistics — plain partial+final agg. */
  def q49(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
           round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy("lang", "source")

  /** x317: HARD-NEGATIVE MINING (round 15) — the contrastive-training
    * batch-construction step (DPR / SimCSE / E5 recipes): for every
    * anchor (vec_id ≡ 0 mod 50 — the sampling-rate-bounded slice a
    * training run actually mines, never the whole corpus), the top-5
    * HIGHEST-cosine vectors inside the hard-negative band
    * [0.40, 0.98] micro — similar enough to be informative gradients,
    * but BELOW the near-dup ceiling so an unlabeled true duplicate
    * (cos ≈ 1, exactly what x284/x01 would drop) is never pushed apart
    * as a false negative, and ABOVE the easy-negative floor where the
    * gradient carries no signal. Bands reuse SemDeDup's 0.40 threshold
    * so "negative" and "duplicate" are calibrated against each other.
    * Output: (anchor_id, rank, neg_id, cos_micro), rank by
    * (cos desc, neg_id) — q45's total order.
    *
    * 100 TB: q46's bounded-broadcast chassis — the ANCHOR slice
    * broadcasts (bounded by the sampling rate), candidates never leave
    * their scan partitions, and the per-anchor top-5 collapses through
    * the `topk_pairs` partial aggregate (the exchange carries
    * ≤ |anchors| 5-pair states, never the anchor×corpus grid or a
    * window sort over it). When the anchor set itself scales, swap the
    * exact scan for the x18/x310 IVF probe per anchor — the band filter
    * and ranking are unchanged; the exact chassis here is what makes
    * the key oracle-checkable. */
  def x317(spark: SparkSession, dir: String): DataFrame =
    hardNegativesFrom(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** The mining core on an arbitrary (vec_id, embedding) frame — the
    * Round15Spec planted-geometry entry. */
  private[graft] def hardNegativesFrom(emb: DataFrame): DataFrame = {
    // zero-norm vectors have no cosine — excluded on both engines as
    // anchors AND candidates (the x111 device)
    val nz = emb.filter(VectorKernels.normSq(col("embedding")) > lit(0f))
    // BOUNDED anchor panel (the x09/x111 device): every 50th vector with
    // vec_id < 2100 — all 50th vectors at every testdata sf (max id
    // 1999), a fixed-size panel on id-shifted soak corpora. A training
    // run mines a fixed batch of anchors, not a constant fraction of the
    // corpus; an unbounded % 50 slice would make the exact chassis
    // O(N²/50) — quadratic in the copy factor.
    val anchors = nz.filter(col("vec_id") % 50 === 0 && col("vec_id") < 2100)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("ae"))
    nz.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
      .withColumn("cm", VectorKernels.cosineMicro(col("embedding"), col("ae")))
      .filter(col("cm") >= 400000L && col("cm") <= 980000L)
      .groupBy("anchor_id")
      .agg(call_function("topk_pairs",
        col("cm").cast(DoubleType), col("vec_id"), lit(5)).as("tk"))
      .select(col("anchor_id"), posexplode(col("tk")))
      .select(col("anchor_id"), (col("pos") + 1).cast(LongType).as("rank"),
              col("col.tag").as("neg_id"),
              col("col.score").cast(LongType).as("cos_micro"))
      .orderBy("anchor_id", "rank")
  }
}
