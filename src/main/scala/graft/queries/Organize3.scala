package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** x170–x172: corpus/statistics operators that each replace a
  * sort-everything formulation with a bounded-state distributed one —
  * join-free skip-gram counting, a two-phase exact global median with no
  * global sort, and Merkle-style key-range checksums for table diffing.
  * All integer arithmetic → oracle-checked per SURVEY §7.4.
  */
object Organize3 {

  /** x170: SKIP-GRAM PAIRS — word2vec's counting core: co-occurring token
    * pairs within a forward window of 2 positions, top-20 by count (ties
    * on the words). The naive formulation self-joins the position-exploded
    * token table on (doc, pos-range) — an events-scale shuffle of every
    * token TWICE; here the pairs are built MAP-SIDE from the token array
    * (adjacent zip + skip-1 zip), so the only shuffle is the (w1, w2)
    * partial-aggregate rollup — vocabulary², not corpus-sized.
    *
    * 100 TB: per-doc work is linear in tokens; the pair stream partial-
    * aggregates before its one exchange; the top-20 is a
    * TakeOrderedAndProject over the bounded pair-count aggregate. */
  def x170(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("t"))
    val pairs = toks.select(explode(concat(
        expr("arrays_zip(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1))"),
        expr("arrays_zip(slice(t, 1, size(t)-2), slice(t, 3, size(t)-2))")))
        .as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
    pairs.groupBy("w1", "w2")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** x171: EXACT GLOBAL MEDIAN, NO GLOBAL SORT — the two-phase histogram
    * median of order totals in cents: phase 1 buckets the corpus into
    * 4096-cent-wide ranges (one partial+final agg) and locates which
    * bucket(s) hold the two middle order statistics by cumulative count;
    * phase 2 rescans ONLY those ≤2 buckets (the predicate prunes the
    * second pass), aggregates per exact cent value (≤8192 distinct — a
    * bounded set), and reads the middles off a second cumulative count.
    * Reported as `med2_cents` = the SUM of the two middle statistics
    * (median = med2/2) so the output stays an exact BIGINT.
    *
    * 100 TB: no row-scale sort anywhere — both windows run over provably
    * bounded aggregates (≤⌈max_cents/4096⌉ buckets; ≤2·4096 values); the
    * classic distributed order-statistic scheme (one extra histogram
    * level bounds phase 2 for wider domains). The oracle states the same
    * semantics with a full row_number sort. */
  def x171(spark: SparkSession, dir: String): DataFrame = {
    val W = 4096L
    val c = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100, 0).cast(LongType).as("cents"))
    val h1 = c.groupBy(expr(s"cents DIV $W").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = h1
      .withColumn("before", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
      .withColumn("k1", expr("(n + 1) DIV 2"))
      .withColumn("k2", expr("n DIV 2 + 1"))
      .filter((col("before") < col("k1") &&
               col("k1") <= col("before") + col("cnt")) ||
              (col("before") < col("k2") &&
               col("k2") <= col("before") + col("cnt")))
      .select(col("b"), col("before").as("bucket_before"),
              col("n"), col("k1"), col("k2"))
    // within-bucket cumulative MUST partition by bucket: when the two
    // middles straddle a bucket boundary, each bucket's offsets restart
    // from its own `bucket_before`
    val wv = Window.partitionBy("b").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    c.join(broadcast(cum), expr(s"cents DIV $W") === col("b"))
      .groupBy("b", "cents", "bucket_before", "n", "k1", "k2")
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("start", col("bucket_before") +
        coalesce(sum(col("vcnt")).over(wv), lit(0L)))
      .agg(max(col("n")).as("n_rows"),
           sum(when(col("start") < col("k1") &&
                    col("k1") <= col("start") + col("vcnt"), col("cents"))
                 .otherwise(0L) +
               when(col("start") < col("k2") &&
                    col("k2") <= col("start") + col("vcnt"), col("cents"))
                 .otherwise(0L)).as("med2_cents"))
  }

  /** x172: KEY-RANGE CHECKSUMS — a portable per-1000-key checksum of the
    * orders table (Knuth-mixed key/custkey/total, summed mod a 53-bit
    * prime): the Merkle-leaf primitive behind "which key ranges differ
    * between these two replicas / snapshots?" — compare checksums, then
    * re-sync only the ranges that disagree, never the whole table.
    * Everything BIGINT: the key is pre-reduced mod 10⁸ before the Knuth
    * multiply (products ≲ 2⁵⁸ at ANY key scale) and ≤1000 mod-2⁵³ terms per range
    * keep every sum below 2⁶³ on both engines.
    *
    * 100 TB: one partial+final aggregate keyed on `o_orderkey DIV 1000` —
    * dense ranges mean bounded rows per range, so no skew; the checksum
    * is commutative (a sum), so partial aggregation is exact and
    * partition-order-free. */
  def x172(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(expr("o_orderkey DIV 1000").as("key_range"),
              ((col("o_orderkey") % lit(100000000L) * lit(2654435761L) +
                col("o_custkey") * lit(40503L) +
                round(col("o_totalprice") * 100, 0).cast(LongType)) %
                 lit(9007199254740881L)).as("h"))
      .groupBy("key_range")
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
      .orderBy("key_range")

  /** x181: LABEL-PROPAGATION COMMUNITIES — 3 synchronous LPA rounds over
    * the support-≥2 co-purchase graph (parts co-ordered at least twice),
    * labels initialized to node ids, each round relabeling every node
    * with its neighbors' most frequent label (ties to the smallest — the
    * deterministic tie-break that makes sync LPA oracle-checkable at
    * all). Output is the community size distribution. Complements the
    * graph family: x24 finds CONNECTED components, LPA finds DENSE
    * communities inside them.
    *
    * 100 TB: each round is one keyed join (edges hashed on the neighbor
    * end) + a (node, label) partial-aggregated count + a `max_by` argmax
    * riding the node hash — the standard Pregel-free sync-LPA shape;
    * rounds are FIXED (3), not data-dependent, so the plan is a static
    * 3-fold composition with no driver-side convergence probe (contrast
    * x24, where convergence is the point). The edge list is reused each
    * round; labels stay |V|-sized throughout. */
  def x181(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val e0 = op.as("a")
      .join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("u", "v")
    // the edge list feeds every round: persist it pre-partitioned on the
    // neighbor end so each propagation join reads the cached layout
    // instead of re-running the pair-build (x24's pattern); each round
    // localCheckpoints to keep the 3-fold lineage flat. Both handles are
    // released before returning (LlmExt's leak rule).
    val und = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v")).persist()
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      labels = und
        .join(labels, col("v") === col("node"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("u").as("node"))
        .agg(max_by(struct(col("label")),
                    struct(col("c"), negate(col("label")))).as("best"))
        .select(col("node"), col("best.label").as("label"))
        .materialized
    }
    val out = labels.groupBy("label")
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("label"))
      .materialized
    und.unpersist()
    out
  }
}
