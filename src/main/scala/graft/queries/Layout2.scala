package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.{Hilbert, Tables}

/** x242 + x249: storage-layout and observability-histogram audits that
  * extend the layout family (x113 bucketing, x150 z-order, x193 skipping,
  * x197 DPP, x209 backfill, x217 compaction, x234 encoding, x235 DVs).
  */
object Layout2 {

  /** x242: HILBERT-CURVE LAYOUT AUDIT — x150's Z-order audit re-run on the
    * Hilbert index ([[graft.engine.Hilbert]]): quantize (l_partkey,
    * l_suppkey) to 8 bits each, map through the 8-level reflect/swap
    * recursion in portable div/mod/CASE arithmetic, bucket by `hd8 DIV
    * 256` (256 tiles of 256 consecutive curve cells) and report per-tile
    * population plus min/max spans of BOTH dimensions. The property that
    * makes Hilbert the better clustering key is pinned in Round10fSpec:
    * consecutive Hilbert cells are ALWAYS grid-adjacent (0 jumps over all
    * 65 535 steps) while the Z-curve takes hundreds of non-adjacent jumps
    * — so every non-aligned consecutive-key file range is geometrically
    * connected, not just the power-of-two-aligned tiles both curves keep
    * square (aligned 256-cell tiles are 16×16 blocks under either curve,
    * span ≤ 30 in this audit's output).
    *
    * 100 TB: the 40 chained column definitions are per-row map arithmetic
    * inside one codegen stage on the scan (named columns, not substituted
    * expressions — the 2⁸ textual blowup never happens); the audit is one
    * partial+final agg to ≤256 rows; the two dimension maxima are a 1-row
    * broadcast stitch. An actual re-layout would `repartitionByRange(hd8)`
    * + sortWithinPartitions — one range exchange on the same key. */
  def x242(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val maxes = li.agg(max(col("l_partkey")).as("maxp"),
                       max(col("l_suppkey")).as("maxs"))
    var q = li.crossJoin(broadcast(maxes))
      .withColumn("px", expr("CAST((l_partkey * 256) DIV (maxp + 1) AS INT)"))
      .withColumn("py", expr("CAST((l_suppkey * 256) DIV (maxs + 1) AS INT)"))
      .withColumn("hx0", col("px"))
      .withColumn("hy0", col("py"))
      .withColumn("hd0", lit(0))
    Hilbert.steps("DIV").foreach { case (n, e) => q = q.withColumn(n, expr(e)) }
    q.withColumn("tile", expr("CAST(hd8 AS BIGINT) DIV 256"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
           min(col("px")).cast(LongType).as("min_px"),
           max(col("px")).cast(LongType).as("max_px"),
           min(col("py")).cast(LongType).as("min_py"),
           max(col("py")).cast(LongType).as("max_py"))
      .orderBy("tile")
  }

  /** The rendezvous (highest-random-weight) hash, portable: per (key,
    * shard) the cubed Knuth mix h = a³ mod M with a = (k·A + (s+1)·B)
    * mod M — the cube is the cheapest arithmetic-only nonlinearity that
    * breaks the linear congruential structure (a raw a or a·mix argmax
    * is measurably skewed: 20–27% movement and 2.7× load imbalance at 16
    * shards; the cube lands at the theoretical 1/(n+1) and ±7%). All
    * BIGINT-safe: the key is pre-reduced mod 10⁸ BEFORE the Knuth
    * multiply (the repo-wide convention, per Crossval/Pipeline) — a raw
    * o_orderkey reaches ~6·10⁹ by sf≈1000, where key·2654435761
    * overflows int64 and Spark wraps silently while DuckDB raises, so
    * engine and oracle would diverge exactly at the scale this engine
    * targets; after the reduce a < 2³¹, a² < 2⁶², (a² mod M)·a < 2⁶². */
  def rdvHashSql(k: String, s: String): String = {
    val a = s"((($k) % 100000000) * 2654435761 + (($s) + 1) * 97564181) % 2147483647"
    s"((($a) * ($a)) % 2147483647) * ($a) % 2147483647"
  }

  /** x253: SHARD-REBALANCE AUDIT (rendezvous vs modulo) — the partition-
    * assignment decision behind every stateful shard map, consistent-hash
    * ring and cache tier: what fraction of keys MOVE when a 17th shard
    * joins 16? Modulo placement moves ~16/17 of all keys (every key whose
    * k mod 16 ≠ k mod 17); rendezvous/HRW placement (argmax over shards
    * of a per-(key,shard) hash) moves ~1/17 — and, BY THEOREM, every move
    * lands on the NEW shard (adding a candidate never reorders the
    * existing ones' scores: `illegal_moves` is computed and is 0, stated
    * in the oracle and proven in Round10jSpec). The audit emits both
    * movement counts, the ppm rate, and the 16-shard load spread.
    *
    * 100 TB: ONE scan with in-map array arithmetic (two argmaxes over a
    * 17-slot array) into ONE ≤16·17·2-row aggregate keyed by (s16, s17,
    * mod-moved); every reported statistic reshapes from that bounded
    * frame — adding shards widens the array, never adds a pass. */
  def x253(spark: SparkSession, dir: String): DataFrame = {
    val hsExpr = (0 until 17)
      .map(s => rdvHashSql("k", s.toString))
      .mkString("array(", ", ", ")")
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"))
      .withColumn("hs", expr(hsExpr))
      .withColumn("h16", expr("slice(hs, 1, 16)"))
      .selectExpr(
        "CAST(array_position(h16, array_max(h16)) - 1 AS BIGINT) AS s16",
        "CAST(array_position(hs, array_max(hs)) - 1 AS BIGINT) AS s17",
        "CASE WHEN k % 16 <> k % 17 THEN 1L ELSE 0L END AS mod_moved")
      .groupBy("s16", "s17", "mod_moved")
      .agg(count(lit(1)).as("c"))
      .materialized // ≤544 rows, two consumers: loads + the stats
    val loads = base.groupBy("s16").agg(sum(col("c")).as("load"))
      .agg(max(col("load")).as("max_load16"), min(col("load")).as("min_load16"))
    base.agg(
        sum(col("c")).as("n"),
        sum(expr("c * mod_moved")).as("moved_mod"),
        sum(expr("CASE WHEN s16 <> s17 THEN c ELSE 0L END")).as("moved_rdv"),
        sum(expr("CASE WHEN s16 <> s17 AND s17 <> 16 THEN c ELSE 0L END"))
          .as("illegal_moves"))
      .crossJoin(broadcast(loads))
      .withColumn("rdv_moved_ppm", expr("moved_rdv * 1000000 DIV n"))
  }
}
