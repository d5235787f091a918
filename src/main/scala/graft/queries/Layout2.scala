package graft.queries

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
}
