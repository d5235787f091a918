package graft.engine

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — the scalable replacement for
  * `row_number().over(Window.orderBy(...))`, whose empty partition spec
  * forces EVERY row through one partition (Spark even warns: "No Partition
  * Defined for Window operation"). Fine on 60k rows; dead at 100 TB.
  *
  * The plan here is the classic two-phase zipWithIndex shape, stated in
  * pure DataFrame algebra so Catalyst/AQE keep optimizing it:
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — one
  *      range shuffle; partition i holds a contiguous key range below
  *      partition i+1's.
  *   2. `monotonically_increasing_id()` gives each row
  *      (partition << 33) + local-index in the sorted order; subtracting
  *      the partition's `min(mid)` recovers the LOCAL 0-based rank with no
  *      window at all.
  *   3. Per-partition row counts (one map-side-combined aggregate of
  *      |partitions| rows) prefix-sum into offsets — the one place a
  *      global window IS right, over rows bounded by the shuffle
  *      partition count — and broadcast-join back. No second shuffle of
  *      the data side.
  *
  * global rank = offset(partition) + local rank + 1, identical to the
  * single-partition window's answer whenever `order` is a TOTAL order
  * (callers must include a unique tiebreak column — the same requirement
  * the engine's determinism protocol already imposes on every ORDER BY).
  *
  * Determinism note — the ranged frame is MATERIALIZED (eager
  * `localCheckpoint`) before fan-out, because its two consumers (the data
  * side and the counts side) are only consistent if they read the SAME
  * physical partitioning: `repartitionByRange` samples its boundaries per
  * physical exchange, and when the optimizer does not reuse the exchange
  * the two sides can place a boundary-adjacent row in DIFFERENT
  * partitions — offsets from one read joined to mids from the other then
  * mis-rank every row after the disputed boundary. This was observed for
  * real (round 9): at 4 shuffle partitions, x95's mid-corpus rank drifted
  * by ±100 run-to-run while 32-partition runs passed by exchange-reuse
  * luck. The checkpoint pins one sampled partitioning for both reads; its
  * cost is one extra write of the already-shuffled data to executor-local
  * storage — the price of a correct distributed rank, still nothing like
  * the single-partition window it replaces.
  */
object Ranks {
  /** Appends `out` = the 1-based global row number of `df` under `order`.
    *
    * Caller contract (BOTH required for a deterministic result):
    *   - `order` must be a total order (unique tiebreak column);
    *   - `df`'s lineage must itself be DETERMINISTIC under recomputation.
    *     The two-phase shape reads the ranged exchange twice (data side and
    *     counts side) and relies on both reads recomputing identical
    *     partition assignment and row order; that holds for any
    *     deterministic lineage (deterministic range sampling + exchange
    *     reuse), but an input containing `sample()`, `rand()`, another
    *     `monotonically_increasing_id()`, or a non-idempotent source can
    *     diverge between the two reads and silently mis-rank. Callers with
    *     such inputs must materialize first (`localCheckpoint()`/`persist()`
    *     + count) before ranking. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .materialized // ONE sampled partitioning for both reads (see above)
    val parts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__minmid"))
    val prior = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(prior), lit(0L)))
      .select(col("__pid"), col("__minmid"), col("__off"))
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + (col("__mid") - col("__minmid")) + lit(1L))
      .drop("__pid", "__mid", "__minmid", "__off")
  }

  /** Appends `out` = the running total of `value` over `order` (inclusive of
    * the current row) — the distributed replacement for
    * `sum(value).over(Window.orderBy(order))`, same two-phase shape as
    * [[globalRowNumber]]: range-partition on the order, per-partition
    * LOCAL running totals under a __pid-keyed (never global) window, and
    * each partition's grand total prefix-summed into a broadcast offset.
    * `order` must be a total order for a deterministic result; the ranged
    * frame is materialized for the same double-read reason as
    * [[globalRowNumber]]. */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                      out: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .materialized // ONE sampled partitioning for both reads
    val local = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = ranged.withColumn("__cum", sum(col("__v")).over(local))
    val parts = ranged.groupBy(col("__pid")).agg(sum(col("__v")).as("__tot"))
    val prior = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .withColumn("__off", coalesce(sum(col("__tot")).over(prior), lit(0L)))
      .select(col("__pid"), col("__off"))
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + col("__cum"))
      .drop("__pid", "__v", "__cum", "__off")
  }
}
