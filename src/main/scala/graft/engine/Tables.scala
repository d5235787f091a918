package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Schema-checked loaders for the harness parquet tables.
  *
  * One parquet file per table per scale factor at `<sfDir>/<table>.parquet`
  * (schemas verified in FIXTURES.md §1). Loaders are thin on purpose: the
  * parquet scans must stay bare `FileSourceScanExec`s so Catalyst can push
  * filters and prune columns into the scan — at 100 TB the scan is the
  * dominant cost and pushdown is the whole ballgame.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map to
    * TimestampType. Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[Sessions]]), so the raw column arrives as epoch-ns BIGINT; we
    * normalize to µs TimestampType here (`DIV 1000` — exact: the dataset has
    * no sub-µs residue, verified in FIXTURES/this session) so every query
    * downstream sees an ordinary timestamp column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** Round-robin rebalance to one partition per core, for placing in front
    * of stages whose PER-ROW compute dwarfs a row's shuffle cost (interpreted
    * shingle-building HOFs, banded LSH projections, |q|×|c| kernel fan-outs).
    * The harness tables are single-row-group parquet files, so their scans
    * arrive as ONE partition no matter how `maxPartitionBytes` is set —
    * without this, a compute-bound stage pins one core while the other 31
    * idle. At production scale the scan yields many splits and this degrades
    * to a cheap rebalance guarding against coarse or skewed upstream
    * partitioning; the explicit N (not a bare `repartition()`) keeps AQE from
    * coalescing the tiny local partitions back into one.
    *
    * NOT a blanket fix (measured): round-robin repartition local-sorts every
    * row before the exchange (retry determinism), so on codegen'd column
    * algebra that feeds a partial agg (the ML chain, tf-idf, lang-id) the
    * sort+shuffle costs more than the single-task pipeline it replaces —
    * those paths stay unfanned on purpose. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
