package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** x146–x148: interval / ordered-frame operators — exact sliding median
  * over a bounded frame, same-key interval-overlap pairing, and an SCD2
  * point-in-time lookup (the consumer side of x65's interval builder).
  * All arithmetic integral (cents / days / epoch ordering), so every row
  * hash-matches DuckDB per SURVEY §7.4.
  */
object IntervalOps {

  /** x146: EXACT SLIDING MEDIAN — trailing-7-row median of daily revenue
    * per order priority. Spark has no exact-median window aggregate;
    * the bounded ROWS frame makes one expressible: collect the ≤7-element
    * frame, sort it, and interpolate the middle — O(frame²·log) only in
    * the frame constant, never in the data.
    *
    * 100 TB: the window runs over the (priority, day) AGGREGATE — the
    * events-scale shuffle is the partial+final daily rollup; the window
    * partition is ≤|days| rows per priority, the same bounded-aggregate
    * window discipline PlanSpec pins elsewhere. The median itself stays
    * integral until one final /2.0 (exact: cents sums ≪ 2⁵²). */
  def x146(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"),
               date_trunc("DAY", col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast(LongType))
             .as("rev_cents"))
    val w = Window.partitionBy("priority").orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("arr", array_sort(collect_list(col("rev_cents")).over(w)))
      .withColumn("n", size(col("arr")))
      .withColumn("med_cents", round(
        (expr("element_at(arr, CAST((n + 1) DIV 2 AS INT))") +
         expr("element_at(arr, CAST(n DIV 2 + 1 AS INT))")) / 2.0, 1))
      .select(col("priority"), unix_micros(col("day")).as("day_us"),
              col("rev_cents"), col("n").cast(LongType).as("n_frame"),
              col("med_cents"))
      .orderBy("priority", "day_us")
  }

  /** x147: INTERVAL-OVERLAP PAIRS — same-customer orders whose 30-day
    * fulfillment windows overlap, with total overlap days. The generic
    * interval join Spark lacks, expressed as the keyed special case that
    * scales: an equi-join on the entity key carries the quadratic blow-up
    * only within one key's bounded order set (≤ orders-per-customer², a
    * TPC-H constant ~40² worst case), never across the table.
    *
    * 100 TB: ONE shuffle hashing both sides by custkey; `okey_a < okey_b`
    * halves the pairs and makes them canonical; overlap length in integer
    * days. A key-free interval join would instead tile time (x137's
    * device) — documented here as the unkeyed fallback, not needed for
    * this shape. */
  def x147(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").as("cust"), col("o_orderkey").as("okey"),
      col("o_orderdate").as("ivl_start"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("ivl_end"))
    o.as("a").join(o.as("b"),
        col("a.cust") === col("b.cust") &&
        col("a.okey") < col("b.okey") &&
        col("a.ivl_start") < col("b.ivl_end") &&
        col("b.ivl_start") < col("a.ivl_end"))
      .groupBy(col("a.cust").as("c_custkey"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(datediff(
             least(col("a.ivl_end"), col("b.ivl_end")),
             greatest(col("a.ivl_start"), col("b.ivl_start"))))
             .as("overlap_days"))
      .orderBy("c_custkey")
  }

  /** x148: SCD2 POINT-IN-TIME LOOKUP — "what was this customer's
    * then-current order priority 45 days after each sampled urgent
    * order?". Builds per-customer version intervals in-flight (valid_from
    * = order date, valid_to = next order's date by (date, orderkey) — the
    * x65 construction) and probes them with containment
    * `valid_from <= t < valid_to` (open end ⇒ current version). Ties on
    * date produce zero-length intervals that can contain nothing, so
    * exactly ONE version matches every probe — the lookup is total and
    * deterministic.
    *
    * 100 TB: the version build is a custkey-partitioned window over each
    * customer's bounded order set; the probe join hashes on the same
    * custkey — Catalyst reuses the build's partitioning, so the lookup
    * adds no exchange beyond the probe side's own. The %29 probe sample
    * bounds driver output, not the computation. */
  def x148(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("v_cust")
      .orderBy(col("valid_from"), col("version_key"))
    val versions = o.select(
        col("o_custkey").as("v_cust"), col("o_orderkey").as("version_key"),
        col("o_orderpriority").as("version_priority"),
        col("o_orderdate").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
    val probes = o
      .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderkey") % 29 === 0)
      .select(col("o_custkey").as("p_cust"),
              col("o_orderkey").as("probe_key"),
              (col("o_orderdate") + expr("INTERVAL 45 DAYS")).as("t"))
    probes.join(versions,
        col("p_cust") === col("v_cust") &&
        col("valid_from") <= col("t") &&
        (col("valid_to").isNull || col("t") < col("valid_to")))
      .select(col("probe_key"), col("version_key"), col("version_priority"))
      .orderBy("probe_key")
  }
}
