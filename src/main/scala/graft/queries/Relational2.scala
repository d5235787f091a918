package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** q19–q34: windows, top-k, set ops, scalar function families.
  *
  * Window queries shuffle once on the partition key and sort within
  * partitions — at 100 TB the per-user partitions are small (≈66 events/user)
  * so no single window partition can blow an executor.
  */
object Relational2 {
  private val dec = DecimalType(18, 2)

  /** q19: rank + dense_rank. */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
              // long, not Spark's native int32: dtype parity with DuckDB's
              // BIGINT window functions (output-type protocol)
              rank().over(w).cast(LongType).as("rnk"),
              dense_rank().over(w).cast(LongType).as("drnk"))
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** q20: top-3 per group via row_number — the grouped-top-k idiom that
    * avoids a global sort. */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              row_number().over(w).cast(LongType).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** q21: lag-based inter-event gap in epoch µs (timestamps never leave the
    * engine raw — §7.4.5). */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
              (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .orderBy("user_id", "ts", "event_id")
      .drop("ts")
  }

  /** q22: moving decimal sum over a ROWS frame — summed exact as decimal,
    * output as `round(…,2).cast(double)` per the output-type protocol
    * (Relational1 Scaladoc): DECIMAL reprs differ across engines. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
              graft.engine.OutTypes.money(sum(col("value").cast(dec)).over(w)).as("mov"))
      .orderBy("user_id", "ts", "event_id")
      .drop("ts")
  }

  /** q23: trailing-1h count over a RANGE frame on exact epoch µs (events.ts
    * has fractional seconds, so second-granularity epochs would diverge
    * between engines — µs is exact on both). */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"), col("us"),
              count(lit(1)).over(w).as("cnt_1h"))
      .orderBy("user_id", "us", "event_id")
      .drop("us")
  }

  /** q24: global top-100 — Catalyst plans TakeOrderedAndProject (per-partition
    * top-k then merge), never a full global sort. */
  def q24(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
              col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** q25: tagged UNION ALL — no shuffle at all, just concatenated scans. */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(lit("c").as("src"), col("c_custkey").as("k"),
              col("c_name").as("name"), col("c_acctbal").as("bal"))
    val s = Tables.supplier(spark, dir)
      .select(lit("s").as("src"), col("s_suppkey").as("k"),
              col("s_name").as("name"), col("s_acctbal").as("bal"))
    c.unionByName(s).orderBy("src", "k")
  }

  /** q26: INTERSECT (distinct semantics on both engines). */
  def q26(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").cast(LongType).as("nk"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").cast(LongType).as("nk")))
      .orderBy("nk")

  /** q27: EXCEPT with the supplier side restricted (unrestricted EXCEPT is
    * empty at sf≥0.01 — FIXTURES.md §2). */
  def q27(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").cast(LongType).as("nk"))
      .except(Tables.supplier(spark, dir).filter(col("s_suppkey") < 20)
        .select(col("s_nationkey").cast(LongType).as("nk")))
      .orderBy("nk")

  /** x117: INTERSECT ALL / EXCEPT ALL — the MULTISET set operations q26/q27
    * (distinct semantics) don't cover: per user, how many click events are
    * matched one-for-one by purchase events (`intersectAll` keeps
    * min(multiplicities)) and how many clicks remain after cancelling
    * purchases one-for-one (`exceptAll` keeps the excess). Multiset algebra
    * is how event-stream reconciliation counts unmatched occurrences, not
    * just unmatched keys.
    *
    * 100 TB: Catalyst rewrites both operators to a keyed count aggregate +
    * replication generate — two map-side-combined shuffles on user_id,
    * never a row-by-row comparison; the final stitch is x115's full-outer
    * SMJ over two already-|users|-sized sides. */
  def x117(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click").select("user_id")
    val purchases = e.filter(col("event_type") === "purchase").select("user_id")
    val matched = clicks.intersectAll(purchases)
      .groupBy("user_id").agg(count(lit(1)).as("n_matched"))
    val excess = clicks.exceptAll(purchases)
      .groupBy("user_id").agg(count(lit(1)).as("n_excess"))
    matched.join(excess, Seq("user_id"), "full_outer")
      .select(col("user_id"),
              coalesce(col("n_matched"), lit(0L)).as("n_matched"),
              coalesce(col("n_excess"), lit(0L)).as("n_excess"))
      .orderBy("user_id")
  }

  /** q28: string function family — all codegen'd built-ins, zero UDFs. */
  def q28(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").like("%bolt%"))
      .select(col("p_partkey"),
              upper(col("p_brand")).as("ub"),
              lower(col("p_type")).as("lt"),
              substring(col("p_name"), 1, 8).as("sub"),
              length(col("p_name")).cast(LongType).as("ln"),
              trim(concat(col("p_brand"), lit(" "), col("p_type"))).as("cc"),
              regexp_replace(col("p_type"), lit(" "), lit("_")).as("rep"),
              lpad(col("p_partkey").cast(StringType), 8, "0").as("pad"),
              regexp_extract(col("p_name"), "^([a-z]+)", 1).as("rx"))
      .orderBy("p_partkey")

  /** q29: datetime function family; outputs are epoch-µs BIGINT only. */
  def q29(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
              year(col("o_orderdate")).cast(LongType).as("y"),
              month(col("o_orderdate")).cast(LongType).as("m"),
              dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
              unix_micros(date_trunc("month", col("o_orderdate"))).as("mon_us"),
              datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType))
                .cast(LongType).as("dsince"),
              unix_micros(date_add(to_date(col("o_orderdate")), 30).cast(TimestampType))
                .as("plus30_us"))
      .orderBy("o_orderkey")

  /** q30: math function family, rounded 6dp. */
  def q30(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
              round(abs(col("l_discount") - 0.05), 6).as("a"),
              ceil(col("l_quantity")).cast(LongType).as("c"),
              floor(col("l_quantity")).cast(LongType).as("f"),
              round(sqrt(col("l_extendedprice")), 6).as("sq"),
              round(log(col("l_extendedprice")), 6).as("lg"),
              round(pow(col("l_tax") + 1, 2), 6).as("pw"),
              (col("l_orderkey") % 7).cast(LongType).as("md"))
      .orderBy("l_orderkey", "l_linenumber", "a", "c", "f", "sq", "lg", "pw", "md")

  /** q31: conditional family over left-join nulls. */
  def q31(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"), "left_outer")
      .select(col("c_custkey"),
              when(col("o_orderkey").isNull, "none")
                .when(col("o_totalprice") > 200000, "big")
                .otherwise("small").as("bucket"),
              coalesce(col("o_totalprice"), lit(0.0)).as("tp"),
              when(col("c_mktsegment") === "BUILDING", lit(null).cast(StringType))
                .otherwise(col("c_mktsegment")).as("seg"),
              least(col("c_acctbal"), coalesce(col("o_totalprice"), lit(1e18))).as("lo"),
              greatest(col("c_acctbal"), coalesce(col("o_totalprice"), lit(-1e18))).as("hi"),
              coalesce(col("o_orderkey"), lit(-1L)).as("ord"))
      .orderBy("c_custkey", "ord")
      .drop("ord")

  /** q32: JSON extraction — `props` is a JSON string column. */
  def q32(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((get_json_object(col("props"), "$.k").cast(IntegerType) % 10)
        .cast(LongType).as("kmod"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("kmod")

  /** q33: array function family over the 64-dim embedding column. The
    * transform/slice work happens on the array, but the OUTPUT columns are
    * scalars (h2–h4 extracted from the sliced array): array-typed output
    * columns crash the driver comparator's pandas sort (unhashable ndarray),
    * so arrays never leave a query — output-type protocol, Relational1. */
  def q33(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("head4", transform(slice(col("embedding"), 1, 4),
                                     x => round(x.cast(DoubleType), 6)))
      .select(col("vec_id"),
              size(col("embedding")).cast(LongType).as("sz"),
              round(element_at(col("embedding"), 1).cast(DoubleType), 6).as("first"),
              element_at(col("head4"), 2).as("h2"),
              element_at(col("head4"), 3).as("h3"),
              element_at(col("head4"), 4).as("h4"))
      .orderBy("vec_id")

  /** q34: generator/UDTF — posexplode; 1-based position to match the oracle. */
  def q34(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).cast(LongType).as("pos"),
              round(col("col").cast(DoubleType), 6).as("val"))
      .orderBy("vec_id", "pos")

  /** x124: ORDERED STRING AGGREGATION (LISTAGG/STRING_AGG) — each
    * customer's order keys as one deterministic CSV string. The pipeline
    * use is assembling per-entity token/chunk sequences into a single
    * training record (x32 packs by length; this CONCATENATES in key
    * order). Determinism requires the explicit sort: `collect_list` order
    * is partial-merge-arrival order, so the sort must be on the collected
    * NUMERIC array (a lexicographic string sort would put 10 before 9 —
    * engine-portable but wrong); cast to string only after sorting.
    *
    * 100 TB: one partial+final agg; per-group state is the group's own
    * rows (bounded here by orders-per-customer). An unbounded group needs
    * the two-level chunk pattern — aggregate fixed-size chunks first, then
    * concatenate chunk strings — or x57's chunker upstream. */
  def x124(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
           array_join(
             transform(sort_array(collect_list(col("o_orderkey"))),
                       x => x.cast(StringType)), ",").as("order_keys"))
      .orderBy("o_custkey")
}
