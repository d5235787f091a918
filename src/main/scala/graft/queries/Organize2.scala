package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** x165–x169: corpus-governance and catalog operators — exact
  * largest-remainder budget apportionment, bucketed cross-lingual pair
  * candidates, a one-pass table profile, item-item co-purchase
  * recommendation, and CUSUM change detection. All integer arithmetic →
  * oracle-checked per SURVEY §7.4.
  */
object Organize2 {

  /** x165: TOKEN-BUDGET APPORTIONMENT — split a fixed 1 000 000-char
    * sampling budget across sources proportionally to their corpus mass,
    * by the largest-remainder (Hamilton) method: base_i = ⌊B·m_i/M⌋, then
    * the R = B − Σbase leftover units go to the R largest remainders
    * (ties by source name). The curation primitive behind "sample k
    * tokens per source at fixed proportions" — and the allocation sums to
    * EXACTLY B, which per-source rounding never guarantees. All BIGINT:
    * quotas, remainders, and ranks are exact on both engines.
    *
    * 100 TB: the per-source mass rollup is the only corpus-scale work
    * (one partial+final agg); the apportionment itself runs on the
    * ≤|sources| aggregate — the window is over a provably bounded set,
    * and the grand total is a 1-row broadcast stitch. */
  def x165(spark: SparkSession, dir: String): DataFrame = {
    val B = 1000000L
    val mass = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum(col("n_chars").cast(LongType)).as("mass"))
    val tot = mass.agg(sum(col("mass")).as("total"))
    val w = Window.orderBy(col("rem").desc, col("source"))
    mass.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"mass * $B DIV total"))
      .withColumn("rem", expr(s"(mass * $B) % total"))
      .withColumn("rk", row_number().over(w))
      .withColumn("leftover", lit(B) - sum(col("base")).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
      .select(col("source"), col("mass"),
              (col("base") + when(col("rk") <= col("leftover"), 1L)
                               .otherwise(0L)).as("alloc"))
      .orderBy("source")
  }

  /** x166: TRANSLATION-PAIR CANDIDATES — cross-lingual mining's first
    * stage: same-source (en, non-en) document pairs whose lengths differ
    * by ≤25 chars. The quadratic trap is joining on source alone (one hot
    * source = one giant task); the scale path joins on (source,
    * length-bucket) with the probe side exploded to its 3 admissible
    * buckets — |Δ| ≤ 25 < the 128-char bucket width guarantees every
    * qualifying pair lands in exactly ONE (probe-bucket, build-bucket)
    * combination, so the bucketed join is exhaustive without dedup
    * (Round8cSpec pins it against the naive source-only join).
    *
    * 100 TB: the join key (source, bucket) carries the length predicate
    * INTO the shuffle hash — per-task pair volume is bounded by
    * same-source-same-length-band density, not by source size. */
  def x166(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("lang"),
              col("n_chars").cast(LongType).as("n_chars"),
              expr("CAST(n_chars DIV 128 AS BIGINT)").as("bucket"))
    val en = d.filter(col("lang") === "en")
      .withColumn("probe_bucket",
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
      .select(col("source").as("s"), col("doc_id").as("en_doc"),
              col("n_chars").as("en_chars"), col("probe_bucket"))
    val other = d.filter(col("lang") =!= "en")
      .select(col("source"), col("doc_id").as("other_doc"),
              col("lang").as("other_lang"), col("n_chars").as("other_chars"),
              col("bucket"))
    en.join(other,
        col("s") === col("source") && col("probe_bucket") === col("bucket") &&
        abs(col("en_chars") - col("other_chars")) <= 25)
      .select(col("source"), col("en_doc"), col("other_doc"),
              col("other_lang"), col("en_chars"), col("other_chars"))
      .orderBy("source", "en_doc", "other_doc")
  }

  /** x167: TABLE PROFILE — the data-catalog one-liner: per column of
    * `orders` (custkey, total in cents, orderdate in epoch-µs), the
    * non-null count, exact distinct count, min, and max, unpivoted to
    * (col_name, metric, value) long rows. All BIGINT.
    *
    * 100 TB: ONE aggregation pass computes all 12 metrics (the three
    * exact count-distincts expand the scan 3×, map-side, but the shuffle
    * carries only the distinct streams and 1-row partials); the unpivot
    * is a 12-row stack of the single aggregate row. A sketch profile
    * (x15/x108 HLL) is the cheaper cousin when ±2 % distinct error is
    * acceptable — this is the exact one. */
  def x167(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      round(col("o_totalprice") * 100, 0).cast(LongType).as("total_cents"),
      unix_micros(col("o_orderdate")
        .cast(org.apache.spark.sql.types.TimestampType)).as("odate_us"))
    val a = o.agg(
      count(col("o_custkey")).as("c1"),
      count_distinct(col("o_custkey")).as("d1"),
      min(col("o_custkey")).as("mn1"), max(col("o_custkey")).as("mx1"),
      count(col("total_cents")).as("c2"),
      count_distinct(col("total_cents")).as("d2"),
      min(col("total_cents")).as("mn2"), max(col("total_cents")).as("mx2"),
      count(col("odate_us")).as("c3"),
      count_distinct(col("odate_us")).as("d3"),
      min(col("odate_us")).as("mn3"), max(col("odate_us")).as("mx3"))
    a.select(expr(
      """stack(12,
        | 'o_custkey',   'n_nonnull',  c1, 'o_custkey',   'n_distinct', d1,
        | 'o_custkey',   'min',       mn1, 'o_custkey',   'max',       mx1,
        | 'total_cents', 'n_nonnull',  c2, 'total_cents', 'n_distinct', d2,
        | 'total_cents', 'min',       mn2, 'total_cents', 'max',       mx2,
        | 'odate_us',    'n_nonnull',  c3, 'odate_us',    'n_distinct', d3,
        | 'odate_us',    'min',       mn3, 'odate_us',    'max',       mx3
        |) AS (col_name, metric, value)""".stripMargin))
      .orderBy("col_name", "metric")
  }

  /** x168: CO-PURCHASE TOP-1 — "frequently bought together": for every
    * part, the single most co-ordered other part (ties to the smallest
    * partner key). Item-item collaborative filtering's counting core.
    * The argmax is a `max_by` partial aggregate over the pair counts —
    * never a window sort (the oracle's row_number idiom sorts every
    * partition; the engine path ships one row per part).
    *
    * 100 TB: the self-join hashes on l_orderkey once, and the pair
    * blow-up is bounded per order by lineitems-per-order² (a TPC-H
    * constant ~7²) — the same keyed-quadratic discipline as x147; the
    * pair-count rollup and per-part argmax both hash on the part key. */
  def x168(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val pairs = op.as("a")
      .join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part"),
               col("b.l_partkey").as("partner"))
      .agg(count(lit(1)).as("n_orders"))
    pairs.groupBy("part")
      .agg(max_by(struct(col("partner"), col("n_orders")),
                  struct(col("n_orders"), negate(col("partner")))).as("best"))
      .select(col("part"), col("best.partner").as("partner"),
              col("best.n_orders").as("n_orders"))
      .orderBy("part")
  }

  /** x169: CUSUM CHANGE DETECTION — per event type, the cumulative sum of
    * daily-count deviations from that type's own mean, reporting the peak
    * |CUSUM| and the day it peaks (the classic change-point locator: the
    * peak marks where the rate regime shifts). Exact integers throughout:
    * deviation is `cnt·n_days − total` (the mean cleared of division), so
    * the running sum and its argmax cannot drift.
    *
    * 100 TB: the daily rollup is the only event-scale shuffle; the CUSUM
    * window runs over the (type, day) AGGREGATE — calendar-bounded
    * partitions regardless of event volume (the bounded-aggregate window
    * discipline PlanSpec pins); per-type stats are a keyed join of two
    * tiny aggregates. */
  def x169(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
               expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("total"))
    val wSum = Window.partitionBy("event_type").orderBy("day")
    val wRank = Window.partitionBy("event_type")
      .orderBy(abs(col("cusum")).desc, col("day"))
    daily.join(st, "event_type")
      .withColumn("dev", col("cnt") * col("n_days") - col("total"))
      .withColumn("cusum", sum(col("dev")).over(wSum))
      .withColumn("rnk", rank().over(wRank))
      .groupBy("event_type")
      .agg(max(abs(col("cusum"))).as("max_abs_cusum"),
           min(when(col("rnk") === 1, col("day"))).as("argmax_day"))
      .orderBy("event_type")
  }
}
