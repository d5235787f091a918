package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.engine.Tables

/** x184–x187: time-series analytics over the order history — day-of-week
  * seasonality, calendar-aligned autocorrelation, an integer-exact
  * truncated EWMA, and per-region linear gap-fill interpolation. All
  * statistics follow §7.4: counts/cents stay BIGINT to the end; each query
  * performs its double divisions in one pinned order and ROUND(…, 6)s the
  * result, so the oracle hash cannot drift.
  */
object Timeseries {

  /** Calendar day as epoch days — BIGINT on both engines
    * (`unix_micros DIV 86400000000` here, `epoch_us // 86400000000` in the
    * oracle; order dates are non-negative so trunc-vs-floor agree). */
  private def dayCol =
    expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
  private def centsCol = round(col("o_totalprice") * 100, 0).cast(LongType)

  /** x184: DAY-OF-WEEK SEASONALITY INDEX — for each (order priority, ISO
    * weekday): observed order count vs the count expected if priority and
    * weekday were independent, as the lift ratio
    * (n·total)/(n_priority·n_dow). The classic seasonal-index /
    * independence-lift audit behind "do urgent orders cluster on
    * Mondays?". The ratio is formed from four exact BIGINTs with ONE
    * double division, then ROUND 6.
    *
    * ISO weekday portability: Spark's dayofweek is 1=Sunday, the oracle's
    * isodow is 1=Monday — `((dayofweek+5) % 7) + 1` re-bases Spark onto
    * ISO so both engines bucket identically.
    *
    * 100 TB: one partial+final count on a ≤|priorities|·7-key grid; the
    * three marginal windows all run over that ≤35-row aggregate. */
  def x184(spark: SparkSession, dir: String): DataFrame = {
    val dow = (((dayofweek(col("o_orderdate")) + lit(5)) % lit(7)) + lit(1))
      .cast(LongType)
    val g = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), dow.as("dow"))
      .groupBy("priority", "dow")
      .agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
    g.withColumn("np", sum(col("n")).over(Window.partitionBy("priority")))
      .withColumn("nd", sum(col("n")).over(Window.partitionBy("dow")))
      .withColumn("nt", sum(col("n")).over(all))
      .select(col("priority"), col("dow"), col("n").as("n_orders"),
        round((col("n") * col("nt")).cast(DoubleType) /
              (col("np") * col("nd")).cast(DoubleType), 6).as("seasonal_idx"))
      .orderBy("priority", "dow")
  }

  /** x185: DAILY-SERIES AUTOCORRELATION — Pearson r between the daily
    * order-count series and itself shifted by 1..7 CALENDAR days (join on
    * day+lag, so month-boundary gaps align honestly rather than by row
    * position). r is assembled from six exact integer sums per lag; the
    * only doubles are the final `num / (√d1 · √d2)` — the two sqrt factors
    * kept separate because d1·d2 could overflow even wide integers while
    * each factor alone cannot.
    *
    * Overflow headroom (the x186 discipline): with |days| calendar-bounded
    * (~2 500) and daily counts up to c, sxy ≤ days·c² and the Pearson term
    * n_pairs·sxy ≤ days²·c². int64 (9.2×10¹⁸) would cap c at ~1.2×10⁶/day
    * — EXCEEDED at 100 TB (TPC-H sf100k ≈ 6×10⁷ orders/day). The sums and
    * cross-terms therefore ride DECIMAL(38,0) (10³⁸ headroom → c up to
    * ~4×10¹⁵/day); both engines compute the identical exact integer, and
    * the single cast-to-double happens once at the division.
    *
    * 100 TB: the daily rollup is one partial+final count (≤|days| rows);
    * the 7 lags EXPLODE from each aggregate row map-side (no lag-table
    * join), and the shifted self-join is keyed on (day+lag) over the
    * bounded aggregate — never over raw orders. */
  def x185(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(dayCol.as("d")).agg(count(lit(1)).as("x"))
    val a = daily.select(col("d"), col("x").as("xa"),
      explode(sequence(lit(1L), lit(7L))).as("lag_days"))
    val p = a.join(daily.select(col("d").as("db"), col("x").as("xb")),
                   col("db") === col("d") + col("lag_days"))
    val dec = DecimalType(38, 0)
    p.groupBy("lag_days")
      .agg(count(lit(1)).as("n_pairs"),
           sum(col("xa").cast(dec)).as("sx"), sum(col("xb").cast(dec)).as("sy"),
           sum(col("xa").cast(dec) * col("xb")).as("sxy"),
           sum(col("xa").cast(dec) * col("xa")).as("sxx"),
           sum(col("xb").cast(dec) * col("xb")).as("syy"))
      .select(col("lag_days"), col("n_pairs"),
        round((col("n_pairs").cast(dec) * col("sxy") - col("sx") * col("sy"))
                .cast(DoubleType) /
              (sqrt((col("n_pairs").cast(dec) * col("sxx")
                       - col("sx") * col("sx")).cast(DoubleType)) *
               sqrt((col("n_pairs").cast(dec) * col("syy")
                       - col("sy") * col("sy")).cast(DoubleType))), 6)
          .as("acorr"))
      .orderBy("lag_days")
  }

  /** x186: TRUNCATED EWMA, INTEGER WEIGHTS — 8-term exponential smoothing
    * of daily revenue with decay 3/4: weight_k = 3^k·4^(7−k) (the common
    * denominator 4^7 cleared), so num and den are exact BIGINTs and the
    * smoothing cannot drift the way a float exp(−λΔt) recurrence would
    * (x153 solved the same problem with powers of two; here the truncation
    * makes an arbitrary rational decay exact). Missing leading terms drop
    * out of BOTH num and den, so the head of the series is a properly
    * renormalized partial average, not a zero-padded one.
    *
    * 100 TB: one partial+final daily rollup; the 8 LAGs ride one ordered
    * window over the ≤|days|-row aggregate — never over raw orders. */
  def x186(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(dayCol.as("d")).agg(sum(centsCol).as("rc"))
    val w = Window.orderBy("d")
    val ws = Array(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, 2916L, 2187L)
    val lagged = daily.select(
      (col("d") +: col("rc") +:
        (1 to 7).map(k => lag(col("rc"), k).over(w).as(s"r$k"))): _*)
    val num = (1 to 7).foldLeft(lit(ws(0)) * col("rc")) { (acc, k) =>
      acc + lit(ws(k)) * coalesce(col(s"r$k"), lit(0L)) }
    val den = (1 to 7).foldLeft(lit(ws(0))) { (acc, k) =>
      acc + when(col(s"r$k").isNull, lit(0L)).otherwise(lit(ws(k))) }
    // the 6-dp rounding happens in EXACT integer arithmetic — half-up micros
    // = (2·num·10⁴ + den) DIV (2·den) — because a double ROUND(num/den/100, 6)
    // diverged between engines on ONE sf0.1 row whose quotient landed within
    // an ulp of a .5·10⁻⁶ boundary (Spark rounds the shortest decimal
    // representation, DuckDB rounds float-side). num·2·10⁴ stays under int64
    // below ~4·10¹⁴ summed daily cents — about 10⁵× the sf0.1 volume.
    lagged.select(col("d").as("day"), col("rc").as("revenue_cents"),
        num.as("num"), den.as("den"))
      .withColumn("micros", expr("(num * 20000 + den) DIV (den * 2)"))
      .select(col("day"), col("revenue_cents"),
              (col("micros").cast(DoubleType) / lit(1000000.0)).as("ewma"))
      .orderBy("day")
  }

  /** x187: LINEAR GAP-FILL INTERPOLATION — per-region daily revenue on a
    * per-region date spine (x69's spine + x68's ignore-nulls fill,
    * completed into two-sided interpolation): a day with no orders gets
    * prev + (next−prev)·(d−d_prev)/(d_next−d_prev), the straight line
    * between its observed neighbors. The numerator products are exact
    * BIGINTs; one double division + ROUND 6 per row. Spines start/end at
    * each region's own observed min/max, so every gap day has both
    * neighbors by construction.
    *
    * 100 TB: orders⋈customer is the one fact-sized hash join (nation and
    * region stay broadcast); the daily rollup bounds everything after at
    * |regions|·|days| rows; both fill windows partition by region —
    * bounded per-partition day sets, no global window. */
  def x187(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("r_regionkey").cast(LongType).as("rk"),
              dayCol.as("d"), centsCol.as("cents"))
    val daily = o.groupBy("rk", "d").agg(sum(col("cents")).as("rc"))
    val spine = daily.groupBy("rk")
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(col("rk"), explode(sequence(col("lo"), col("hi"))).as("d"))
    val j = spine.join(
        daily.select(col("rk").as("rk2"), col("d").as("d2"), col("rc")),
        col("rk") === col("rk2") && col("d") === col("d2"), "left")
      .select("rk", "d", "rc")
    val wp = Window.partitionBy("rk").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy("rk").orderBy("d")
      .rowsBetween(0, Window.unboundedFollowing)
    j.withColumn("pc", last(col("rc"), ignoreNulls = true).over(wp))
      .withColumn("pd",
        last(when(col("rc").isNotNull, col("d")), ignoreNulls = true).over(wp))
      .withColumn("nc", first(col("rc"), ignoreNulls = true).over(wn))
      .withColumn("nd",
        first(when(col("rc").isNotNull, col("d")), ignoreNulls = true).over(wn))
      .select(col("rk").as("regionkey"), col("d").as("day"),
        when(col("rc").isNull, lit(1L)).otherwise(lit(0L)).as("is_interp"),
        round(
          when(col("rc").isNotNull, col("rc").cast(DoubleType) / lit(100.0))
            .otherwise((col("pc").cast(DoubleType) +
              ((col("nc") - col("pc")) * (col("d") - col("pd")))
                .cast(DoubleType) /
              (col("nd") - col("pd")).cast(DoubleType)) / lit(100.0)),
          6).as("revenue_interp"))
      .orderBy("regionkey", "day")
  }

  /** x192: INTER-ORDER GAP QUANTILES — customer-lifecycle cadence: the
    * day gaps between each customer's consecutive orders, summarized as
    * (count, exact p50, exact p90, 6-dp mean). The purchase-cadence
    * statistic behind churn models and reorder-window tuning. ONE
    * [[graft.engine.Quantiles]] q=10 histogram run serves BOTH quantiles
    * (p50 = d5, p90 = d9 of the same boundary vector); the mean divides
    * two exact BIGINTs once.
    *
    * 100 TB: the gap window partitions by customer — bounded per-key order
    * sets (x65/x148/x177 discipline), no global sort; the quantile
    * machinery is the x171/x176 two-phase histogram (one bucket aggregate
    * + one pruned rescan), so the summary never sorts the gap population
    * either. */
  def x192(spark: SparkSession, dir: String): DataFrame = {
    val wd = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    def gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), dayCol.as("d"), col("o_orderkey"))
      .withColumn("gap", col("d") - lag(col("d"), 1).over(wd))
      .filter(col("gap").isNotNull)
      .select(col("gap").as("v"))
    val bs = graft.engine.Quantiles.boundaries(gaps, 16L, 10)
      .groupBy()
      .agg(max(when(col("d") === 5, col("boundary"))).as("p50_gap_days"),
           max(when(col("d") === 9, col("boundary"))).as("p90_gap_days"))
    gaps.agg(count(lit(1)).as("n_gaps"), sum(col("v")).as("s"))
      .crossJoin(broadcast(bs))
      .select(col("n_gaps"), col("p50_gap_days"), col("p90_gap_days"),
        round(col("s").cast(DoubleType) / col("n_gaps"), 6)
          .as("mean_gap_days"))
  }

  /** x195: SEASONAL DECOMPOSITION — the classical trend/seasonal/residual
    * split of the daily order-count series: trend = 7-row centered moving
    * average; seasonal = per-ISO-weekday mean of the detrended series;
    * residual = what's left. Exactness trick: the detrended value
    * x − s7/c7 is carried as the INTEGER (x·c7 − s7)·(420 DIV c7) — 420
    * is lcm(4..7), the only window sizes a 7-row centered window can have
    * — so the seasonal mean aggregates exact BIGINTs and every reported
    * double comes from pinned-order divisions + ROUND 6. The weekday
    * comes from pure epoch-day arithmetic (`((d+3) % 7)+1`; day 0 is a
    * Thursday), no date functions to disagree across engines.
    *
    * 100 TB: one daily partial+final count; the MA window and the 7-row
    * seasonal join run over that bounded aggregate; the seasonal table is
    * a 7-row broadcast. */
  def x195(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(dayCol.as("d")).agg(count(lit(1)).as("x"))
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val det = daily
      .withColumn("s7", sum(col("x")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("dow", (col("d") + 3) % 7 + 1)
      .withColumn("det420", expr("(x * c7 - s7) * (420 DIV c7)"))
    val s = det.groupBy("dow")
      .agg(sum(col("det420")).as("sd"), count(lit(1)).as("nd"))
    det.join(broadcast(s), "dow")
      .select(col("d").as("day"), col("x").as("n_orders"),
        round(col("s7").cast(DoubleType) / col("c7"), 6).as("trend"),
        round(col("sd").cast(DoubleType) / (lit(420L) * col("nd")), 6)
          .as("seasonal"),
        round(col("x") - col("s7").cast(DoubleType) / col("c7") -
              col("sd").cast(DoubleType) / (lit(420L) * col("nd")), 6)
          .as("residual"))
      .orderBy("day")
  }

  /** x258: SAX MOTIF DISCOVERY — the symbolic time-series technique (Lin
    * et al.'s Symbolic Aggregate approXimation) the analytics family
    * lacked: each active user's last-8-day spend series is PAA-compressed
    * to 4 two-day segment sums (exact cents, zero-filled), each segment
    * quantized to a quartile symbol a–d against the GLOBAL segment-sum
    * distribution (exact order-statistic breakpoints b_i = the
    * ⌈i·N/4⌉-th smallest — x176's two-phase histogram, no sort), and the
    * 4-symbol words counted across users: repeated words ARE the motifs
    * ("spend-shape clusters") a behavioral pipeline feeds downstream.
    * Everything integer/string-exact — the classic SAX Gaussian
    * breakpoints are replaced by exact empirical quartiles precisely so
    * the oracle can replay bit-for-bit.
    *
    * 100 TB: one (user, seg)-keyed aggregate with in-map CASE zero-fill
    * (no calendar spine join); the breakpoint histogram runs on the
    * 4·|users|-row aggregate (two passes, windows only over bounded
    * bucket frames); symbols and words are map arithmetic under a 3-value
    * broadcast; the motif rollup is word-keyed (≤4⁴ groups). */
  def x258(spark: SparkSession, dir: String): DataFrame = {
    val W = 4096L
    val e = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
              expr("CAST(round(value * 100, 0) AS BIGINT)").as("c"))
    val maxd = e.agg(max(col("day")).as("maxd"))
    val segs = e.crossJoin(broadcast(maxd))
      .filter(expr("day > maxd - 8"))
      .withColumn("seg", expr("datediff(maxd, day) DIV 2"))
      .groupBy("user_id")
      .agg(coalesce(sum(when(col("seg") === 0, col("c"))), lit(0L)).as("s0"),
           (1 until 4).map(i =>
             coalesce(sum(when(col("seg") === i, col("c"))), lit(0L))
               .as(s"s$i")): _*)
      .materialized // bounded by |active users|; 3 consumers
    val vals = segs.selectExpr("stack(4, s0, s1, s2, s3) AS (v)")
    // x176's two-phase exact order statistic for the 3 quartile targets
    val h1 = vals.groupBy(expr(s"v DIV $W").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = h1
      .withColumn("before", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
    val targets = cum.select(col("n")).limit(1)
      .select(explode(sequence(lit(1), lit(3))).as("i"), col("n"))
      .select(col("i").cast(LongType).as("i"),
              expr("(i * n + 3) DIV 4").as("target"))
    val selected = cum.join(broadcast(targets),
        col("before") < col("target") &&
        col("target") <= col("before") + col("cnt"))
      .select("b", "before").distinct()
    val wv = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val bounds = vals.join(broadcast(selected), expr(s"v DIV $W") === col("b"))
      .groupBy("b", "v", "before")
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("cum", col("before") + sum(col("vcnt")).over(wv))
      .join(broadcast(targets), col("cum") >= col("target"))
      .groupBy("i").agg(min(col("v")).as("bv"))
      .agg(max(when(col("i") === 1, col("bv"))).as("b1"),
           max(when(col("i") === 2, col("bv"))).as("b2"),
           max(when(col("i") === 3, col("bv"))).as("b3"))
    def sym(c: String) =
      s"CASE WHEN $c <= b1 THEN 'a' WHEN $c <= b2 THEN 'b' " +
        s"WHEN $c <= b3 THEN 'c' ELSE 'd' END"
    segs.crossJoin(broadcast(bounds))
      .withColumn("word", expr(
        s"concat(${sym("s0")}, ${sym("s1")}, ${sym("s2")}, ${sym("s3")})"))
      .groupBy("word").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("word").asc)
  }
}
