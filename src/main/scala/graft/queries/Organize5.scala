package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import graft.engine.{Quantiles, Tables}

/** x183/x190/x191: distribution-audit and scoring operators — a Benford
  * first-digit fraud screen, RFM quintile segmentation on the factored
  * two-phase quantile machinery, and an exact rank-sum AUC over a bounded
  * score domain. §7.4 throughout: integers to the end, one pinned double
  * division, ROUND 6.
  */
object Organize5 {

  private def centsCol = round(col("o_totalprice") * 100, 0).cast(LongType)
  // NTZ→instant cast is the identity under the pinned-UTC session TZ
  private def dayCol =
    expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")

  /** x183: BENFORD FIRST-DIGIT AUDIT — distribution of the first
    * significant digit of order totals vs Benford's law, the classic
    * fabricated-data screen. The digit comes from the CENTS BIGINT cast to
    * string (same leading digit as the dollar amount, zero float parsing),
    * and the Benford expectations are pinned 6-dp literals on both engines
    * — computing log10(1+1/d) live would bet the hash compare on two
    * libm's agreeing to the ULP.
    *
    * 100 TB: one ≤9-key partial+final count; the share window runs over
    * that 9-row aggregate. */
  def x183(spark: SparkSession, dir: String): DataFrame = {
    val benford = when(col("digit") === 1, 0.301030)
      .when(col("digit") === 2, 0.176091)
      .when(col("digit") === 3, 0.124939)
      .when(col("digit") === 4, 0.096910)
      .when(col("digit") === 5, 0.079181)
      .when(col("digit") === 6, 0.066947)
      .when(col("digit") === 7, 0.057992)
      .when(col("digit") === 8, 0.051153)
      .otherwise(0.045757)
    val all = Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(centsCol.as("cents")).filter(col("cents") > 0)
      .select(substring(col("cents").cast(StringType), 1, 1)
        .cast(LongType).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(all))
      .select(col("digit"), col("n").as("n_orders"),
        round(col("n").cast(DoubleType) / col("total"), 6).as("share"),
        benford.as("benford"),
        round(col("n").cast(DoubleType) / col("total") - benford, 6)
          .as("excess"))
      .orderBy("digit")
  }

  /** x190: RFM QUINTILE SEGMENTS — classic customer segmentation: per
    * customer, Recency (days from last order to the corpus max day),
    * Frequency (order count), Monetary (lifetime cents); each metric
    * banded into exact quintiles and the (r_q, f_q, m_q) cells rolled up.
    * The quintile boundaries come from [[graft.engine.Quantiles]] — the
    * x176 two-phase histogram, NOT a global NTILE sort — and the ≤4-value
    * boundary vectors inline as literal arrays so the banding pass is
    * branch-free map arithmetic (x180's discipline).
    *
    * 100 TB: one per-customer rollup (partial+final on custkey), a 1-row
    * max-day broadcast stitch, ONE shared multi-metric histogram boundary
    * pass (boundariesMulti) over the PERSISTED customer aggregate, one
    * banding scan with a ≤125-key rollup. No row-scale sort or window
    * anywhere. */
  def x190(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(max(dayCol).as("last_day"), count(lit(1)).as("f_n"),
           sum(centsCol).as("m_cents"))
    val maxd = Tables.orders(spark, dir).agg(max(dayCol).as("md"))
    val rfm = perCust.crossJoin(broadcast(maxd))
      .select(col("o_custkey"), (col("md") - col("last_day")).as("r_days"),
              col("f_n"), col("m_cents"))
      .persist()
    // ONE shared histogram pass for all three metrics (boundariesMulti):
    // the stacked (metric, value) fan-out is map-side over the persisted
    // per-customer aggregate; the three single-metric runs this replaces
    // were 3 collects + 6 jobs — the slowest key in the round-8 bench.
    val bs = Quantiles.boundaryArrays(
      rfm.selectExpr("stack(3, 'r', r_days, 'f', f_n, 'm', m_cents) AS (g, v)"),
      Map("r" -> 64L, "f" -> 4L, "m" -> 65536L), 5)
    val (rB, fB, mB) = (bs("r"), bs("f"), bs("m"))
    def band(c: String, bs: Array[Long]) =
      expr(s"1L + size(filter(array(${bs.mkString("L,")}L), b -> $c > b))")
        .cast(LongType)
    val out = rfm
      .select(band("r_days", rB).as("r_q"), band("f_n", fB).as("f_q"),
              band("m_cents", mB).as("m_q"), col("m_cents"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).as("n_customers"), sum(col("m_cents")).as("sum_m_cents"))
      .orderBy("r_q", "f_q", "m_q")
      .materialized
    rfm.unpersist()
    out
  }

  /** x191: EXACT AUC BY RANK-SUM — the Mann-Whitney identity
    * AUC = P(score⁺ > score⁻) + ½·P(=), computed WITHOUT a global rank:
    * the score domain (p_size, 50 values) is aggregated to per-value
    * (n_pos, n_neg) and the statistic read off a cumulative over that
    * bounded domain — 2·U = Σ_v n_pos(v)·(2·cum_neg(<v) + n_neg(v)), all
    * BIGINT, ties handled exactly by the middle term. Label: retail price
    * ≥ $910.00 (chosen inside every sf's price range, so both classes
    * are populated at every scale — sf0.001 tops out at $919.90). Output is the one-row
    * (n_pos, n_neg, num, den, AUC) certificate.
    *
    * 100 TB: this is how AUC scales — a global RANK over rows is a global
    * sort; over a bounded score domain the whole statistic is one
    * ≤50-key partial+final aggregate plus a 50-row window. (For
    * continuous scores, band first — x180/x190 — and this becomes the
    * banded AUC.) */
  def x191(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.part(spark, dir)
      .select(col("p_size").cast(LongType).as("s"),
        when(round(col("p_retailprice") * 100, 0).cast(LongType) >= 91000L,
             1L).otherwise(0L).as("pos"))
      .groupBy("s")
      .agg(sum(col("pos")).as("np"),
           (count(lit(1)) - sum(col("pos"))).as("nn_neg"))
    val wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cnl", coalesce(sum(col("nn_neg")).over(wc), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn_neg")).as("n_neg"),
           sum(col("np") * (lit(2L) * col("cnl") + col("nn_neg")))
             .as("auc_num"))
      .select(col("n_pos"), col("n_neg"), col("auc_num"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("auc_den"),
        round(col("auc_num").cast(DoubleType) /
              (lit(2L) * col("n_pos") * col("n_neg")).cast(DoubleType), 6)
          .as("auc"))
  }

  /** x193: DATA-SKIPPING LAYOUT COMPARISON — the zone-map payoff audit
    * completing x150: the same lineitem rows tiled three ways (256 tiles
    * each) — by Morton/z-order key, by a single-column partkey sort, and
    * by arrival order — then two predicates (a 2-D px×py box and a
    * py-only range) evaluated against each layout's per-tile min/max zone
    * map. Reports tiles/rows skippable per (layout, query): z-order skips
    * on BOTH dimensions (~98%/87% at sf0.01), single-column sort only on
    * its own column (87%/0%), arrival order on neither (0%/0%) — the
    * measured argument for clustering 100 TB tables.
    *
    * 100 TB: quantization + tile keys are per-row map arithmetic on the
    * scan ([[graft.engine.ZOrder.zExpr]] portable div/mod); each layout is
    * one partial+final aggregate to ≤256 zone-map rows; the skip
    * evaluation runs entirely over those bounded rows. */
  def x193(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val m = Tables.lineitem(spark, dir)
      .agg(max("l_partkey").as("maxp"), max("l_suppkey").as("maxs"),
           max("l_orderkey").as("maxo"))
    val q = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_orderkey")
      .crossJoin(broadcast(m))
      .select(expr("(l_partkey * 256) DIV (maxp + 1)").as("px"),
              expr("(l_suppkey * 256) DIV (maxs + 1)").as("py"),
              expr("(l_orderkey * 256) DIV (maxo + 1)").as("ta"))
      .withColumn("tz",
        expr(s"(${graft.engine.ZOrder.zExpr("px", "py", "DIV")}) DIV 256"))
    def tiles(layout: String, tile: Column): DataFrame =
      q.groupBy(tile.as("tile"))
        .agg(count(lit(1)).as("n"),
             min("px").as("minpx"), max("px").as("maxpx"),
             min("py").as("minpy"), max("py").as("maxpy"))
        .withColumn("layout", lit(layout))
    val t = tiles("zorder", col("tz"))
      .unionByName(tiles("px_sort", col("px")))
      .unionByName(tiles("arrival", col("ta")))
    val boxSkip = col("maxpx") < 64 || col("minpx") >= 96 ||
                  col("maxpy") < 64 || col("minpy") >= 96
    val pySkip = col("maxpy") < 64 || col("minpy") >= 96
    def flag(qname: String, skip: Column): DataFrame =
      t.select(col("layout"), lit(qname).as("query"), col("n"),
               when(skip, lit(1L)).otherwise(lit(0L)).as("skip"))
    flag("box", boxSkip).unionByName(flag("py_only", pySkip))
      .groupBy("layout", "query")
      .agg(count(lit(1)).as("n_tiles"), sum(col("skip")).as("n_skip_tiles"),
           sum(when(col("skip") === 1, col("n")).otherwise(0L))
             .as("rows_skipped"),
           sum(col("n")).as("rows_total"))
      .withColumn("skip_ppm", expr("rows_skipped * 1000000 DIV rows_total"))
      .orderBy("layout", "query")
  }
}
