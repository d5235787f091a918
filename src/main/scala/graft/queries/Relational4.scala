package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.engine.Tables

/** x155–x164: the remaining classic TPC-H query shapes the inventory
  * lacked — Q3 (top-k priority scan), Q7 (bilateral volume), Q8 (market
  * share), Q9 (product profit), Q14 (promo share), Q15 (top supplier via
  * scalar max), Q16 (supplier-count distinct with exclusion), Q19
  * (disjunctive pushdown), Q4 (EXISTS with non-equi residual), Q11
  * (value-threshold stock) — adapted to the harness schema (no partsupp /
  * shipmode / comment columns; reference behavior per SURVEY §0's public
  * TPC-H spec). Money stays in exact integers end-to-end: revenue is
  * `price_cents · (100 − disc_pct)` — units of 10⁻⁴ dollars, BIGINT on
  * both engines, so no threshold or ordering can flip on float rounding.
  * (Per-row values ≲ 10⁹; a 100 TB run would move these sums to
  * DECIMAL(38,0) — same plan shapes, wider accumulator.)
  */
object Relational4 {

  /** Exact revenue in 10⁻⁴ dollars: cents × remaining-percent, both
    * integers recovered from the 2-dp generator columns. */
  private def revU: org.apache.spark.sql.Column =
    round(col("l_extendedprice") * 100, 0).cast(LongType) *
      (lit(100L) - round(col("l_discount") * 100, 0).cast(LongType))

  /** x155: TPC-H Q3 shape — SHIPPING-PRIORITY TOP-10: revenue still
    * unshipped as of a cutoff for one market segment, per order. The
    * canonical "top-k over a 3-way join" — the tie-free total order
    * (revenue DESC, date, orderkey) makes the limit deterministic.
    *
    * 100 TB: segment prunes customers BEFORE the orders semi-join; both
    * date filters push into the scans; the lineitem↔orders join hashes
    * l_orderkey once; the top-10 is TakeOrderedAndProject — a per-partition
    * k-heap + driver merge of 10·P rows, never a global sort. */
  def x155(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-07-01").cast(TimestampType)
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), revU.as("rev_u"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev_u")).as("revenue_u"))
      .select(col("l_orderkey"),
              unix_micros(col("o_orderdate").cast(TimestampType))
                .as("odate_us"),
              col("o_orderpriority"), col("revenue_u"))
      .orderBy(col("revenue_u").desc, col("odate_us"), col("l_orderkey"))
      .limit(10)
  }

  /** x156: TPC-H Q7 shape — BILATERAL SHIPPING VOLUME between two nations
    * by direction and ship year: supplier-nation → customer-nation revenue
    * for the (NATION_12, NATION_10) pair, either direction, 1996–1997.
    *
    * 100 TB: nation is a broadcast; the supplier dim broadcasts by
    * statistics; the fact pays exactly two hash exchanges — l_orderkey to
    * reach orders, then o_custkey to reach customers — and the 4-row
    * output collapses through partial aggregation before the final. */
  def x156(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1998-01-01").cast(TimestampType))
      .select(col("l_orderkey"), col("l_suppkey"),
              year(col("l_shipdate")).cast(LongType).as("ship_year"),
              revU.as("rev_u"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_12" &&
               col("cust_nation") === "NATION_10") ||
              (col("supp_nation") === "NATION_10" &&
               col("cust_nation") === "NATION_12"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(count(lit(1)).as("n_li"), sum(col("rev_u")).as("revenue_u"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** x157: TPC-H Q8 shape — NATIONAL MARKET SHARE: the fraction of one
    * region's PROMO-part order revenue supplied by NATION_12, per order
    * year. Numerator and denominator stay BIGINT; only the final reported
    * share divides (round 6 — both engines divide the same two exact
    * integers, so the quotient bits agree).
    *
    * 100 TB: parts prune the fact first (the ~1/6 type slice); region
    * membership reaches customers through two broadcast dims; the share
    * is a conditional partial aggregate — numerator and denominator in
    * ONE pass, no second scan, no join of two aggregates. */
  def x157(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val asiaNations = n
      .join(broadcast(Tables.region(spark, dir)
              .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(asiaNations),
            col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    Tables.lineitem(spark, dir)
      .join(promo, col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_suppkey"), revU.as("rev_u"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir)
              .filter(col("o_orderdate") >=
                        lit("1996-01-01").cast(TimestampType) &&
                      col("o_orderdate") <
                        lit("1998-01-01").cast(TimestampType))
              .select(col("o_orderkey"), col("o_custkey"),
                      year(col("o_orderdate")).cast(LongType)
                        .as("order_year")),
            col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("order_year")
      .agg(sum(when(col("supp_nation") === "NATION_12", col("rev_u"))
                 .otherwise(lit(0L))).as("nation_u"),
           sum(col("rev_u")).as("total_u"))
      .withColumn("mkt_share",
        round(col("nation_u").cast("double") / col("total_u"), 6))
      .orderBy("order_year")
  }

  /** x158: TPC-H Q9 shape — PRODUCT-LINE PROFIT by supplier nation and
    * ship year for parts named '…widget'. No partsupp in the harness
    * schema, so supply cost is the part's retail price per unit (the same
    * correlated-cost role): profit_u = rev_u − qty·retail_cents·100,
    * exact BIGINT in 10⁻⁴ dollars — profits can go NEGATIVE, which is the
    * point of the shape (loss-making lines don't vanish, they rank).
    *
    * 100 TB: the name filter prunes parts before the fact join; the part
    * attach broadcasts by statistics; ONE orderless fact aggregation keyed
    * (nation, year) after a broadcast supplier attach — the fact never
    * shuffles on a high-cardinality key at all. */
  def x158(spark: SparkSession, dir: String): DataFrame = {
    val widget = Tables.part(spark, dir)
      .filter(col("p_name").endsWith("widget"))
      .select(col("p_partkey"),
              round(col("p_retailprice") * 100, 0).cast(LongType)
                .as("retail_cents"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(widget, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("supp_nation"),
              year(col("l_shipdate")).cast(LongType).as("ship_year"),
              (revU - col("l_quantity").cast(LongType) *
                 col("retail_cents") * lit(100L)).as("profit_u"))
      .groupBy("supp_nation", "ship_year")
      .agg(count(lit(1)).as("n_li"), sum(col("profit_u")).as("profit_u"))
      .orderBy("supp_nation", "ship_year")
  }

  /** x159: TPC-H Q14 shape — PROMO REVENUE SHARE per ship month: what
    * fraction of each month's revenue came from PROMO-type parts.
    * Numerator/denominator exact BIGINT, one conditional aggregate.
    *
    * 100 TB: the part attach carries only (partkey, is-promo) — a
    * broadcast bitmap, not the dim row; the single fact aggregation keys
    * on ~84 months, so partial aggregation collapses everything map-side;
    * the month boundary is date_trunc on the scan, no join on a calendar
    * spine needed. */
  def x159(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    Tables.lineitem(spark, dir)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .select(unix_micros(date_trunc("MONTH", col("l_shipdate"))
                        .cast(TimestampType)).as("month_us"),
              col("is_promo"), revU.as("rev_u"))
      .groupBy("month_us")
      .agg(sum(when(col("is_promo"), col("rev_u")).otherwise(lit(0L)))
             .as("promo_u"),
           sum(col("rev_u")).as("total_u"))
      .withColumn("promo_share",
        round(col("promo_u").cast("double") / col("total_u"), 6))
      .orderBy("month_us")
  }

  /** x160: TPC-H Q16 shape — SUPPLIER COUNTS per (brand, size) for four
    * sizes, excluding one brand and excluding low-trust suppliers
    * (account balance under $1 000 — the harness stand-in for Q16's complaint
    * filter). COUNT(DISTINCT supplier) after an anti-join.
    *
    * 100 TB: the supplier exclusion is an anti-join against a dim-sized
    * side; the distinct collapses (brand, size, suppkey) BEFORE the count
    * — two partial-aggregated exchanges on bounded keys; lineitem itself
    * is pruned by the part semi-join before its only shuffle. */
  def x160(spark: SparkSession, dir: String): DataFrame = {
    val sized = Tables.part(spark, dir)
      .filter(col("p_size").isin(1, 5, 9, 13) &&
              col("p_brand") =!= "Brand#13")
      .select(col("p_partkey"), col("p_brand"),
              col("p_size").cast(LongType).as("p_size"))
    val deficit = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 1000).select("s_suppkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(sized), col("l_partkey") === col("p_partkey"))
      .join(broadcast(deficit),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select("p_brand", "p_size", "l_suppkey").distinct()
      .groupBy("p_brand", "p_size")
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** x161: TPC-H Q19 shape — DISJUNCTIVE PREDICATE REVENUE: three
    * (brand, size-range, quantity-range) clauses OR-ed together — the
    * classic test that an optimizer pushes a disjunction of conjunctions
    * through a join instead of materializing the cross product.
    *
    * 100 TB: the brand IN-list distributes over the OR and prunes the
    * part scan (PushedFilters carries `In(p_brand, …)`); the residual
    * disjunction evaluates inside the joined codegen stage; output is one
    * row — partial aggregation ships 1 row per task. */
  def x161(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val q = col("l_quantity")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), revU.as("rev_u"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
           q.between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
           q.between(10, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 15) &&
           q.between(20, 30)))
      .agg(count(lit(1)).as("n_li"), sum(col("rev_u")).as("revenue_u"))
  }

  /** x162: TPC-H Q15 shape — TOP SUPPLIER(S) of a quarter: per-supplier
    * revenue, then everyone equal to the scalar max (Q15's "view + max"
    * formulation). The max is a 1-row broadcast stitch — ties all
    * surface, ordered by suppkey.
    *
    * 100 TB: the date filter pushes into the fact scan; ONE per-supplier
    * aggregate (≤|suppliers| rows), and the fact is scanned ONCE — the
    * scalar max rides a global window over that bounded aggregate instead
    * of a second aggregate branch (the cross-joined `agg(max)` form
    * re-scans the fact when exchange reuse doesn't materialize under AQE;
    * the window form can't — PlanSpec pins the single lineitem scan). */
  def x162(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1996-04-01").cast(TimestampType))
      .groupBy("l_suppkey")
      .agg(sum(revU).as("total_u"))
    val w = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    rev.withColumn("max_u", max(col("total_u")).over(w))
      .filter(col("total_u") === col("max_u"))
      .join(Tables.supplier(spark, dir),
            col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey"), col("s_name"), col("total_u"))
      .orderBy("l_suppkey")
  }

  /** x163: TPC-H Q4 shape — ORDER PRIORITY CHECKING: orders of one
    * quarter with at least one SLOW lineitem (shipped >60 days after the
    * order date — the harness's commit/receipt stand-in), counted per
    * priority. The EXISTS is a semi-join whose residual is a NON-EQUI
    * cross-table date comparison.
    *
    * 100 TB: both scans prune on their date columns FIRST (lineitem can't
    * ship 60 days late for a quarter-Q3 order before 1996-09) — then one
    * l_orderkey hash semi-join evaluates the residual inside the join;
    * the per-priority rollup is ≤5 rows after partial aggregation. */
  def x163(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast(TimestampType) &&
              col("o_orderdate") <  lit("1996-10-01").cast(TimestampType))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-08-30").cast(TimestampType))
      .select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** x164: TPC-H Q11 shape — IMPORTANT STOCK: per-part shipped value from
    * one nation's suppliers, keeping parts above 2× the nation's MEAN
    * part value. Q11's literal `> SUM(...) * fraction` is scale-dependent
    * (the spec itself shrinks the fraction by 1/SF); the mean-relative
    * form `value·n_parts > 2·total` keeps the shape AND stays non-vacuous
    * at every scale — still exact BIGINTs on both sides.
    *
    * 100 TB: the nation's suppliers broadcast as a semi-join; ONE
    * per-part aggregate; the scalar total re-aggregates THAT (never
    * rescans the fact) and stitches back as a 1-row broadcast. */
  def x164(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
              .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"),
            "left_semi")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast(LongType) *
               round(col("l_extendedprice") * 100, 0).cast(LongType))
             .as("value_u"))
    val tot = value.agg(sum(col("value_u")).as("total_u"),
                        count(lit(1)).as("n_parts"))
    value.crossJoin(broadcast(tot))
      .filter(col("value_u") * col("n_parts") > col("total_u") * lit(2L))
      .select(col("l_partkey"), col("value_u"))
      .orderBy(col("value_u").desc, col("l_partkey"))
  }

  /** x178: TPC-H Q10 shape — RETURNED-ITEM REPORTING: the top-20
    * customers by revenue lost to returns ('R' lineitems) against orders
    * of one half-year, with nation names. The classic churn-triage query;
    * the limit rides (lost revenue DESC, custkey) — tie-free.
    *
    * 100 TB: the return-flag and date filters push into their scans; ONE
    * l_orderkey hash join, per-customer rollup on the o_custkey hash;
    * customer/nation attach after the aggregate (≤|customers| rows, not
    * fact rows); top-20 is TakeOrderedAndProject. */
  def x178(spark: SparkSession, dir: String): DataFrame = {
    val lost = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revU.as("rev_u"))
      .join(Tables.orders(spark, dir)
              .filter(col("o_orderdate") >=
                        lit("1997-01-01").cast(TimestampType) &&
                      col("o_orderdate") <
                        lit("1997-07-01").cast(TimestampType))
              .select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_li"), sum(col("rev_u")).as("lost_u"))
    lost
      .join(Tables.customer(spark, dir),
            col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
              col("n_li"), col("lost_u"))
      .orderBy(col("lost_u").desc, col("c_custkey"))
      .limit(20)
  }

  /** x179: TPC-H Q12 shape — SHIPPING-DELAY PRIORITY AUDIT: lineitems
    * shipped more than 90 days after their order date, per ship year,
    * split into critical (1-URGENT/2-HIGH) vs other priorities — Q12's
    * "did cheap ship modes delay critical orders" with the harness's
    * delay stand-in (no shipmode/commit/receipt columns).
    *
    * 100 TB: one l_orderkey hash join whose residual is the cross-table
    * date comparison; the split is a conditional partial aggregate over
    * ≤|years| keys — map-side collapse, no second pass. */
  def x179(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
              .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(year(col("l_shipdate")).cast(LongType).as("ship_year"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
                 .otherwise(0L)).as("high_line_count"),
           sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
                 .otherwise(1L)).as("low_line_count"))
      .orderBy("ship_year")
}
