package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** q01–q18: scans, filters, joins, aggregations.
  *
  * Determinism protocol (SURVEY.md §7.4): every query ends in a total ORDER BY;
  * money-like doubles are summed as DECIMAL(18,2) (exact, order-independent);
  * counts are BIGINT. Scale notes per query explain why the plan survives a
  * 1000-executor / 100 TB deployment.
  *
  * Output-type protocol (§7.4 addendum, round 2): DECIMAL never leaves a
  * query. The sums stay decimal INTERNALLY (exact, order-independent), but the
  * final projection is `round(dec, 2).cast(double)` mirrored by
  * `CAST(ROUND(…, 2) AS DOUBLE)` in the oracle — engines render decimals with
  * different scales/trailing zeros (Spark dec(28,2) vs DuckDB dec(38,2)) and
  * the driver hashes the repr, while a scale-2 value cast to double is the
  * same correctly-rounded IEEE value on both. Enforced by OutputContractSpec.
  */
object Relational1 {
  private val dec = DecimalType(18, 2)
  import graft.engine.OutTypes.money

  /** q01: projection + global sort. Scan reads only 4 columns (column pruning
    * reaches the parquet scan); sort is a range-partitioned exchange — scales
    * linearly, no single-node bottleneck. */
  def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
              col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** q02: TPC-H Q6 shape. All three predicates push down to the parquet scan
    * (PushedFilters); single partial+final agg, no shuffle of raw rows. */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
              col("l_shipdate") <  lit("1996-01-01").cast(TimestampType) &&
              col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(money(sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))).as("revenue"))

  /** q03: complex boolean predicate mix; pushes the supported conjuncts down,
    * evaluates the rest in codegen'd Filter. */
  def q03(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter((col("o_orderpriority").isin("1-URGENT", "2-HIGH") ||
               col("o_totalprice").between(50000, 100000)) &&
              !col("o_orderstatus").like("P%"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** q04: fact-fact join on custkey. At 100 TB this is a shuffle join on the
    * join key — partial aggregation after the join keeps the exchange to the
    * 5-row group set. */
  def q04(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), money(sum(col("o_totalprice").cast(dec))).as("total"))
      .orderBy("c_mktsegment")

  /** q05: dimension join. `part` is left UNhinted: unlike nation/region it
    * grows with the scale factor, so the right physical join is a size call —
    * statistics broadcast it while it fits (lineitem never shuffles) and fall
    * back to a partkey-keyed shuffle join when it doesn't. */
  def q05(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"), money(sum(col("l_quantity").cast(dec))).as("qty"))
      .orderBy("p_brand")

  /** q06: left outer join preserving 0-order customers, double aggregation. */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
    perCust.groupBy("n_orders").agg(count(lit(1)).as("n_customers")).orderBy("n_orders")
  }

  /** q07: left semi join — never materializes matched orders, only existence. */
  def q07(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q08: left anti join (o_custkey is non-null in the data, so this matches
    * the oracle's NOT IN exactly). */
  def q08(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q09: equi+range self-join. The equi key (user_id) drives the shuffle;
    * the range predicate is evaluated post-match. AQE skew-join splits hot
    * users at scale. */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // Bucketed range join: a bare user_id equi-join evaluates every same-user
    // pair (6.8M at sf0.1) before the range filter prunes to ~1k. Adding a
    // 10-minute time bucket to the join key bounds candidates to pairs within
    // one window of each other: b_ts ∈ (a_ts, a_ts+10min] implies b's bucket
    // is a's or the next, so the a-side probes exactly those two buckets and
    // each qualifying pair is matched once (on b's own bucket). At 100 TB
    // this turns a per-key quadratic SMJ into a key+bucket-partitioned join
    // whose cost tracks window density, not per-user history length.
    val bk = expr("unix_micros(ts) DIV 600000000")
    val a = e.select(col("user_id"), col("ts").as("a_ts"),
      explode(array(bk, bk + 1)).as("bk"))
    val b = e.select(col("user_id").as("b_uid"), col("ts").as("b_ts"),
      bk.as("b_bk"))
    a.join(b, col("user_id") === col("b_uid") && col("bk") === col("b_bk") &&
              col("b_ts") > col("a_ts") &&
              col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy("user_id").agg(count(lit(1)).as("pairs"))
      .orderBy("user_id")
  }

  /** q10: TPC-H Q5 shape (flagship). nation/region are broadcast; the
    * customer⋈orders⋈lineitem chain shuffles on its keys; Catalyst+AQE pick
    * broadcast vs SMJ per side from runtime stats. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    // Dimension-first join order: the ASIA predicate reaches customer BEFORE
    // the fact joins, so orders/lineitem join traffic shrinks by the region
    // selectivity (~5×) instead of filtering after the fact⋈fact work. Only
    // the genuinely tiny side (nation⋈region) is hint-broadcast. The two
    // fact⋈fact joins are pinned to sort-merge: without table stats Spark's
    // join-size product estimate made LINEITEM the broadcast build side (the
    // one table that can never be built at scale); SMJ on custkey/orderkey is
    // spill-safe, AQE-skew-splittable, and the plan a 1000-executor cluster
    // wants.
    val asiaNations = broadcast(
      Tables.nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    val asiaCust = Tables.customer(spark, dir)
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val asiaOrders = Tables.orders(spark, dir)
      .join(asiaCust.hint("merge"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"))
    Tables.lineitem(spark, dir)
      .join(asiaOrders.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name")
      .agg(money(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))).as("revenue"))
      .orderBy("n_name")
  }

  /** q11: as-of ("latest strictly-earlier click") expressed as equi-join +
    * max — the portable formulation the oracle can mirror; the shuffle is on
    * user_id and the aggregate collapses each purchase to one row. */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
    p.join(c, col("user_id") === col("c_uid") && col("c_ts") < col("p_ts"))
      .groupBy("event_id").agg(max(unix_micros(col("c_ts"))).as("prior_click_us"))
      .orderBy("event_id")
  }

  /** q12: TPC-H Q1 pricing summary — partial+final hash agg; 6 groups means
    * the exchange moves only 6×partitions rows. [M1 minimum slice] */
  def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        money(sum(col("l_quantity").cast(dec))).as("sum_qty"),
        money(sum(col("l_extendedprice").cast(dec))).as("sum_base"),
        money(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))).as("sum_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q13: exact distinct aggregation (expand + two-phase agg under the hood). */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("dcust"), count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  /** q14: rollup with COALESCE-labeled subtotals (no GROUPING() in output —
    * bitmask layouts differ across engines). */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_cust"), money(sum(col("c_acctbal").cast(dec))).as("bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
              coalesce(col("n_name"), lit("ALL")).as("nation"),
              col("n_cust"), col("bal"))
      .orderBy("region", "nation")

  /** q15: cube over the 3×2 flag space. */
  def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("cnt"))
      .orderBy("rf", "ls")

  /** q16: explicit grouping sets via the Dataset API (Spark 4). */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupingSets(Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq()),
                    col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
              coalesce(col("c_nationkey"), lit(-1)).cast(LongType).as("nat"),
              col("cnt"))
      .orderBy("seg", "nat")

  /** q17: HAVING = filter over the aggregate. */
  def q17(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy("p_type").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 20)
      .orderBy("p_type")

  /** q18: statistical aggregates, rounded 4dp (irreducible float — §7.4.2). */
  def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(round(min(col("c_acctbal")).cast(DoubleType), 4).as("mn"),
           round(max(col("c_acctbal")).cast(DoubleType), 4).as("mx"),
           round(avg(col("c_acctbal")).cast(DoubleType), 4).as("av"),
           round(stddev_samp(col("c_acctbal")).cast(DoubleType), 4).as("sd"))
      .orderBy("c_mktsegment")

  /** x125: MULTI-EXISTS CORRELATION (the TPC-H Q21 shape) — suppliers who
    * were the SOLE late shipper of a multi-supplier order: a late line,
    * EXISTS another supplier's line in the same order, NOT EXISTS another
    * supplier's LATE line. The declarative form is one EXISTS plus one NOT
    * EXISTS over the same fact — Spark must turn both into keyed
    * LeftSemi/LeftAnti joins on orderkey (no per-row re-scan), which is
    * the whole point of the operator: three correlated predicates, zero
    * nested loops. "Late" is shipdate > orderdate + 80 days — exact
    * integer day arithmetic on both engines.
    *
    * 100 TB: the late flag rides the one lineitem⋈orders join (orderkey-
    * keyed); semi and anti then REUSE that orderkey partitioning, so the
    * chain is one shuffle lineage, not three; the supplier name join is a
    * dimension join AQE may broadcast. */
  def x125(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
              (datediff(col("l_shipdate"), col("o_orderdate")) > 80).as("late"))
    val late = li.filter(col("late"))
    val multiSupp = late.as("l1")
      .join(li.as("l2"),
            col("l1.ok") === col("l2.ok") && col("l1.sk") =!= col("l2.sk"),
            "left_semi")
    val sole = multiSupp.as("c")
      .join(late.as("l3"),
            col("c.ok") === col("l3.ok") && col("c.sk") =!= col("l3.sk"),
            "left_anti")
    sole.groupBy("sk")
      .agg(countDistinct(col("ok")).as("numwait"))
      .join(Tables.supplier(spark, dir), col("sk") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), col("s_suppkey"))
  }
}
