package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** x173–x175: incremental-maintenance and robust-statistics operators —
  * the partial-aggregate merge behind materialized-view delta refresh,
  * the checksum-guided snapshot diff that row-compares only disagreeing
  * ranges, and a grouped weighted median on the two-phase histogram (no
  * per-group sort). All integer arithmetic → oracle-checked per §7.4.
  */
object Organize4 {

  private def centsCol = round(col("o_totalprice") * 100, 0).cast(LongType)

  /** x173: INCREMENTAL AGGREGATE MERGE — materialized-view delta refresh:
    * the base partition (6/7 of orders) and the delta (1/7) are aggregated
    * SEPARATELY, then merged by re-aggregating the two partial states
    * (count→sum, sum→sum, min→min, max→max). The oracle computes the same
    * statistics in one pass over everything — their equality IS the
    * incremental-maintenance theorem for decomposable aggregates, checked
    * row-by-row by the driver.
    *
    * 100 TB: this is WHY a 100 TB MV refresh costs only the delta: the
    * base's partial state (≤|priorities| rows) persists between refreshes;
    * each refresh aggregates the delta and merges two tiny states. The
    * merge re-agg here is ≤2·|priorities| rows; both branch aggregates
    * partial+final on the same key. (Decomposability has limits — exact
    * count-distinct doesn't merge; x108's HLL is the mergeable stand-in.) */
  def x173(spark: SparkSession, dir: String): DataFrame = {
    def slice(pred: org.apache.spark.sql.Column): DataFrame =
      Tables.orders(spark, dir).filter(pred)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum(centsCol).as("sum_cents"),
             min(centsCol).as("min_cents"), max(centsCol).as("max_cents"))
    val base  = slice(col("o_orderkey") % 7 =!= 0)
    val delta = slice(col("o_orderkey") % 7 === 0)
    base.unionByName(delta)
      .groupBy("o_orderpriority")
      .agg(sum(col("n_orders")).as("n_orders"),
           sum(col("sum_cents")).as("sum_cents"),
           min(col("min_cents")).as("min_cents"),
           max(col("max_cents")).as("max_cents"))
      .orderBy("o_orderpriority")
  }

  /** x174: SNAPSHOT RANGE DIFF — the Merkle protocol end-to-end: snapshot
    * B is A with a deterministic in-flight mutation (+1 cent on every
    * orderkey ≡ 0 mod 97); both sides roll up x172's range checksums; the
    * row-level compare then joins ONLY the ranges whose checksums
    * disagree. Reports each flagged range with its true changed-row
    * count.
    *
    * 100 TB: the checksum pass is one partial+final agg per side; the
    * expensive row-by-row compare is gated by the ≤|flagged| broadcast
    * semi-join — for a 0.1 %-drift replica that's 0.1 % of ranges
    * row-compared instead of the whole table. The +1-cent mutation is
    * the test harness's stand-in for a real replica's drift. */
  def x174(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), centsCol.as("cents"))
    val b = a.withColumn("cents",
      col("cents") + when(col("o_orderkey") % 97 === 0, 1L).otherwise(0L))
    def sums(df: DataFrame): DataFrame = df
      .groupBy(expr("o_orderkey DIV 1000").as("key_range"))
      .agg(sum((col("o_orderkey") % lit(100000000L) * lit(2654435761L) +
                col("o_custkey") * lit(40503L) + col("cents")) %
                 lit(9007199254740881L)).as("cs"))
    val flagged = sums(a).as("ca")
      .join(sums(b).as("cb"), "key_range")
      .filter(col("ca.cs") =!= col("cb.cs"))
      .select("key_range")
    a.as("x").join(b.as("y"), "o_orderkey")
      .filter(col("x.cents") =!= col("y.cents"))
      .join(broadcast(flagged),
            expr("o_orderkey DIV 1000") === col("key_range"), "left_semi")
      .groupBy(expr("o_orderkey DIV 1000").as("key_range"))
      .agg(count(lit(1)).as("n_changed"))
      .orderBy("key_range")
  }

  /** x175: GROUPED WEIGHTED MEDIAN, NO PER-GROUP SORT — per return flag,
    * the lower weighted median of extended price (weight = quantity):
    * the smallest value whose cumulative weight reaches half the group
    * total. x171's two-phase histogram, per group: phase 1 buckets each
    * group into 8192-cent ranges and finds the bucket where the running
    * weight crosses tw/2; phase 2 rescans only those |groups| buckets and
    * reads the crossing value off a bounded per-cent cumulative. The
    * `2·cw ≥ tw` comparison keeps the half exact in integers.
    *
    * 100 TB: the classic "weighted median per key" that defeats
    * window-sort formulations (a hot group = one giant sorted partition);
    * here every window runs over bounded aggregates (≤⌈max/8192⌉ buckets
    * per group; ≤8192 values per selected bucket), and the phase-2 rescan
    * is pruned to one bucket per group. */
  def x175(spark: SparkSession, dir: String): DataFrame = {
    val W = 8192L
    val v = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100, 0).cast(LongType).as("cents"),
      col("l_quantity").cast(LongType).as("w"))
    val h1 = v.groupBy(col("flag"), expr(s"cents DIV $W").as("b"))
      .agg(sum(col("w")).as("bw"))
    val wc = Window.partitionBy("flag").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wt = Window.partitionBy("flag")
    val sel = h1
      .withColumn("before", coalesce(sum(col("bw")).over(wc), lit(0L)))
      .withColumn("tw", sum(col("bw")).over(wt))
      .filter(lit(2L) * col("before") < col("tw") &&
              lit(2L) * (col("before") + col("bw")) >= col("tw"))
      .select(col("flag").as("s_flag"), col("b"),
              col("before").as("bucket_before"), col("tw"))
    val wv = Window.partitionBy("s_flag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    v.join(broadcast(sel),
        col("flag") === col("s_flag") && expr(s"cents DIV $W") === col("b"))
      .groupBy("s_flag", "cents", "bucket_before", "tw")
      .agg(sum(col("w")).as("vw"))
      .withColumn("cw", col("bucket_before") + sum(col("vw")).over(wv))
      .filter(lit(2L) * col("cw") >= col("tw"))
      .groupBy(col("s_flag").as("flag"))
      .agg(max(col("tw")).as("total_weight"),
           min(col("cents")).as("wmed_cents"))
      .orderBy("flag")
  }

  /** x176: EXACT DECILE BOUNDARIES, NO GLOBAL SORT — x171's two-phase
    * histogram generalized to a quantile VECTOR: the nine value-based
    * decile boundaries of order totals (boundary_d = smallest value whose
    * cumulative count reaches ⌈d·n/10⌉). Phase 1 locates the ≤9 buckets
    * any target falls in; phase 2 rescans only those and reads all nine
    * boundaries off one bounded per-value cumulative. Everything BIGINT.
    *
    * 100 TB: one histogram aggregate + one pruned rescan serve ALL nine
    * quantiles (the sort-based form pays a full global sort; the
    * percentile_approx form gives up exactness); the target list and the
    * selected-bucket set are 9-row broadcasts; the only non-equi join is
    * 9 targets against a bounded value aggregate. */
  def x176(spark: SparkSession, dir: String): DataFrame = {
    val W = 4096L
    val c = Tables.orders(spark, dir).select(centsCol.as("cents"))
    val h1 = c.groupBy(expr(s"cents DIV $W").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = h1
      .withColumn("before", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
    val targets = cum.select(col("n")).limit(1)
      .select(explode(sequence(lit(1), lit(9))).as("d"), col("n"))
      .select(col("d").cast(LongType).as("d"),
              expr("(d * n + 9) DIV 10").as("target"))
    val selected = cum.join(broadcast(targets),
        col("before") < col("target") &&
        col("target") <= col("before") + col("cnt"))
      .select("b", "before").distinct()
    val wv = Window.partitionBy("b").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    c.join(broadcast(selected), expr(s"cents DIV $W") === col("b"))
      .groupBy("b", "cents", "before")
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("cum", col("before") + sum(col("vcnt")).over(wv))
      .join(broadcast(targets), col("cum") >= col("target"))
      .groupBy("d")
      .agg(min(col("cents")).as("boundary_cents"),
           min(col("cum")).as("n_at_or_below"))
      .orderBy("d")
  }

  /** x177: PER-CUSTOMER GINI — order-value inequality per customer as an
    * EXACT rational: with each customer's order cents ascending,
    * gini_num = 2·Σi·xᵢ − (n+1)·Σx and gini_den = n·Σx (Gini =
    * num/den). Ties contribute identically under any permutation of
    * equal values (Σi·xᵢ is tie-invariant), so row_number's arbitrary
    * tie order cannot change the output — the reason this window query
    * is oracle-checkable at all.
    *
    * 100 TB: the rank window partitions by customer — bounded per-key
    * order sets (the x65/x148 discipline), so partitions stay small
    * however many customers there are; the rollup rides the same
    * custkey hash. */
  def x177(spark: SparkSession, dir: String): DataFrame = {
    val wr = Window.partitionBy("o_custkey").orderBy("cents")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), centsCol.as("cents"))
      .withColumn("i", row_number().over(wr).cast(LongType))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"),
           (lit(2L) * sum(col("i") * col("cents")) -
            (count(lit(1)) + lit(1L)) * sum(col("cents"))).as("gini_num"),
           (count(lit(1)) * sum(col("cents"))).as("gini_den"))
      .orderBy("o_custkey")
  }

  /** x180: DECILE ASSIGNMENT — score banding: every order labeled with
    * its value decile, rolled up to per-decile counts and mass. The
    * boundaries come from x176's histogram (no sort); the 9-value result
    * is collected to the driver — the same provably-bounded-collect
    * discipline as the Chi rule base — and inlined as a literal array, so
    * the assignment `1 + #{boundaries strictly below}` is branch-free
    * map arithmetic inside whole-stage codegen: NO join, NO window, NO
    * blow-up on the assignment pass.
    *
    * 100 TB: one histogram pass (x176) + one labeling scan with a
    * ≤10-key rollup; the literal array is 72 bytes in the task binary.
    * Equal-count deciles by construction (ties can only fatten a decile
    * that shares its boundary value). */
  def x180(spark: SparkSession, dir: String): DataFrame = {
    val bs = x176(spark, dir).select("boundary_cents")
      .collect().map(_.getLong(0)) // exactly 9 rows — driver-bounded
    Tables.orders(spark, dir)
      .select(centsCol.as("cents"))
      .withColumn("decile", expr(
        s"1L + size(filter(array(${bs.mkString("L,")}L), b -> cents > b))")
        .cast(LongType))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .orderBy("decile")
  }

  /** x292: INCREMENTAL JOIN-VIEW MAINTENANCE — the JOIN half of the IVM
    * algebra x173 started (x173 merges partial AGGREGATES; this maintains
    * an aggregate over a JOIN): the view V = customer ⋈ orders rolled up
    * to (c_mktsegment, n_orders, sum_cents). Because the delta arrives on
    * ONE side only (new orders; the dimension is stable), the exact delta
    * rule is ΔV = Δorders ⋈ customer aggregated — no A⋈ΔB or ΔA⋈ΔB terms
    * — and maintained = merge(V_base, ΔV) by component-wise addition. The
    * IVM correctness theorem (maintained ≡ recomputed-from-scratch, per
    * segment, both measures) is computed as a flag ON the output and
    * recomputed by the oracle — a wrong delta rule cannot hash-match.
    * Delta slice = x173's convention (o_orderkey % 7 = 0).
    *
    * 100 TB: the whole point — the maintain path touches \|Δ\| rows (one
    * broadcast-dim join + one bounded-grid aggregate) instead of
    * re-scanning the fact table; the from-scratch leg exists here only to
    * prove the identity (production would run it as an occasional audit,
    * which is exactly what the flag is). Merge is a ≤\|segments\|-row
    * second-stage rollup. */
  def x292(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment")
    def view(pred: org.apache.spark.sql.Column): DataFrame =
      Tables.orders(spark, dir).filter(pred)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(centsCol).as("sum_cents"))
    val maintained = view(col("o_orderkey") % 7 =!= 0)
      .unionByName(view(col("o_orderkey") % 7 === 0))
      .groupBy("c_mktsegment")
      .agg(sum(col("n_orders")).as("n_orders"),
           sum(col("sum_cents")).as("sum_cents"))
    val scratch = view(lit(true))
      .select(col("c_mktsegment").as("seg"),
              col("n_orders").as("rn"), col("sum_cents").as("rs"))
    maintained.join(scratch, col("c_mktsegment") === col("seg"), "full_outer")
      .select(coalesce(col("c_mktsegment"), col("seg")).as("c_mktsegment"),
              col("n_orders"), col("sum_cents"),
              coalesce(col("n_orders") === col("rn") &&
                       col("sum_cents") === col("rs"), lit(false))
                .as("ivm_ok"))
      .orderBy("c_mktsegment")
  }
}
