package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** x210–x211: privacy-governance audits over the customer/orders tables —
  * the re-identification-risk half of the corpus-governance family (x116
  * redacts PII from text; these MEASURE how identifying the structured
  * attributes are before a dataset ships). Both are exact relational
  * algebra: k-anonymity (Sweeney) counts equivalence classes of the
  * quasi-identifier tuple; l-diversity (Machanavajjhala et al.) checks
  * that each class carries enough DISTINCT sensitive values that class
  * membership alone does not reveal the sensitive attribute.
  */
object Governance {

  /** The quasi-identifier projection: nation, market segment, and the
    * account balance generalized to 1000-unit bands — the classic
    * "harmless-looking demographic triple" a linkage attack joins on.
    * floor(double/1000) is identical IEEE arithmetic on both engines. */
  private def qi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
              floor(col("c_acctbal") / 1000).cast(LongType).as("bal_band"))

  /** x210: K-ANONYMITY AUDIT — for k ∈ {2, 5, 10, 25}: how many
    * quasi-identifier equivalence classes have fewer than k members, and
    * what share of the population sits in them (= the rows a k-anonymous
    * release would have to suppress or generalize further). Exact
    * integers throughout; the one division (risk share) is a single
    * double op over exact BIGINTs, rounded 6 dp (the x202 device).
    *
    * 100 TB: ONE shuffle — the QI groupBy (partial+final count). The
    * class table then collapses to a class-SIZE histogram whose row count
    * is bounded by the largest class size, and every k-threshold is a
    * conditional sum over that broadcast histogram: the k-sweep costs no
    * second pass over the data, and widening ks is free. */
  def x210(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val classes = qi(spark, dir)
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("sz"))
    val hist = classes.groupBy("sz").agg(count(lit(1)).as("n_cls"))
    val tot = classes.agg(sum(col("sz")).as("n_rows"),
                          count(lit(1)).as("n_classes"))
    Seq(2L, 5L, 10L, 25L).toDF("k")
      .crossJoin(broadcast(hist))
      .groupBy("k")
      .agg(sum(when(col("sz") < col("k"), col("n_cls")).otherwise(0L))
             .as("risky_classes"),
           sum(when(col("sz") < col("k"), col("sz") * col("n_cls"))
             .otherwise(0L)).as("risky_rows"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_classes"), col("risky_classes"),
              col("risky_rows"),
              round(col("risky_rows") * lit(1.0) / col("n_rows"), 6)
                .as("risk_share"))
      .orderBy("k")
  }

  /** x211: L-DIVERSITY AUDIT — k-anonymity is not enough when everyone in
    * a class shares the same sensitive value (the "homogeneity attack"):
    * for l ∈ {2, 3, 5}, count QI classes whose members' orders span fewer
    * than l DISTINCT order priorities (the sensitive attribute), plus the
    * members and orders exposed by those classes.
    *
    * 100 TB: the customer⋈orders join is keyed on custkey (SMJ — both
    * sides fact-sized, neither broadcastable); the first aggregate keys
    * on (class, custkey, priority) so the expensive shuffle carries
    * pre-deduplicated rows, and the multi-distinct class aggregate then
    * runs over ≤ |customers|·|priorities| pre-aggregated rows, not raw
    * orders. The class table is bounded by the QI space (|nations| ·
    * |segments| · |bands|), so the l-sweep is a conditional sum over a
    * broadcast frame — same free-widening shape as x210's k-sweep. */
  def x211(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // merge hint = the 1000-executor plan (q10's device): at test scale
    // Spark's size stats would broadcast one side, but at 100 TB neither
    // customers nor orders is broadcastable — pin the keyed SMJ.
    val joined = qi(spark, dir).hint("merge")
      .join(Tables.orders(spark, dir)
              .select(col("o_custkey").as("c_custkey"), col("o_orderpriority")),
            Seq("c_custkey"))
    val perCustPrio = joined
      .groupBy("c_nationkey", "c_mktsegment", "bal_band",
               "c_custkey", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val sens = perCustPrio
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(countDistinct(col("o_orderpriority")).as("n_sens"),
           countDistinct(col("c_custkey")).as("n_members"),
           sum(col("n")).as("n_orders"))
    Seq(2L, 3L, 5L).toDF("l")
      .crossJoin(broadcast(sens))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"),
           sum(when(col("n_sens") < col("l"), 1L).otherwise(0L))
             .as("weak_classes"),
           sum(when(col("n_sens") < col("l"), col("n_members")).otherwise(0L))
             .as("exposed_members"),
           sum(when(col("n_sens") < col("l"), col("n_orders")).otherwise(0L))
             .as("exposed_orders"))
      .orderBy("l")
  }

  /** x212: SUPPRESSION RELEASE — x210's audit ENFORCED: customers in
    * quasi-identifier classes below k = 5 get their balance band
    * GENERALIZED to NULL (one suppression step — the risky bands of a
    * (nation, segment) cell merge into its NULL class), and the released
    * table is re-audited. Emits before/after rows (stage, class count,
    * risky classes/rows, min class size) — min class size is WEAKLY
    * MONOTONE under generalization (merged classes only grow; untouched
    * classes keep size ≥ k), and residual risk is reported honestly: a
    * (nation, segment) cell with < k customers TOTAL stays risky no
    * matter how far the band generalizes (at sf0.01 one step reaches full
    * 5-anonymity: 891 risky classes → 0; at sf0.001/sf0.1 a residual
    * remains and the numbers say so).
    *
    * 100 TB: the class table is bounded by the QI space, so the policy
    * joins BACK to customers as a broadcast; the release costs the x210
    * audit plus one broadcast join and one more QI-keyed aggregate —
    * still a constant number of customer-sized shuffles. */
  def x212(spark: SparkSession, dir: String): DataFrame = {
    val q = qi(spark, dir)
    val qiCols = Seq("c_nationkey", "c_mktsegment", "bal_band")
    val cls = q.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("sz"))
    val rel = q.join(broadcast(cls), qiCols)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
              when(col("sz") >= 5, col("bal_band")).as("bal_band"))
    val cls2 = rel.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("sz"))
    def stats(c: DataFrame, stage: String): DataFrame = c
      .agg(count(lit(1)).as("n_classes"),
           sum(when(col("sz") < 5, 1L).otherwise(0L)).as("risky_classes"),
           sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("risky_rows"),
           min(col("sz")).as("min_class_size"))
      .select(lit(stage).as("stage"), col("n_classes"),
              col("risky_classes"), col("risky_rows"), col("min_class_size"))
    stats(cls, "raw").unionByName(stats(cls2, "suppressed")).orderBy("stage")
  }

  /** x221: ERASURE PROPAGATION AUDIT — the right-to-be-forgotten
    * operation every governed lakehouse runs: a tombstone batch (here the
    * deterministic slice c_custkey ≡ 0 mod 37) cascades customer →
    * orders → lineitem along the foreign-key chain, and the audit reports
    * per table the rows before, rows erased, rows after, and the EXACT
    * cents of monetary mass leaving the store (the deletion receipt a
    * regulator asks for). `residual_after` re-scans each post-erasure
    * table for any row still referencing a tombstoned key — the audit
    * PROVES zero residual rather than asserting it (erase_ok is the
    * engine-computed conjunction; the oracle recomputes the counts and
    * states the theorem).
    *
    * 100 TB: the tombstone batch is request-bounded (a DSR queue, not a
    * table scan), so it rides a broadcast LEFT SEMI into orders; the
    * erased ORDERKEY set is what cascades into lineitem — bounded by the
    * batch's fan-out, broadcast here, and the escape hatch when a batch
    * fans out past broadcast size is a keyed semi-join shuffle (or x61's
    * Bloom prune) — never a full-table rewrite per request: erasure
    * costs one scan per fact table per batch, independent of batch
    * count. */
  def x221(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val tomb = cust.where(col("c_custkey") % 37 === 0).select("c_custkey")
    val eo = ord.join(broadcast(tomb),
                      col("o_custkey") === col("c_custkey"), "left_semi")
    val eoKeys = eo.select("o_orderkey")
    val el = li.join(broadcast(eoKeys),
                     col("l_orderkey") === col("o_orderkey"), "left_semi")
    def cents(c: org.apache.spark.sql.Column) =
      sum(round(c * 100, 0).cast(LongType))
    def audit(tbl: String, before: DataFrame, erased: DataFrame,
              moneyCents: org.apache.spark.sql.Column,
              residual: DataFrame): DataFrame = {
      val b = before.agg(count(lit(1)).as("rows_before"))
      val e = erased.agg(count(lit(1)).as("rows_erased"),
                         coalesce(cents(moneyCents), lit(0L))
                           .as("cents_erased"))
      val r = residual.agg(count(lit(1)).as("residual_after"))
      b.crossJoin(e).crossJoin(r)
        .select(lit(tbl).as("tbl"), col("rows_before"), col("rows_erased"),
                (col("rows_before") - col("rows_erased")).as("rows_after"),
                col("cents_erased"), col("residual_after"),
                (col("residual_after") === 0L).as("erase_ok"))
    }
    // Residual scans are GENUINE integrity checks, not tautologies:
    // customer — tombstoned keys still present after the predicate erase;
    // orders — surviving orders that reference a tombstoned customer
    // (catches a cascade that erased the customer but kept the order);
    // lineitem — surviving lineitems whose order no longer exists at all
    // (catches the order-erased-but-lineitems-kept bug; a fact⋈fact
    // orderkey anti-join, the one audit stage that shuffles both sides —
    // it is the verification step, run per release not per request).
    val custAfter = cust.where(col("c_custkey") % 37 =!= 0)
      .where(col("c_custkey") % 37 === 0)
    val ordSurvive = ord.join(broadcast(eoKeys), Seq("o_orderkey"),
                              "left_anti")
    val ordAfter = ordSurvive
      .join(broadcast(tomb), col("o_custkey") === col("c_custkey"),
            "left_semi")
    val liAfter = li.join(broadcast(eoKeys),
                          col("l_orderkey") === col("o_orderkey"),
                          "left_anti")
      .join(ordSurvive.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
    audit("customer", cust, cust.where(col("c_custkey") % 37 === 0),
          col("c_acctbal"), custAfter)
      .unionByName(audit("orders", ord, eo, col("o_totalprice"), ordAfter))
      .unionByName(audit("lineitem", li, el, col("l_extendedprice"),
                         liAfter))
      .orderBy("tbl")
  }

  /** x229: T-CLOSENESS AUDIT (Li et al. 2007) — the third member of the
    * privacy triad: k-anonymity (x210) bounds class SIZE, l-diversity
    * (x211) bounds distinct sensitive VALUES, but a class can pass both
    * while its sensitive-value DISTRIBUTION still leaks (90% URGENT in a
    * class vs 20% globally identifies the class as urgent-heavy). For
    * categorical sensitive attributes under uniform ground distance, the
    * Earth-Mover's Distance of the t-closeness definition collapses to
    * total variation: TV(c) = ½·Σ_s |n_cs/n_c − N_s/N|. Everything stays
    * EXACT INTEGER: TV(c) > t  ⟺  10·Σ_s|n_cs·N − N_s·n_c| > 2·t₁₀·n_c·N
    * for t = t₁₀/10, and the reported per-class maximum rides the floor-DIV
    * ppm convention. Cross-terms n_cs·N reach (1.5×10¹¹)² ≈ 2×10²² at
    * TPC-H sf100k — past int64 — so the products ride DECIMAL(38,0)
    * (the x185 headroom discipline); every OUTPUT is BIGINT.
    *
    * 100 TB: one fact-sized shuffle — the customer⋈orders SMJ (merge hint,
    * x211's plan) into a (class, custkey, priority) pre-dedup aggregate,
    * materialized once (localCheckpoint — it has two consumers and its
    * row count is bounded by |customers|·|priorities|). The sensitive
    * margin (5 rows) and the grand total (1 row) broadcast back; the
    * per-class TV table is bounded by the QI space, so the t-sweep is a
    * conditional sum over a broadcast frame — x210's free-widening shape. */
  /** x229's fact stage BEFORE materialization — exposed so PlanSpec can
    * assert the pinned SMJ on the live pre-checkpoint plan (the
    * localCheckpoint in x229 cuts the lineage the assertion needs). */
  private[graft] def x229PerCustPrio(spark: SparkSession, dir: String): DataFrame = {
    val qiCols = Seq("c_nationkey", "c_mktsegment", "bal_band")
    qi(spark, dir).hint("merge")
      .join(Tables.orders(spark, dir)
              .select(col("o_custkey").as("c_custkey"), col("o_orderpriority")),
            Seq("c_custkey"))
      .groupBy((qiCols :+ "c_custkey" :+ "o_orderpriority").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  def x229(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val qiCols = Seq("c_nationkey", "c_mktsegment", "bal_band")
    val perCustPrio = x229PerCustPrio(spark, dir).materialized
    val clsS = perCustPrio
      .groupBy((qiCols :+ "o_orderpriority").map(col): _*)
      .agg(sum(col("n")).as("n_cs"))
    val mem = perCustPrio.groupBy(qiCols.map(col): _*)
      .agg(countDistinct(col("c_custkey")).as("n_members"),
           sum(col("n")).as("n_c"))
    val globS = clsS.groupBy("o_orderpriority").agg(sum(col("n_cs")).as("n_s"))
    val gtot = globS.agg(sum(col("n_s")).as("n"))
    // the L1 sum needs BOTH sides: |n_cs·N − N_s·n_c| over priorities the
    // class HAS, plus N_s·n_c for every priority it LACKS (|0 − q_s| mass —
    // dropping it understates TV for sparse classes; the naive-replay spec
    // caught exactly that at sf0.001). The absent mass needs no second
    // join: Σ_{absent} N_s = N − Σ_{present} N_s.
    val tv = clsS
      .join(broadcast(globS), Seq("o_orderpriority"))
      .crossJoin(broadcast(gtot))
      .join(mem, qiCols)
      .groupBy(qiCols.map(col): _*)
      .agg(sum(abs(col("n_cs").cast(dec) * col("n")
                     - col("n_s").cast(dec) * col("n_c"))).as("num_present"),
           sum(col("n_s").cast(dec)).as("ns_present"),
           first(col("n_c")).as("n_c"), first(col("n_members")).as("n_members"),
           first(col("n")).as("n"))
      .withColumn("num", col("num_present") +
        col("n_c").cast(dec) * (col("n").cast(dec) - col("ns_present")))
      .withColumn("tv_ppm",
        expr("CAST(num * 1000000 DIV (2 * CAST(n_c AS DECIMAL(38,0)) * n) AS BIGINT)"))
    Seq(1L, 2L, 3L, 5L).toDF("t_tenths")
      .crossJoin(broadcast(tv))
      .groupBy("t_tenths")
      .agg(count(lit(1)).as("n_classes"),
           sum(when(lit(10).cast(dec) * col("num") >
                    lit(2).cast(dec) * col("t_tenths") * col("n_c") * col("n"),
                    1L).otherwise(0L)).cast(LongType).as("violating_classes"),
           sum(when(lit(10).cast(dec) * col("num") >
                    lit(2).cast(dec) * col("t_tenths") * col("n_c") * col("n"),
                    col("n_members")).otherwise(0L)).cast(LongType)
             .as("exposed_members"),
           max(col("tv_ppm")).as("max_tv_ppm"))
      .orderBy("t_tenths")
  }

  /** Discrete-Laplace (two-sided geometric, r = 1/2) inverse-CDF
    * thresholds on a [0, 2³¹−1) uniform hash: noise k ⟺ h < ⌊M·CDF(k)⌋,
    * k ∈ [−8, 7], ELSE → +8. CDF(k) is the exact rational num/384
    * (P(k) = (1/3)·(1/2)^|k|), so the thresholds are exact integers both
    * engines fold — ⌊M·num/384⌋ in BigInt, no float ever. ε = ln 2 per
    * unit-sensitivity count. */
  val dpDen = 384L
  val dpNums: Seq[(Int, Long)] =
    ((-8 to -1).map(k => k -> (1L << (8 + k))) ++
     (0 to 7).map(k => k -> (dpDen - (1L << (7 - k)))))
  val dpThresholds: Seq[(Int, Long)] = dpNums.map { case (k, num) =>
    k -> (BigInt(2147483647L) * num / dpDen).toLong
  }

  /** CASE ladder mapping hash column `h` to discrete-Laplace noise. */
  def dpLadderSql(h: String): String =
    dpThresholds.map { case (k, t) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** x246: DIFFERENTIALLY-PRIVATE NOISY COUNTS — the release mechanism
    * the governance family (x210 k-anon, x211 l-div, x212 suppression,
    * x229 t-closeness) audits FOR: two count releases over orders
    * (by priority; by priority×status) with discrete-Laplace noise
    * (geometric mechanism, the integer-valued Laplace analogue) drawn
    * deterministically from the portable hash of the group id — so the
    * oracle replays the exact release. Each release is ε = ln 2 for
    * count queries (sensitivity 1: one order lives in ONE group per
    * release); the ledger row-stamps the composed budget 2·ln 2
    * (sequential composition). Noise is honest noise: negatives and
    * non-zero perturbations appear in the output.
    *
    * 100 TB: each release is one partial+final count aggregate; the
    * noise ladder is in-map CASE arithmetic on the ≤20-row AGGREGATE,
    * not the fact table. Group ids are derived from the key bytes
    * (digit / ASCII) — portable arithmetic, no engine hash. */
  def x246(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def release(rel: Int, keyCol: String, gidExpr: String,
                grouped: DataFrame): DataFrame =
      grouped
        .withColumn("gid", expr(gidExpr))
        .withColumn("h", expr(s"(gid * 2654435761 + $rel * 97564181) % 2147483647"))
        .withColumn("noise", expr(dpLadderSql("h")).cast("long"))
        .select(lit(rel.toLong).as("release"),
                col(keyCol).as("group_key"), col("true_n"),
                col("noise"), (col("true_n") + col("noise")).as("noisy_n"),
                lit(693L).as("eps_milli"), lit(1386L).as("total_eps_milli"))
    val r1 = release(1, "group_key",
      "CAST(substring(group_key, 1, 1) AS BIGINT)",
      o.groupBy(col("o_orderpriority").as("group_key"))
        .agg(count(lit(1)).as("true_n")))
    val r2 = release(2, "group_key",
      "CAST(substring(group_key, 1, 1) AS BIGINT) * 256 + ascii(right(group_key, 1))",
      o.groupBy(concat(col("o_orderpriority"), lit("|"),
                       col("o_orderstatus")).as("group_key"))
        .agg(count(lit(1)).as("true_n")))
    r1.union(r2).orderBy("release", "group_key")
  }

  /** x265: DATA-QUALITY EXPECTATION AUDIT — the Deequ/Great-Expectations
    * shape every production ingest gates on: a declared constraint suite
    * evaluated in bulk, one row per constraint with (n_checked,
    * n_violations, pass). Seven constraint kinds over the fact tables:
    * not-null, value range, set membership, primary-key uniqueness,
    * referential integrity (lineitem → orders), a cross-table ordering
    * invariant (no lineitem ships before its order date), and a
    * completeness ratio gate (≤1% empty props). Violation COUNTS are
    * the contract, not just booleans — a gate that says "FAIL" without
    * the magnitude can't triage.
    *
    * 100 TB: every ROW-LOCAL constraint on one table folds into a SINGLE
    * conditional-aggregate scan (three lineitem row checks = one pass,
    * two orders row checks = one pass — adding constraints widens the
    * aggregate, never adds a scan); uniqueness is one key-grouped
    * aggregate re-aggregated to two counts; referential integrity and
    * the ordering invariant share ONE lineitem⋈orders join pass (orphans
    * = null-matched rows of the same left join the date check reads, so
    * the FK anti-join is free). No driver-side row handling anywhere. */
  def x265(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    // one scan: all row-local lineitem constraints
    // the multi-consumer 1-row aggregates are materialized ONCE
    // (localCheckpoint — the Features.scala bounded-frame idiom): each
    // feeds several constraint rows below, and without the checkpoint
    // every union branch would re-run its full table scan
    val liRow = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("v_null"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("v_range"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
        .otherwise(0L)).as("v_set"))
      .materialized
    // one scan: all row-local orders constraints
    val ordRow = ord.agg(
      count(lit(1)).as("n"),
      sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
        .otherwise(0L)).as("v_set"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_pos"))
      .materialized
    // primary-key uniqueness: duplicate rows beyond the first per key
    val uniq = li.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n"), sum(col("c") - 1).as("v"))
    // ONE join pass carries both the FK orphan check (null-matched left
    // rows) and the ship-before-order invariant
    val joined = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
           sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_fk"),
           sum(when(col("o_orderkey").isNotNull &&
                    col("l_shipdate") < col("o_orderdate"), 1L)
             .otherwise(0L)).as("v_date"))
      .materialized
    // completeness ratio gate: ppm of events with empty/null props
    val comp = Tables.events(spark, dir).agg(
      count(lit(1)).as("n"),
      sum(when(col("props").isNull || col("props") === "", 1L)
        .otherwise(0L)).as("v"))
    def row(name: String, n: Column, v: Column, src: DataFrame) =
      src.select(lit(name).as("constraint_name"), n.as("n_checked"),
                 v.as("n_violations"), (v === 0L).as("pass"))
    row("lineitem_discount_in_0_0.1", col("n"), col("v_range"), liRow)
      .unionByName(row("lineitem_orderkey_fk", col("n"), col("v_fk"), joined))
      .unionByName(row("lineitem_pk_unique", col("n"), col("v"), uniq))
      .unionByName(row("lineitem_quantity_not_null", col("n"), col("v_null"), liRow))
      .unionByName(row("lineitem_returnflag_in_set", col("n"), col("v_set"), liRow))
      .unionByName(row("lineitem_ship_after_order", col("n"), col("v_date"), joined))
      .unionByName(row("orders_status_in_set", col("n"), col("v_set"), ordRow))
      .unionByName(row("orders_totalprice_positive", col("n"), col("v_pos"), ordRow))
      .unionByName(
        comp.select(lit("events_props_99pct_complete").as("constraint_name"),
                    col("n").as("n_checked"), col("v").as("n_violations"),
                    (col("v") * 100 <= col("n")).as("pass")))
      .orderBy("constraint_name")
  }

  /** x275: DATA-SUBJECT ACCESS REPORT — the GDPR/CCPA read-side companion
    * to x221's erasure: for a deterministic subject cohort (custkey ≡ 3
    * mod 29), one row per (subject, table) stating what the corpus HOLDS
    * about them — row count plus first/last timestamp (epoch µs; −1 for
    * the timestamp-free customer record). Covers the whole keyed reach:
    * the customer record, their orders, those orders' lineitems, and the
    * events stream (the synthetic corpus shares one id space — production
    * would route through an identity map here). Absent rows mean "nothing
    * held" by construction; a subject with zero orders still shows their
    * customer row, so the report never silently drops a subject.
    *
    * 100 TB: each table contributes ONE subject-semi-joined aggregate —
    * the broadcast subject set prunes at the scan, the per-table rollup is
    * map-side combinable, and the lineitem leg reaches through orders via
    * the cohort's (bounded) order-key set. A single-subject DSAR is the
    * degenerate broadcast; a cohort report amortizes the scans. */
  def x275(spark: SparkSession, dir: String): DataFrame = {
    val subj = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 29 === 3)
      .select(col("c_custkey").as("subject"))
    val cRows = subj.select(col("subject"),
      lit("customer").as("table_name"), lit(1L).as("n_rows"),
      lit(-1L).as("first_us"), lit(-1L).as("last_us"))
    val o = Tables.orders(spark, dir)
      .join(broadcast(subj), col("o_custkey") === col("subject"))
    val oRows = o.groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
           min(unix_micros(col("o_orderdate").cast(TimestampType))).as("first_us"),
           max(unix_micros(col("o_orderdate").cast(TimestampType))).as("last_us"))
      .select(col("subject"), lit("orders").as("table_name"),
              col("n_rows"), col("first_us"), col("last_us"))
    val liRows = Tables.lineitem(spark, dir)
      .join(broadcast(o.select(col("o_orderkey"), col("subject"))),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
           min(unix_micros(col("l_shipdate").cast(TimestampType))).as("first_us"),
           max(unix_micros(col("l_shipdate").cast(TimestampType))).as("last_us"))
      .select(col("subject"), lit("lineitem").as("table_name"),
              col("n_rows"), col("first_us"), col("last_us"))
    val evRows = Tables.events(spark, dir)
      .join(broadcast(subj), col("user_id") === col("subject"))
      .groupBy("subject")
      .agg(count(lit(1)).as("n_rows"),
           min(unix_micros(col("ts").cast(TimestampType))).as("first_us"),
           max(unix_micros(col("ts").cast(TimestampType))).as("last_us"))
      .select(col("subject"), lit("events").as("table_name"),
              col("n_rows"), col("first_us"), col("last_us"))
    cRows.unionByName(oRows).unionByName(liRows).unionByName(evRows)
      .orderBy("subject", "table_name")
  }

  /** x288: LICENSE-LATTICE PROPAGATION — compliance audit of a two-level
    * derivation DAG (documents → packed shards → released datasets): every
    * derived artifact's EFFECTIVE license is the lattice join (most
    * restrictive wins) of its inputs' licenses, and a release whose
    * DECLARED license is weaker than that join is a violation — the check
    * a training-data release pipeline must run before shipping a mix.
    * Licenses order cc0(0) < cc-by(1) < cc-by-sa(2) < proprietary(3);
    * restrictiveness rank is a total order, so the join is MAX(rank) and
    * two-hop propagation (docs→shards, shards→datasets) equals the flat
    * doc→dataset rollup by associativity — Round12Spec pins that identity.
    * Source licensing is the deterministic src-number mapping (srcN ↦
    * rank N % 4); each dataset DECLARES its own license (dataset % 4), so
    * the audit is discriminative: the dataset declaring proprietary never
    * violates, the one declaring cc0 violates on any restriction it
    * absorbed. Per dataset: doc/shard mass, the
    * effective license, the most restrictive contributing source (rank
    * argmax, ties to the lexicographically first source — provenance for
    * the auditor), the mass carrying that rank, and the violation flag.
    *
    * 100 TB: two key-partitioned partial+final aggregates (shard-, then
    * dataset-grain) — license metadata rides the rows as integer ranks, so
    * propagation is just MAX inside aggregates that already exist in any
    * packing pipeline; no joins beyond the bounded license dim, nothing
    * driver-side. */
  def x288(spark: SparkSession, dir: String): DataFrame = {
    val rank = expr("CAST(substring(source, 4) AS BIGINT) % 4")
    def name(r: Column): Column = Seq("cc0", "cc-by", "cc-by-sa", "proprietary")
      .zipWithIndex.foldLeft(when(lit(false), ""): Column) {
        case (acc, (n, k)) => acc.when(r === k, n)
      }.otherwise("unknown")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), rank.as("lic_rank"))
      .withColumn("shard", expr("doc_id DIV 25"))
      .withColumn("dataset", expr("(doc_id DIV 25) % 5"))
    // (max rank, tie → lexicographically first source) as ONE min_by key:
    // min over (−rank, source). min_by composes associatively across the
    // two hops — only max-rank shards reach the dataset-level pick.
    val shards = docs.groupBy("dataset", "shard")
      .agg(count(lit(1)).as("n_docs"),
           max(col("lic_rank")).as("s_rank"),
           min_by(col("source"),
                  struct(negate(col("lic_rank")), col("source"))).as("s_src"))
    val perDs = shards.groupBy("dataset")
      .agg(sum(col("n_docs")).as("n_docs"),
           count(lit(1)).as("n_shards"),
           max(col("s_rank")).as("eff_rank"),
           min_by(col("s_src"),
                  struct(negate(col("s_rank")), col("s_src"))).as("worst_source"))
    val atMax = docs.join(perDs.select(col("dataset"), col("eff_rank")), "dataset")
      .filter(col("lic_rank") === col("eff_rank"))
      .groupBy("dataset").agg(count(lit(1)).as("n_docs_at_max"))
    perDs.join(atMax, "dataset")
      .withColumn("declared_rank", expr("dataset % 4"))
      .select(col("dataset"), col("n_docs"), col("n_shards"),
              col("eff_rank"), name(col("eff_rank")).as("effective_license"),
              name(col("declared_rank")).as("declared_license"),
              col("worst_source"), col("n_docs_at_max"),
              (col("eff_rank") > col("declared_rank")).as("violation"))
      .orderBy("dataset")
  }

  /** x301: DEDUP-AWARE SPLIT CONSTRUCTION — build a train/eval split that
    * CANNOT leak: documents are grouped into exact-duplicate classes
    * (canonical key = lower(text), group id = the min doc_id — the q44
    * convention), and the WHOLE group lands in one split via the portable
    * Knuth mix of the group id (h % 10 < 8 → train, else eval — a
    * deterministic 80/20 both engines replay). x139 AUDITS a given split
    * for leakage; this key is the constructive counterpart — the split
    * builder a pipeline runs so that x139's audit passes by construction.
    * The no-leakage theorem (every group intersects exactly ONE split)
    * rides the output as an oracle-recomputed flag: the oracle recounts
    * distinct groups per split and cross-checks Σ per-split groups =
    * total groups — equality fails iff some group straddled.
    *
    * 100 TB: one text-keyed aggregate forms the groups (the q44 grain —
    * the only corpus-scale shuffle), the split decision is a map-side mix
    * on the bounded group grain, membership joins back doc-keyed, and the
    * report is a 2-row rollup. Near-dup-safe variants swap the grouping
    * key for x194's cluster id — same shape, one more stage. */
  def x301(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars"))
    val groups = docs.groupBy(lower(col("text")).as("key"))
      .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("n_in_group"))
      .withColumn("h",
        expr("((gid % 100000000) * 2654435761) % 2147483647"))
      .withColumn("split",
        when(col("h") % 10 < 8, lit("train")).otherwise(lit("eval")))
    val member = docs.select(lower(col("text")).as("key"),
                             col("doc_id"), col("n_chars"))
      .join(groups.select(col("key"), col("gid"), col("split")), "key")
    val perSplit = member.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("gid")).as("n_groups"),
           sum(col("n_chars")).as("char_mass"))
    val tot = groups.agg(countDistinct(col("gid")).as("g_total"))
    perSplit.crossJoin(broadcast(tot))
      .withColumn("no_leakage",
        sum(col("n_groups")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))
          === col("g_total"))
      .select(col("split"), col("n_docs"), col("n_groups"),
              col("char_mass"), col("no_leakage"))
      .orderBy("split")
  }
}
