package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.engine.Tables

/** x244+: statistical-protocol operators over deterministic portable
  * randomness — the Poisson bootstrap (THE distributed resampling scheme:
  * per-row independent weights, no global permutation) driven by the
  * x86/x151 Knuth-mixer hash family, with every probability threshold a
  * shared integer literal both engines fold.
  */
object StatProtocol {

  /** Poisson(1) inverse-CDF thresholds on a [0, 2³¹−1) uniform hash:
    * weight k ⟺ h < floor(M·CDF(k)); mass beyond 6 collapses to 7
    * (P ≈ 8·10⁻⁵). Literals shared with the generated oracle SQL; the
    * spec re-derives them from the e⁻¹/k! series. */
  val mersenne = 2147483647L
  val mixA = 2654435761L
  val mixB = 97564181L
  val bootstrapReps = 16
  val poissonThresholds: Seq[Long] = {
    var fact = 1.0
    var cdf = 0.0
    (0 until 7).map { k =>
      if (k > 0) fact *= k
      cdf += math.exp(-1.0) / fact
      math.floor(mersenne * cdf).toLong
    }
  }

  /** The per-replicate uniform hash, shared verbatim by engine and the
    * generated oracle SQL. The key is pre-reduced mod 10⁸ BEFORE the
    * Knuth multiply (repo convention, per Crossval/Pipeline): a raw
    * o_orderkey reaches ~6·10⁹ by sf≈1000, where key·2654435761
    * overflows int64 — Spark wraps silently to a negative h (every CASE
    * ladder then misfires to weight 0) while DuckDB raises, so the two
    * sides would diverge exactly at target scale. After the reduce the
    * product is < 2.7·10¹⁷, comfortably BIGINT-safe. */
  def poissonHashSql(key: String, r: Int): String =
    s"((($key) % 100000000) * $mixA + ${(r + 1) * mixB}) % $mersenne"

  /** The CASE ladder mapping hash column `h` to a Poisson(1) weight. */
  def poissonLadderSql(h: String): String =
    poissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")

  /** x244: POISSON BOOTSTRAP — 16 deterministic bootstrap replicates of
    * mean order value in one aggregation pass: each order's replicate-r
    * weight is Poisson(1)-distributed via the inverse-CDF ladder over the
    * portable hash (o_orderkey·A + (r+1)·B) mod M, so E[w]=1 and each
    * replicate is a valid resample WITHOUT any global permutation or
    * per-replicate data copy — the reason Poisson bootstrap is the only
    * bootstrap that scales. Per replicate: effective n, total cents, and
    * the exact floor-div mean in micro-cents (DECIMAL(38,0) / HUGEINT —
    * the sum·10⁶ cross-term overflows BIGINT past ~10¹³ cents).
    *
    * 100 TB: ONE partial+final aggregate computes all 32 sums (16 weights
    * are in-map CASE arithmetic on the scan — no explode, no 16× row
    * blowup, no extra shuffle); the 16-row reshape is a `stack` on the
    * 1-row aggregate. Adding replicates widens the aggregate, never adds
    * a pass. */
  def x244(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
              expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val aggs: Seq[Column] = (0 until bootstrapReps).flatMap { r =>
      val h = poissonHashSql("o_orderkey", r)
      val w = poissonLadderSql(h)
      Seq(sum(expr(w)).as(s"ne$r"),
          sum(expr(s"($w) * cents")).as(s"sc$r"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until bootstrapReps)
      .map(r => s"$r, ne$r, sc$r").mkString(", ")
    one.selectExpr(
        s"stack($bootstrapReps, $stackArgs) AS (rep, n_eff, sum_cents)")
      .selectExpr(
        "CAST(rep AS BIGINT) AS rep",
        "n_eff", "sum_cents",
        "CAST((CAST(sum_cents AS DECIMAL(38,0)) * 1000000) DIV n_eff AS BIGINT) AS mean_micros")
      .orderBy("rep")
  }

  /** The split-conformal α grid as exact rationals: (percent, 1−α as
    * num/den). Shared with the generated oracle. */
  val conformalAlphas: Seq[(Int, Int, Int)] =
    Seq((5, 19, 20), (10, 9, 10), (20, 4, 5))

  /** x245: SPLIT-CONFORMAL PREDICTION BAND — the distribution-free
    * uncertainty wrapper every deployed regressor needs: train (keys
    * %5 ∈ {0,1,2}) fits a per-priority mean-cents predictor; calibration
    * (%5 = 3) takes nonconformity s = |cents − pred|; for each α the band
    * half-width is the k-th smallest calibration score with k =
    * ⌈(n_cal+1)(1−α)⌉ (exact integer ceil-div); test (%5 = 4) reports
    * empirical coverage in ppm. The finite-sample construction guarantee
    * — at least k calibration scores lie within the band, BY DEFINITION
    * of the k-th order statistic — is emitted as `cal_at_or_below` and
    * asserted ≥ k in Round10fSpec (a real theorem, not data luck).
    *
    * 100 TB: the predictor is a ≤5-row broadcast; the k-th order
    * statistic rides x176's two-phase histogram (one bucket aggregate +
    * one pruned per-value rescan — NO global sort at any α, and all three
    * α targets share both passes); test coverage is one broadcast-stitch
    * aggregate. Adding α values adds broadcast rows, not passes. */
  def x245(spark: SparkSession, dir: String): DataFrame = {
    val W = 4096L
    val cents = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
              expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val pred = cents.filter(col("o_orderkey") % 5 <= 2)
      .groupBy("o_orderpriority")
      .agg(expr("SUM(cents) DIV COUNT(*)").as("pred_cents"))
    def scores(bucket: Int) = cents.filter(col("o_orderkey") % 5 === bucket)
      .join(broadcast(pred), "o_orderpriority")
      .select(abs(col("cents") - col("pred_cents")).as("s"))

    val cal = scores(3)
    val h1 = cal.groupBy(expr(s"s DIV $W").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = h1
      .withColumn("before", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .withColumn("n_cal", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
    val alphaRows = conformalAlphas
      .map { case (p, nu, de) => s"named_struct('alpha_pct', ${p}L, 'num', ${nu}L, 'den', ${de}L)" }
      .mkString("inline(array(", ", ", "))")
    val targets = cum.select(col("n_cal")).limit(1)
      .selectExpr("n_cal", alphaRows)
      .withColumn("k", expr("((n_cal + 1) * num + den - 1) DIV den"))
      .select("alpha_pct", "n_cal", "k")
    val selected = cum.join(broadcast(targets),
        col("before") < col("k") && col("k") <= col("before") + col("cnt"))
      .select("b", "before").distinct()
    val wv = Window.partitionBy("b").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val q = cal.join(broadcast(selected), expr(s"s DIV $W") === col("b"))
      .groupBy("b", "s", "before")
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("cum", col("before") + sum(col("vcnt")).over(wv))
      .join(broadcast(targets), col("cum") >= col("k"))
      .groupBy("alpha_pct", "n_cal", "k")
      .agg(min(col("s")).as("q_cents"), min(col("cum")).as("cal_at_or_below"))

    scores(4).crossJoin(broadcast(q))
      .groupBy("alpha_pct", "n_cal", "k", "q_cents", "cal_at_or_below")
      .agg(count(lit(1)).as("n_test"),
           sum(when(col("s") <= col("q_cents"), 1L).otherwise(0L))
             .as("test_covered"))
      .withColumn("coverage_ppm",
                  expr("test_covered * 1000000 DIV n_test"))
      .orderBy("alpha_pct")
  }

  /** x254: BOOTSTRAP UPLIFT INTERVAL — x244's machinery pointed at the
    * question bootstrap exists for: the UNCERTAINTY of a DIFFERENCE.
    * Orders split into arms by key parity (A = even, B = odd — the x20
    * split discipline); each of the 16 Poisson replicates resamples BOTH
    * arms with the same shared ladder and reports mean(A) − mean(B) in
    * exact micro-cents; the spread of the 16 replicate uplifts IS the
    * bootstrap confidence band a reader takes from this table (x88's
    * z-test states significance parametrically; this states it
    * resampling-exactly, no normality assumed).
    *
    * 100 TB: still ONE partial+final aggregate — 64 sums now (arm × 16 ×
    * (n, Σ)); the arm indicator is in-map parity CASE on the scan. The
    * 16-row reshape + the exact DECIMAL divisions run on the 1-row
    * aggregate. */
  def x254(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
              expr("CAST(o_orderkey % 2 AS INT)").as("arm"),
              expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
    val aggs: Seq[Column] = (0 until bootstrapReps).flatMap { r =>
      val h = poissonHashSql("o_orderkey", r)
      val w = poissonLadderSql(h)
      Seq(sum(expr(s"CASE WHEN arm = 0 THEN $w ELSE 0 END")).as(s"na$r"),
          sum(expr(s"CASE WHEN arm = 0 THEN ($w) * cents ELSE 0 END")).as(s"sa$r"),
          sum(expr(s"CASE WHEN arm = 1 THEN $w ELSE 0 END")).as(s"nb$r"),
          sum(expr(s"CASE WHEN arm = 1 THEN ($w) * cents ELSE 0 END")).as(s"sb$r"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until bootstrapReps)
      .map(r => s"$r, na$r, sa$r, nb$r, sb$r").mkString(", ")
    one.selectExpr(
        s"stack($bootstrapReps, $stackArgs) AS (rep, n_a, sum_a, n_b, sum_b)")
      .selectExpr(
        "CAST(rep AS BIGINT) AS rep", "n_a", "sum_a", "n_b", "sum_b",
        "CAST((CAST(sum_a AS DECIMAL(38,0)) * 1000000) DIV n_a AS BIGINT) AS mean_a_micros",
        "CAST((CAST(sum_b AS DECIMAL(38,0)) * 1000000) DIV n_b AS BIGINT) AS mean_b_micros")
      .withColumn("uplift_micros", expr("mean_a_micros - mean_b_micros"))
      .orderBy("rep")
  }

  /** The off-policy evaluation setup, shared with the generated oracle:
    * a 5-action alphabet logged (by declaration) uniformly, so every
    * importance weight is the exact integer K·1[match] — no float
    * propensity ever. Each policy is (name, SQL match predicate, weight
    * numerator). `logging_replica` matches everything at weight 1: the
    * identity IPS ≡ SNIPS ≡ plain mean reward is a theorem the spec
    * asserts. */
  val ipsK = 5L
  val ipsPolicies: Seq[(String, String, Long)] = Seq(
    ("always_click", "event_type = 'click'", ipsK),
    ("context_map",
     "event_type = (CASE user_id % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click' " +
       "WHEN 2 THEN 'purchase' ELSE 'signup' END)", ipsK),
    ("logging_replica", "true", 1L))

  /** x248: INVERSE-PROPENSITY OFF-POLICY EVALUATION — the counterfactual
    * question every logged-interaction corpus gets asked ("what would
    * policy π have earned?") answered without ever deploying π: IPS
    * V̂ = (1/n)·Σ wᵢ·rᵢ with wᵢ = π(aᵢ|xᵢ)/μ(aᵢ|xᵢ), plus the
    * self-normalized SNIPS Σw·r/Σw that trades a little bias for
    * variance. Context = user_id mod 4, reward = value cents, weights
    * exact integers under the declared-uniform logging policy. The
    * logging-replica row pins the estimator identity (IPS = SNIPS =
    * empirical mean) — wrong propensity handling breaks it loudly.
    *
    * 100 TB: ONE partial+final aggregate computes every policy's
    * (Σ match, Σ match·r) — match predicates are in-map CASE arithmetic
    * on the scan, no per-policy pass, no explode; the 3-row reshape is a
    * `stack` on the 1-row aggregate. More policies widen the aggregate. */
  def x248(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
              expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++ ipsPolicies.zipWithIndex.flatMap {
        case ((_, pred, _), i) =>
          Seq(sum(expr(s"CASE WHEN $pred THEN 1 ELSE 0 END")).as(s"m$i"),
              sum(expr(s"CASE WHEN $pred THEN cents ELSE 0 END")).as(s"s$i"))
      }
    val one = ev.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ipsPolicies.zipWithIndex.map { case ((nm, _, w), i) =>
      s"'$nm', $w" + s"L, m$i, s$i"
    }.mkString(", ")
    one.selectExpr(
        "n",
        s"stack(${ipsPolicies.size}, $stackArgs) AS (policy, w, n_matched, sum_match_cents)")
      .selectExpr(
        "policy", "n", "n_matched",
        "CAST((CAST(w * sum_match_cents AS DECIMAL(38,0)) * 1000000) DIV n AS BIGINT) AS ips_micro",
        "CAST((CAST(sum_match_cents AS DECIMAL(38,0)) * 1000000) DIV n_matched AS BIGINT) AS snips_micro")
      .orderBy("policy")
  }

  /** The exponential-bucket ladder (OpenTelemetry / HDR-histogram shape):
    * bucket b ⟺ cents ∈ [2^b, 2^(b+1)), b ∈ [0, 46]. Shared with the
    * generated oracle; the spec proves ladder ≡ 63−numberOfLeadingZeros. */
  def expoBucketSql(v: String): String =
    (0 until 47).map(b => s"WHEN $v < ${1L << (b + 1)} THEN $b")
      .mkString("CASE ", " ", " ELSE 47 END")

  /** x249: MERGEABLE EXPONENTIAL HISTOGRAM — the observability sketch
    * every metrics pipeline ships: order values bucketed at base-2
    * boundaries (relative error ≤ 2× by construction), kept per priority
    * AND merged to an ALL row by plain count addition (the mergeability
    * that makes the sketch shardable); per group the estimated median
    * bucket (smallest b whose cumulative count reaches ⌈n/2⌉) with its
    * certified bounds [2^b, 2^(b+1)). Round10gSpec proves the TRUE exact
    * median lies inside the certified interval — the 2× guarantee is a
    * theorem of the construction, not data luck.
    *
    * 100 TB: one partial+final aggregate to ≤ |groups|·47 rows; the
    * merge, cumulative and median selection all run on that bounded
    * aggregate (windows partitioned per group over ≤47 rows). The
    * fact-table cost is exactly one scan with in-map CASE arithmetic. */
  def x249(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
              expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("grp"), expr(expoBucketSql("cents")).cast(LongType).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val all = hist.groupBy("b").agg(sum(col("cnt")).as("cnt"))
      .select(lit("ALL").as("grp"), col("b"), col("cnt"))
    val merged = hist.select("grp", "b", "cnt").union(all)
    val wg = Window.partitionBy("grp")
    val wcum = Window.partitionBy("grp").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("n", sum(col("cnt")).over(wg))
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy("grp")
      .agg(max(col("n")).as("n"), min(col("b")).as("p50_bucket"))
      .selectExpr("grp", "n", "p50_bucket",
                  "CAST(POWER(2.0D, p50_bucket) AS BIGINT) AS p50_lo",
                  "CAST(POWER(2.0D, p50_bucket + 1) AS BIGINT) AS p50_hi")
      .orderBy("grp")
  }

  /** x297: ISOTONIC CALIBRATION — monotone regression of the positive
    * rate over score bins (PAVA's result) via the EXACT minimax closed
    * form: fit_i = max_{j≤i} min_{k≥i} mean(pos over bins [j..k]). Bins =
    * l_quantity in 10 width-5 buckets, outcome = the q38 label
    * (l_extendedprice > 95 000); the raw per-bin rates need not be
    * monotone in quantity — the isotonic fit is the calibrated monotone
    * curve an eval pipeline feeds a reliability diagram (the
    * monotone-regression sibling of x202's binned calibration and x245's
    * conformal band). Arithmetic is exact: interval means are
    * (Δpos·10⁶) DIV (Δn) on prefix differences, and because floor
    * commutes with min and max, the integer minimax IS the floor of the
    * real-valued isotonic regression — so the output is bit-stable
    * cross-engine AND provably monotone (flag rides each row;
    * Round12Spec replays classic pool-adjacent-violators in the JVM and
    * pins equality).
    *
    * 100 TB: the corpus-scale work is ONE 10-key partial+final bin
    * aggregate; the minimax runs on the ≤10³-row (i, j, k) grid of that
    * bounded frame — O(bins³) beats PAVA's O(bins) only in
    * PARALLELIZABILITY (no sequential pool stack to thread through a
    * driver loop), and bins are fixed-width by construction. */
  def x297(spark: SparkSession, dir: String): DataFrame = {
    val bins = Tables.lineitem(spark, dir)
      .select(expr("(CAST(l_quantity AS BIGINT) - 1) DIV 5").as("bin"),
              when(col("l_extendedprice") > 95000, 1L).otherwise(0L).as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
    val byBin = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the ONE corpus scan: the prefix windows run directly over the bin
    // aggregate (guard: Aggregate stays below the unpartitioned window —
    // checkpoint only AFTER), then every leg reads the ≤10-row checkpoint
    val pre = bins
      .withColumn("cn", sum(col("n")).over(byBin))
      .withColumn("cpos", sum(col("pos")).over(byBin))
      .materialized
    val iLeg = pre.select(col("bin").as("i"))
    val jLeg = pre.select(col("bin").as("j"),
                          (col("cn") - col("n")).as("cn_j0"),
                          (col("cpos") - col("pos")).as("cpos_j0"))
    val kLeg = pre.select(col("bin").as("k"), col("cn").as("cn_k"),
                          col("cpos").as("cpos_k"))
    val fit = iLeg.join(jLeg, col("j") <= col("i"))
      .join(kLeg, col("k") >= col("i"))
      .withColumn("avg_ppm",
        expr("(cpos_k - cpos_j0) * 1000000 DIV (cn_k - cn_j0)"))
      .groupBy("i", "j").agg(min(col("avg_ppm")).as("m"))
      .groupBy("i").agg(max(col("m")).as("fit_ppm"))
    val byI = Window.orderBy("i") // child carries fit's aggregates
    pre.join(fit, col("bin") === col("i"))
      .withColumn("raw_ppm", expr("pos * 1000000 DIV n"))
      .withColumn("monotone_ok",
        coalesce(col("fit_ppm") >= lag(col("fit_ppm"), 1).over(byI),
                 lit(true)))
      .select(col("bin"), col("n"), col("pos"), col("raw_ppm"),
              col("fit_ppm"), col("monotone_ok"))
      .orderBy("bin")
  }

  /** x289: NEYMAN ALLOCATION — variance-optimal stratified sampling: a
    * 100-sample evaluation budget allocated over the per-source strata of
    * the documents table proportionally to N_h·σ_h (big, high-variance
    * strata get the samples; uniform strata need almost none) — the
    * protocol an eval-set builder runs before drawing human-annotation
    * samples from a corpus. EXACT throughout: N_h·σ_h =
    * √(N_h·Σy²_h − (Σy_h)²) — the radicand is an exact BIGINT from two
    * integer sums, so the weight is x222's integer square root (floor ±1
    * correction, immune to pow/sqrt ULP drift), and the budget apportions
    * by x165's largest-remainder device (Σalloc = budget exactly).
    *
    * Two theorems ride as oracle-recomputed flags: sum_ok (Hamilton), and
    * neyman_ok — the Cauchy–Schwarz fact that IS Neyman optimality,
    * (Σ N_hσ_h)² ≤ N·Σ N_hσ_h², checked in integers as
    * (Σw_h)² ≤ N_tot·Σ⌈v_h/N_h⌉ (w = isqrt(v) ≤ √v gives the left bound,
    * the ceil the right — BIGINT headroom to ~10¹⁸, documented ~500×
    * beyond the 100× soak corpus). A zero-variance stratum weighs 0 —
    * Neyman's own answer (its mean is known from any single row);
    * production would floor allocations at 1 and cap at N_h via x274's
    * water-fill, orthogonal here.
    *
    * 100 TB: the corpus-scale work is ONE partial+final (count, Σy, Σy²)
    * rollup per stratum; the isqrt, apportionment and both flags run on
    * the ≤|sources| aggregate under unpartitioned-but-bounded windows. */
  def x289(spark: SparkSession, dir: String): DataFrame = {
    val budget = 100L
    val stats = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars").as("y"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("sy"),
           sum(col("y") * col("y")).as("syy"))
      .withColumn("v", col("n_docs") * col("syy") - col("sy") * col("sy"))
    val s0 = floor(sqrt(col("v").cast(DoubleType))).cast(LongType)
    val wted = stats.withColumn("w",
      when((s0 + 1L) * (s0 + 1L) <= col("v"), s0 + 1L)
        .when(s0 * s0 > col("v"), s0 - 1L)
        .otherwise(s0))
    val tot = wted.agg(sum(col("w")).as("tw"), sum(col("n_docs")).as("tn"),
                       sum(expr("(v + n_docs - 1) DIV n_docs")).as("tvn"))
    val byRem = Window.orderBy(col("rem").desc, col("source"))
    val all =
      Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wted.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"w * $budget DIV tw"))
      .withColumn("rem", expr(s"(w * $budget) % tw"))
      .withColumn("rk", row_number().over(byRem))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(all))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .withColumn("sum_ok", sum(col("alloc")).over(all) === lit(budget))
      .withColumn("neyman_ok",
        sum(col("w")).over(all) * sum(col("w")).over(all) <=
          col("tn") * col("tvn"))
      .select(col("source"), col("n_docs"), col("v"), col("w"), col("alloc"),
              col("sum_ok"), col("neyman_ok"))
      .orderBy("source")
  }
}
