package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
      val h = s"(o_orderkey * $mixA + ${(r + 1) * mixB}) % $mersenne"
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
}
