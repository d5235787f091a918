package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Reshape

/** x15–x17 properties: sketch accuracy against exact answers; pivot/unpivot
  * round-trip. */
class ReshapeSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x15 HLL distinct counts land within the configured 2% error (5x slack)") {
    val exact = graft.engine.Tables.orders(spark, sfSmoke)
      .groupBy("o_orderpriority").agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Reshape.x15Raw(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    for ((prio, app, p50, p95) <- approx) {
      val ex = exact(prio).toDouble
      assert(math.abs(app - ex) / ex <= 0.10, s"$prio: approx $app vs exact $ex")
      assert(p50 <= p95, "quantiles must be ordered")
    }
    // the theorem-form key: exact counts match, every contract flag true
    for (r <- Reshape.x15(spark, sfSmoke).collect()) {
      assert(r.getLong(1) === exact(r.getString(0)), s"${r.getString(0)} exact")
      assert(r.getBoolean(4), s"${r.getString(0)}: approx_ok must hold")
    }
  }

  test("x28 exact percentiles are monotone and bracket x15's approximations") {
    val exact = Reshape.x28(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val bounds = graft.engine.Tables.orders(spark, sfSmoke)
      .groupBy("o_orderpriority")
      .agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((prio, (p25, p50, p75, p95)) <- exact) {
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"$prio not monotone")
      val (mn, mx) = bounds(prio)
      assert(p25 >= mn && p95 <= mx, s"$prio percentiles outside [min,max]")
    }
    // the approximate sketch's p50 must sit within the exact p25..p75 band
    for (r <- Reshape.x15Raw(spark, sfSmoke).collect()) {
      val (p25, _, p75, _) = exact(r.getString(0))
      assert(r.getDouble(2) >= p25 && r.getDouble(2) <= p75,
        s"${r.getString(0)}: approx p50 ${r.getDouble(2)} outside exact [$p25,$p75]")
    }
  }

  test("x16 pivot row sums equal per-user event counts; x17 inverts x16") {
    val perUser = graft.engine.Tables.events(spark, sfSmoke)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = Reshape.x16(spark, sfSmoke).collect()
    for (r <- wide) {
      val total = (1 to 5).map(r.getLong).sum
      assert(total === perUser(r.getLong(0)), s"user ${r.getLong(0)}")
    }
    val long = Reshape.x17(spark, sfSmoke).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val direct = graft.engine.Tables.events(spark, sfSmoke)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(long === direct)
  }

  test("x108 tiled sketch union reproduces the direct sketch exactly and tracks the exact count") {
    val rows = Reshape.x108Raw(spark, sfSmoke).orderBy("o_orderpriority").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (direct, exact, tiled) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // merge transparency: coupon-set state is grouping-independent, so
      // monthly tiles lose NOTHING at sfSmoke's cardinalities. EXACT
      // equality is a coupon-mode property only — past it the union's
      // HLL_8 target re-estimates within sketch error (x112 pins the
      // 2% bound at sf0.01 through the driver oracle)
      assert(tiled === direct, s"priority ${r.getString(0)}: tiled union must equal direct sketch")
      // lgK=12 default: relative error ~1.6%; allow 5x slack at small n
      assert(math.abs(direct - exact) <= math.max(1L, (exact * 0.08).toLong),
             s"priority ${r.getString(0)}: est $direct vs exact $exact")
    }
    // tile-count invariance: coarser tiles (year) give the same union estimate
    val o = graft.engine.Tables.orders(spark, sfSmoke)
    val byYear = o.groupBy(col("o_orderpriority"), date_trunc("year", col("o_orderdate")).as("y"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(byYear(r.getString(0)) === r.getLong(1), "year tiles == direct too")
    // the theorem-form key: exact counts match, every contract flag true
    val exactMap = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    for (r <- Reshape.x108(spark, sfSmoke).collect()) {
      assert(r.getLong(1) === exactMap(r.getString(0)), s"${r.getString(0)} exact")
      assert(r.getBoolean(2), s"${r.getString(0)}: sketch_ok must hold")
    }
  }
}
