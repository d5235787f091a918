package graft

import org.scalatest.funsuite.AnyFunSuite

/** x214 join-size estimation audit — the estimator theorems, recounted
  * naively: per-key histogram product IS the equi-join size; bucket
  * coarsening can only inflate; uniform holds when the key side is unique. */
class OptimizerStatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  test("x214: perkey identity, bucket upper bound, uniform under the key assumption") {
    val ok = Tables.orders(spark, sfSmoke).select("o_custkey").collect()
      .map(_.getLong(0))
    val ck = Tables.customer(spark, sfSmoke).select("c_custkey").collect()
      .map(_.getLong(0))
    val co = ok.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cc = ck.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = co.map { case (k, n) => n * cc.getOrElse(k, 0L) }.sum
    val bo = ok.groupBy(_ % 64).view.mapValues(_.length.toLong).toMap
    val bc = ck.groupBy(_ % 64).view.mapValues(_.length.toLong).toMap
    val bucket = bo.map { case (b, n) => n * bc.getOrElse(b, 0L) }.sum
    val r = graft.queries.Features.x214(spark, sfSmoke).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(0) === exact, "exact join size")
    // identity: per-key histogram product equals the join size exactly
    assert(row.getLong(1) === exact, "perkey_est must equal exact")
    assert(row.getLong(2) === bucket, "bucket_est recount")
    // upper bound: coarsening the key partition only inflates
    assert(row.getLong(2) >= row.getLong(0), "bucket_est must dominate exact")
    // uniform formula is exact when custkey is a key of customer
    assert(cc.values.forall(_ == 1L), "custkey must be unique in customer")
    val uni = BigDecimal(ok.length.toLong * ck.length.toLong * 1.0 /
        math.max(co.size, cc.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(3) - uni) < 1e-9, "uniform_est")
    // non-vacuity: the dense key space must actually collide in 64 buckets
    assert(row.getLong(2) > row.getLong(0), "bucket collisions must show up")
  }
}
