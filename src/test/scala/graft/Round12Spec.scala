package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-12 specs: the m-chunk map-side Chi ablation (x281) and the
  * theorem-form contracts of the round-12 oracle upgrades. */
class Round12Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x281 m=1 fused rule base IS the global q41 rule base, rule for rule") {
    // the identity theorem: with one chunk, chunk-local weighting and
    // conflict resolution ARE the global computation, so max-RW fusion is
    // a no-op and the fused base must equal q41's (same 6dp output form)
    val fused = graft.queries.ChiMl.mChunkFusedRb(spark, sfSmoke, 1)
      .select(col("ra1").cast("long"), col("ra2").cast("long"),
              col("rcls").cast("long"), round(col("rw"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val global = graft.queries.ChiMl.q41(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(fused === global)
  }

  test("x281 report is well-formed at every m and m=1 matches the q43-style readout") {
    val rows = graft.queries.ChiMl.x281(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 4L, 16L))
    // ppm values are ratios of counts — bounded by construction
    assert(rows.forall(r => r._2 >= 1 &&
      r._3 >= 0 && r._3 <= 1000000 && r._4 >= 0 && r._4 <= 1000000))
    // chunking never invents antecedents: every chunk's candidates come
    // from that chunk's examples, so the union over chunks is exactly the
    // global candidate set and the fused RB (one rule per antecedent) is
    // bounded by the global distinct-antecedent count — a THEOREM of
    // candidate construction (note the bound is q40's antecedent grid, NOT
    // q41's surviving-rule count: a rule with global RW <= 0 can still win
    // a cleaner chunk, so fused size may exceed q41's)
    val nCandAnts = graft.queries.ChiMl.q40(spark, sfSmoke)
      .select("a1", "a2").distinct().count()
    assert(rows.forall(_._2 <= nCandAnts),
      s"fused RB sizes ${rows.map(_._2).toSeq} vs candidate grid $nCandAnts")
  }
}
