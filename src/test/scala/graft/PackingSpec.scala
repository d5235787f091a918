package graft

import org.scalatest.funsuite.AnyFunSuite

/** x213 packing-efficiency audit — naive in-JVM replay of the x32
  * pack-then-chop stream plus the window-count-optimality theorem. */
class PackingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x213 equals the naive per-shard packing replay; chop is window-count-optimal") {
    val C = 16384L
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byShard = docs.groupBy(_._1 % 8).view.mapValues(_.sortBy(_._1)).toMap
    val got = graft.queries.Pipeline.x213(spark, sfSmoke).collect()
    assert(got.map(_.getLong(0)).toSeq === (0L to 7L))
    got.foreach { r =>
      val shard = r.getLong(0)
      val ds = byShard(shard)
      val offs = ds.map(_._2).scanLeft(0L)(_ + _) // start offset per doc
      val total = ds.map(_._2).sum
      val straddled = ds.zip(offs).count { case ((_, n), off) =>
        n > 0 && off / C != (off + n - 1) / C }
      assert(r.getLong(1) === ds.length.toLong, s"n_docs shard $shard")
      assert(r.getLong(2) === total, s"total_chars shard $shard")
      assert(r.getLong(5) === straddled.toLong, s"straddled shard $shard")
      // THE THEOREM: pack-then-chop uses exactly ceil(total/C) windows —
      // the measured occupied-window count equals the lower bound
      assert(r.getLong(3) === (total + C - 1) / C, s"n_windows shard $shard")
      assert(r.getLong(3) === r.getLong(4), s"optimality shard $shard")
      // tail padding is the final window's remainder, always < C
      assert(r.getLong(7) === r.getLong(3) * C - total, s"tail_pad shard $shard")
      assert(r.getLong(7) >= 0 && r.getLong(7) < C)
      val share = BigDecimal(straddled.toDouble / ds.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(6) - share) < 1e-12, s"share shard $shard")
    }
    // non-vacuity: the smoke corpus straddles at least one boundary
    assert(got.map(_.getLong(5)).sum > 0, "no straddles — audit is vacuous")
  }
}
