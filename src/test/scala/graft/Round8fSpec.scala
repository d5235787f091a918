package graft

import org.scalatest.funsuite.AnyFunSuite

/** x182 structural invariants: the ADC distance decomposes into exactly
  * four LUT lookups, and approximate ranking correlates with exact
  * distances (the query's own PQ cell ranks at the top). */
class Round8fSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Clustering

  test("x182 ADC top-10: total order, 10 rows, query vector ranks first") {
    val rows = Clustering.x182(spark, sfSmoke).collect()
    assert(rows.length === 10)
    val keys = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(keys.toSeq === keys.sorted.toSeq)
    // vec 0 IS the query and IS codeword 0: its four subspace codes are
    // exact, so its ADC distance is 0 and it must rank first
    assert(rows.head.getLong(0) === 0L)
    assert(rows.head.getLong(1) === 0L, "query's ADC to itself must be 0")
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("x182 every reported ADC equals the sum of its four subspace LUT entries") {
    // rebuild the LUT and codes naively on collected vectors
    val emb = Tables.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = emb(0L)
    val cbIds = emb.keys.filter(_ < 8).toSeq.sorted
    def d2(a: Array[Float], b: Array[Float], sub: Int): Double = {
      var s = 0.0
      var i = sub * 16
      while (i < sub * 16 + 16) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      math.rint(s * 1e6) / 1e6
    }
    val lut = (for (sub <- 0 until 4; c <- cbIds)
      yield (sub, c) -> math.rint(d2(emb(c), q, sub) * 1e6).toLong).toMap
    val got = Clustering.x182(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (v, adc) =>
      val expect = (0 until 4).map { sub =>
        val best = cbIds.minBy(c => (d2(emb(c), emb(v), sub), c))
        lut((sub, best))
      }.sum
      assert(adc === expect, s"vec $v ADC mismatch")
    }
  }
}
