package graft

import org.scalatest.funsuite.AnyFunSuite

/** x18 IVF-ANN recall against the exact q45 baseline. */
class AnnIvfSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x18 IVF top-20 recalls most of the exact cosine top-20") {
    val exact = graft.queries.LlmExt.q45(spark, sfSmoke).collect()
      .map(_.getLong(0)).toSet
    val approx = graft.queries.AnnIvf.x18(spark, sfSmoke).collect()
      .map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF nprobe=4/16 recall $recall too low; got $approx vs $exact")
    // determinism: same result twice (fixed KMeans seed)
    val again = graft.queries.AnnIvf.x18(spark, sfSmoke).collect().map(_.getLong(0)).toSet
    assert(again === approx)
  }
}
