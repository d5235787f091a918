package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.chi.ChiCore
import graft.engine.chi.ChiCore.TriPartition

/** Membership-function and argmax-convention properties (SURVEY.md §5.2.3). */
class ChiCoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val p = TriPartition(0.0, 10.0)

  private def evalMemberships(xs: Seq[Double], part: TriPartition): Seq[Seq[Double]] = {
    val df = xs.toDF("x")
    df.select(ChiCore.memberships(col("x"), part).zipWithIndex
        .map { case (c, i) => c.as(s"m$i") }: _*)
      .collect().map(r => (0 until part.numLabels).map(r.getDouble)).toSeq
  }

  test("memberships are in [0,1] and sum to 1 on interior points (L=3)") {
    val xs = (0 to 100).map(_ * 0.1)
    val ms = evalMemberships(xs, p)
    for ((x, m) <- xs.zip(ms)) {
      assert(m.forall(v => v >= 0.0 && v <= 1.0), s"x=$x m=$m")
      assert(math.abs(m.sum - 1.0) < 1e-9, s"x=$x sum=${m.sum}")
    }
  }

  test("adjacent memberships cross at 0.5 (quartile points)") {
    val ms = evalMemberships(Seq(2.5, 7.5), p)
    assert(ms(0)(0) === 0.5 && ms(0)(1) === 0.5 && ms(0)(2) === 0.0)
    assert(ms(1)(1) === 0.5 && ms(1)(2) === 0.5 && ms(1)(0) === 0.0)
  }

  test("argmax label ties resolve to the lowest index") {
    val df = Seq(2.5, 7.5, 5.0, 0.0, 10.0).toDF("x")
    val labels = df.select(ChiCore.argmaxLabel(ChiCore.memberships(col("x"), p)).as("a"))
      .collect().map(_.getInt(0)).toSeq
    // 2.5: μ0=μ1=0.5 → 0;  7.5: μ1=μ2=0.5 → 1;  centers are unambiguous
    assert(labels === Seq(0, 1, 1, 0, 2))
  }

  test("argmax equals scala-side argmax with lowest-index ties (value grid)") {
    val xs = (-10 to 110).map(_ * 0.1) ++ Seq(2.5, 5.0, 7.5)
    val got = xs.toDF("x")
      .select(col("x"), ChiCore.argmaxLabel(ChiCore.memberships(col("x"), p)).as("a"))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    for (x <- xs) {
      val mus = p.centers.map(c => math.max(0.0, 1.0 - math.abs(x - c) / p.halfWidth))
      val expected = mus.zipWithIndex.maxBy { case (m, i) => (m, -i) }._2
      assert(got(x) === expected, s"x=$x")
    }
  }

  test("generic L=5 partition has equally spaced centers") {
    val p5 = TriPartition(0.0, 8.0, 5)
    assert(p5.centers === IndexedSeq(0.0, 2.0, 4.0, 6.0, 8.0))
    assert(p5.halfWidth === 2.0)
  }
}
