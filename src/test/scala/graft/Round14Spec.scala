package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 operator contracts: x308 Ave fusion. */
class Round14Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x308 m=1 degeneracy: Ave report == Max report when there is one chunk") {
    // With a single chunk there is nothing to average or maximize over —
    // both reducers emit the mapper's resolved RB (Ave modulo its micro
    // quantization of rw, which the ppm-grain report absorbs).
    val ave = graft.queries.ChiMl.x308(spark, sfSmoke)
      .filter(col("m") === 1).collect().map(_.toSeq).toSeq
    val max = graft.queries.ChiMl.x281(spark, sfSmoke)
      .filter(col("m") === 1).collect().map(_.toSeq).toSeq
    assert(ave === max)
  }

  test("x308 planted conflict: Ave flips the consequent Max picks") {
    import spark.implicits._
    // One antecedent cell (grid-point vector x1=1.0, x2=0.0 → memberships
    // are exactly 1, so weights reduce to cost·multiplicity), three
    // chunks: chunks 0 and 1 learn class 1 (chunk-local rw ≈ 0.746 and
    // 0.068), chunk 2 learns class 0 (rw ≈ 0.679). Max keeps the single
    // most optimistic rule → class 1 (0.746); Ave averages class 1 to
    // ≈ 0.407, below class 0's 0.679 → class 0. The planted conflict is
    // the operator's reason to exist.
    val gex = Seq(
      (0, 1.0, 0.0, 0, 0, 1, 9L), (0, 1.0, 0.0, 0, 0, 0, 1L),
      (1, 1.0, 0.0, 0, 0, 1, 6L), (1, 1.0, 0.0, 0, 0, 0, 4L),
      (2, 1.0, 0.0, 0, 0, 1, 2L), (2, 1.0, 0.0, 0, 0, 0, 8L)
    ).toDF("chunk", "x1", "x2", "a1", "a2", "cls", "mcnt")
    val maxRb = graft.queries.ChiMl.mChunkFusedRbFrom(gex).collect()
    val aveRb = graft.queries.ChiMl.mChunkAveFusedRbFrom(gex).collect()
    assert(maxRb.length === 1 && aveRb.length === 1)
    assert(maxRb.head.getAs[Int]("rcls") === 1)
    assert(aveRb.head.getAs[Int]("rcls") === 0)
    // Ave's winning weight is chunk 2's rw quantized to micro-units
    assert(math.abs(aveRb.head.getAs[Double]("rw") - 0.679012) < 1e-6)
  }

  test("x309 fp flag: planted duplicate passage flagged; over-flag-only vs gram truth") {
    import spark.implicits._
    val passage = (1 to 15).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"beta gamma $passage"),
      (3L, "entirely unrelated words " + (1 to 12).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val flagged = graft.queries.LlmExt2.x309FpFlagged(docs, 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 15-token shared passage has three 13-token windows per doc,
    // at offsets 1..3 in doc 1 and 2..4 in doc 2 (0-based window starts)
    val expected = Set((1L, 1L), (1L, 2L), (1L, 3L),
                       (2L, 2L), (2L, 3L), (2L, 4L))
    // completeness (the theorem direction): every gram-duplicated window
    // is fp-flagged. The fp side may only ADD positions on a collision —
    // none occurs on this corpus, so equality holds exactly here.
    assert(flagged === expected)
  }

  test("x309 registered key: fp_ok true on every row at sf0.001") {
    val rows = graft.queries.LlmExt2.x309(spark, sfSmoke).collect()
    assert(rows.forall(_.getAs[Boolean]("fp_ok")))
  }

  test("x311 production-k SemDeDup: scaled k, per-row contract, determinism") {
    val rows = graft.queries.Clustering.x311(spark, sfSmoke).collect()
    // 500 vectors at sf0.001 → k = max(8, 500/25) = 20, hash-pinned
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("k") === 20L))
    // per-row contract (x284's, at the scaled k): keeper is an EARLIER
    // vector, similarity at or above the 0.40 drop threshold, cell id
    // within the scaled centroid range
    rows.foreach { r =>
      assert(r.getAs[Long]("keeper") < r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("cos_micro") >= 400000L)
      assert(r.getAs[Long]("cell") >= 0L && r.getAs[Long]("cell") < 20L)
    }
    // determinism: the chain at the same k reproduces the same drop set
    // (idempotence on survivors then follows from the x284 argument —
    // Round12Spec — unchanged by the cell count)
    val again = graft.queries.Clustering.semDedupAt(spark, sfSmoke, 20)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(again === rows.map(_.getAs[Long]("vec_id")).toSet)
  }
}
