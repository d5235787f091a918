package graft.engine.chi

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core fuzzy-logic building blocks of the Chi-FRBCS-CS engine, expressed as
  * pure Column algebra so every use stays inside whole-stage codegen — no
  * UDFs, no serialization (SURVEY.md §2.6).
  *
  * Semantics per López/del Río/Benítez/Herrera, Fuzzy Sets and Systems 258
  * (2015) §2.1/§4.1 (the paper the reference repo implements; the reference
  * mount was empty this round — SURVEY.md §0):
  *  - L triangular membership functions equally distributed over the declared
  *    attribute range [lo,hi], crossing at 0.5, half-triangles at the edges.
  *  - Rule antecedent label = argmax membership, ties → lowest label index.
  *  - Matching degree = product t-norm over attributes.
  */
object ChiCore {

  /** Equally-spaced triangular partition over [lo, hi] with L labels.
    * Center of label k is lo + k·(hi−lo)/(L−1); half-width (hi−lo)/(L−1). */
  final case class TriPartition(lo: Double, hi: Double, numLabels: Int = 3) {
    require(numLabels >= 2, "need at least 2 linguistic labels")
    val halfWidth: Double = (hi - lo) / (numLabels - 1)
    val centers: IndexedSeq[Double] =
      (0 until numLabels).map(k => lo + k * halfWidth)
  }

  /** μ_k(x) = max(0, 1 − |x − c_k| / w): triangular membership. Mirrors the
    * oracle's GREATEST(0, 1 - ABS(x-c)/w) operation-for-operation so doubles
    * stay bit-identical across engines. */
  def membership(x: Column, center: Double, halfWidth: Double): Column =
    greatest(lit(0.0), lit(1.0) - abs(x - lit(center)) / lit(halfWidth))

  /** All L memberships of x under a partition, ascending label order. */
  def memberships(x: Column, p: TriPartition): Seq[Column] =
    p.centers.map(c => membership(x, c, p.halfWidth))

  /** argmax label with ties resolved to the LOWEST label index: label k wins
    * iff μ_k ≥ μ_j for every j > k and no earlier label won. Identical CASE
    * chain to the oracle (FIXTURES.md ML_CTE). */
  def argmaxLabel(ms: Seq[Column]): Column = {
    val n = ms.size
    (0 until n - 1).foldLeft(when(lit(false), 0)) { (acc, k) =>
      val cond = (k + 1 until n).map(j => ms(k) >= ms(j)).reduce(_ && _)
      acc.when(cond, k)
    }.otherwise(n - 1)
  }

  /** Membership of x against the center selected by a (dynamic) label column —
    * used when the antecedent label comes from a rule row, not a constant. */
  def membershipAt(x: Column, label: Column, p: TriPartition): Column = {
    val centerExpr = p.centers.zipWithIndex.init
      .foldLeft(when(lit(false), 0.0)) { case (acc, (c, k)) => acc.when(label === k, c) }
      .otherwise(p.centers.last)
    greatest(lit(0.0), lit(1.0) - abs(x - centerExpr) / lit(p.halfWidth))
  }
}
