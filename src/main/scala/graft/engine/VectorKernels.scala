package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Fixed-dimension vector kernels as UNROLLED column expressions.
  *
  * `aggregate(zip_with(...))` higher-order functions are evaluated
  * interpreted, per element, per row; for a known dimension the same fold
  * unrolled into a 64-term expression compiles into whole-stage codegen and
  * runs ~an order of magnitude faster. The unrolled sum is a left-associative
  * ascending chain — bit-identical to the HOF fold (whose leading 0.0 + t₁
  * is exactly t₁) and to DuckDB's list_sum ordering, so oracle parity is
  * unaffected. */
object VectorKernels {
  private def at(v: Column, i: Int): Column = element_at(v, i).cast(DoubleType)

  /** Σᵢ aᵢ·bᵢ */
  def dot(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => at(a, i) * at(b, i)).reduce(_ + _)

  /** Σᵢ aᵢ² */
  def normSq(a: Column, dim: Int): Column =
    (1 to dim).map(i => at(a, i) * at(a, i)).reduce(_ + _)

  /** Σᵢ (aᵢ−bᵢ)² — the subtraction is spelled twice exactly like the oracle's
    * `(a[i]-b[i]) * (a[i]-b[i])`; codegen's subexpression elimination dedups. */
  def l2Sq(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => (at(a, i) - at(b, i)) * (at(a, i) - at(b, i))).reduce(_ + _)

  /** cosine(a, b), rounded to 6dp (the oracle-checked output form). */
  def cosine6(a: Column, b: Column, dim: Int): Column =
    round(dot(a, b, dim) / (sqrt(normSq(a, dim)) * sqrt(normSq(b, dim))), 6)
}
