package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-dimension vector kernels.
  *
  * Backed by the native codegen'd Catalyst expressions in
  * [[graft.engine.expr]] (`fvec_dot` / `fvec_l2sq`, installed by
  * [[Sessions.withGraftConf]] via `SparkSessionExtensions`): one expression
  * node per kernel whose generated code is a primitive float loop — replacing
  * the earlier 64-term unrolled `element_at` chains, which carried a
  * 192-node expression tree through Catalyst per kernel. The loop accumulates
  * ascending with a double accumulator, bit-identical to the unrolled chain,
  * the `aggregate(zip_with(...))` fold, and DuckDB's list evaluation — so
  * oracle parity is unaffected. */
object VectorKernels {
  /** Σᵢ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column = call_function("fvec_dot", a, b)

  /** Σᵢ aᵢ² */
  def normSq(a: Column): Column = call_function("fvec_dot", a, a)

  /** Σᵢ (aᵢ−bᵢ)² — spelled `(a[i]-b[i]) * (a[i]-b[i])` exactly like the
    * oracle SQL. */
  def l2Sq(a: Column, b: Column): Column = call_function("fvec_l2sq", a, b)

  /** cosine(a, b), rounded to 6dp (the oracle-checked output form). */
  def cosine6(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b))), 6)

  /** cosine(a, b) in INTEGER MICRO-UNITS: round(cos·10⁶, 0) cast BIGINT —
    * the bit-stable cross-engine form for derived float scores (6-dp double
    * rounding diverges at shortest-decimal boundary values; round-to-0 of
    * the ×10⁶ product agrees on any double that is not an exact .5). */
  def cosineMicro(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b))) * 1000000, 0)
      .cast(org.apache.spark.sql.types.LongType)
}
