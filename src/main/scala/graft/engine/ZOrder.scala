package graft.engine

/** Z-order (Morton) interleave as PORTABLE integer arithmetic — the same
  * expression string renders for Spark SQL (`DIV`) and DuckDB (`//`), so
  * the layout audit (x151) can be oracle-checked bit for bit. Bit i of
  * each 8-bit quantized coordinate lands at output bit 2i (x) / 2i+1 (y):
  * `z = Σ ((px div 2^i) mod 2)·4^i + ((py div 2^i) mod 2)·2·4^i`.
  * Plain div/mod/multiply — no engine-specific bit operators. */
object ZOrder {
  def zExpr(px: String, py: String, div: String): String =
    (0 until 8).map { i =>
      val p2 = 1L << i; val p4 = 1L << (2 * i)
      s"((($px) $div $p2) % 2) * $p4 + ((($py) $div $p2) % 2) * ${2 * p4}"
    }.mkString(" + ")
}
