package graft.engine

/** Hilbert-curve index (xy2d on a 256×256 grid) as PORTABLE integer
  * arithmetic shared by both engines — the x150 [[ZOrder]] contract
  * extended to the curve lakehouse writers actually prefer for range
  * clustering: unlike Morton order, consecutive Hilbert cells are ALWAYS
  * grid-adjacent (no diagonal jumps across the key space), so a
  * consecutive-key file holds a geometrically connected region and a
  * two-sided range predicate never straddles the long seams a Z-curve has
  * at every power-of-two boundary.
  *
  * The classic top-down construction (one quadrant decision + one
  * reflect/swap rotation per bit level) unrolls into 8 levels of pure
  * div/mod/CASE column definitions over running state (hx, hy, hd); no
  * engine bit operators, no recursion. Because substitution would double
  * the expression per level (2⁸ blowup), each level is a NAMED column:
  * Spark chains `withColumn`, DuckDB chains nested SELECTs — identical
  * arithmetic, verified cell-for-cell bijective and unit-step adjacent
  * over the whole 65 536-cell grid in Round10fSpec.
  */
object Hilbert {
  /** Per-level column definitions, in dependency order. Input columns
    * `hx0`/`hy0` are the 8-bit quantized coordinates and `hd0` = 0; the
    * final Hilbert index is `hd8` ∈ [0, 65535]. `div` is the integer
    * floor-division token (`DIV` for Spark SQL, `//` for DuckDB). */
  def steps(div: String): Seq[(String, String)] = (0 until 8).flatMap { i =>
    val s = 1L << (7 - i)
    val (x, y, d)  = (s"hx$i", s"hy$i", s"hd$i")
    val (rx, ry)   = (s"hrx$i", s"hry$i")
    Seq(
      rx -> s"(($x) $div $s) % 2",
      ry -> s"(($y) $div $s) % 2",
      // quadrant gray-code: (3·rx) XOR ry without a XOR operator
      s"hd${i + 1}" -> s"$d + ${s * s} * (CASE WHEN $rx = 0 THEN $ry ELSE 3 - $ry END)",
      // rotation: ry=1 → identity; ry=0 ∧ rx=1 → reflect both then swap;
      // ry=0 ∧ rx=0 → swap only
      s"hx${i + 1}" -> s"CASE WHEN $ry = 1 THEN $x WHEN $rx = 1 THEN 255 - $y ELSE $y END",
      s"hy${i + 1}" -> s"CASE WHEN $ry = 1 THEN $y WHEN $rx = 1 THEN 255 - $x ELSE $x END")
  }

  /** DuckDB side: wrap a base query producing columns `px`, `py` into the
    * nested-select chain; the outermost query exposes `px`, `py`, `hd8`. */
  def nestedSql(base: String): String = {
    var q = s"SELECT *, px AS hx0, py AS hy0, 0 AS hd0 FROM ($base)"
    steps("//").foreach { case (n, e) => q = s"SELECT *, $e AS $n FROM ($q)" }
    q
  }
}
