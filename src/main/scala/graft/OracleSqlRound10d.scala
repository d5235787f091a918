package graft

/** DuckDB oracle SQL, round-10 fourth batch (x242+): the Hilbert-curve
  * layout audit (the SAME 8-level reflect/swap arithmetic the engine
  * chains, rendered as nested SELECTs — [[graft.engine.Hilbert]]), and the
  * statistical-protocol / search keys added alongside it. Everything is
  * exact integer arithmetic end to end.
  */
object OracleSqlRound10d {

  def round10d: Map[String, String] = Map(

    // x242: identical Hilbert arithmetic (Hilbert.nestedSql renders `//`
    // for DuckDB, the engine chains the same steps with `DIV`) over the
    // same 8-bit quantization x150 uses.
    "x242_hilbert_layout" -> {
      val base =
        """SELECT CAST((l_partkey * 256) // (maxp + 1) AS INT) AS px,
          |       CAST((l_suppkey * 256) // (maxs + 1) AS INT) AS py
          |FROM lineitem CROSS JOIN
          |     (SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs
          |      FROM lineitem) m""".stripMargin
      s"""SELECT CAST(hd8 // 256 AS BIGINT) AS tile, COUNT(*) AS n_rows,
        |       CAST(MIN(px) AS BIGINT) AS min_px,
        |       CAST(MAX(px) AS BIGINT) AS max_px,
        |       CAST(MIN(py) AS BIGINT) AS min_py,
        |       CAST(MAX(py) AS BIGINT) AS max_py
        |FROM (${graft.engine.Hilbert.nestedSql(base)})
        |GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )
}
