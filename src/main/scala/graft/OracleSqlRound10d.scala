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
    },

    // x243: positions materialize only in the oracle (unnest + subscripts
    // + self-join); the engine's in-map adjacent-bigram transform computes
    // the same pairs without ever forming a position table.
    "x243_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '')
        |           AS ts
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p
        |  FROM toks),
        |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY 1),
        |top10 AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 10),
        |pairs AS (
        |  SELECT a.doc_id, a.tok AS t1, b.tok AS t2
        |  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1),
        |succ AS (
        |  SELECT t1, t2, COUNT(*) AS cnt,
        |         ROW_NUMBER() OVER (PARTITION BY t1
        |                            ORDER BY COUNT(*) DESC, t2) AS rn
        |  FROM pairs WHERE t1 IN (SELECT tok FROM top10) GROUP BY 1, 2),
        |phrases AS (
        |  SELECT s.t1, s.t2, s.cnt, t.df AS df1
        |  FROM succ s JOIN top10 t ON t.tok = s.t1 WHERE s.rn = 1),
        |hits AS (
        |  SELECT ph.t1, ph.t2, ph.df1, ph.cnt, p.doc_id
        |  FROM pairs p JOIN phrases ph ON p.t1 = ph.t1 AND p.t2 = ph.t2)
        |SELECT t1 || ' ' || t2 AS phrase, CAST(df1 AS BIGINT) AS df1,
        |       COUNT(DISTINCT doc_id) AS n_docs,
        |       CAST(MIN(cnt) AS BIGINT) AS n_occ,
        |       CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM hits GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // x244: the 16 replicate branches are GENERATED from the same shared
    // thresholds/mixers the engine folds (graft.queries.StatProtocol).
    "x244_poisson_bootstrap" -> {
      import graft.queries.StatProtocol._
      val sels = (0 until bootstrapReps).map { r =>
        val ladder = poissonLadderSql("h")
        s"""SELECT $r AS rep, SUM(w) AS n_eff, SUM(w * cents) AS sum_cents
          |FROM (SELECT $ladder AS w, cents FROM (
          |  SELECT (o_orderkey * $mixA + ${(r + 1) * mixB}) % $mersenne AS h,
          |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
          |  FROM orders))""".stripMargin
      }
      s"""SELECT CAST(rep AS BIGINT) AS rep, CAST(n_eff AS BIGINT) AS n_eff,
        |       CAST(sum_cents AS BIGINT) AS sum_cents,
        |       CAST(CAST(sum_cents AS HUGEINT) * 1000000
        |            // CAST(n_eff AS HUGEINT) AS BIGINT) AS mean_micros
        |FROM (${sels.mkString(" UNION ALL ")}) ORDER BY rep""".stripMargin
    }
  )
}
