package graft

/** Round-13 oracle statements.
  *
  * x298 is hash-free by construction (the gram join key is the literal
  * 13-token substring), so the oracle is a verbatim SQL restatement of the
  * operator — positional k-gram explode, shared-gram filter, interval-union
  * run merge — with no theorem-form scaffolding needed.
  */
object OracleSqlRound13 {

  val round13: Map[String, String] = Map(
    "x298_substring_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |sites AS (
        |  SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+12], ' ') AS gram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS u(i)
        |  WHERE len(t) >= 13),
        |g AS (
        |  SELECT gram, MIN(doc_id) AS rep FROM sites
        |  GROUP BY gram HAVING COUNT(*) >= 2),
        |f AS (SELECT s.doc_id, s.p, g.rep FROM sites s JOIN g USING (gram)),
        |b AS (
        |  SELECT doc_id, p, rep,
        |         CASE WHEN p - LAG(p) OVER w <= 13 THEN 0 ELSE 1 END AS brk
        |  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
        |r AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
        |                           ROWS UNBOUNDED PRECEDING) AS rid
        |  FROM b)
        |SELECT doc_id, MIN(p) AS run_start, MAX(p) + 12 AS run_end,
        |       MAX(p) + 13 - MIN(p) AS n_tokens,
        |       COUNT(*) AS n_windows, MIN(rep) AS rep_doc
        |FROM r GROUP BY doc_id, rid
        |ORDER BY doc_id, run_start""".stripMargin
  )
}
