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
        |ORDER BY doc_id, run_start""".stripMargin,

    "x299_dsir_selection" ->
      """WITH tf AS (
        |  SELECT doc_id, lang, source, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id, lang, source,
        |          UNNEST([x FOR x IN string_split(LOWER(text), ' ') IF x <> '']) AS tok
        |        FROM documents)
        |  GROUP BY doc_id, lang, source, tok),
        |vc AS (
        |  SELECT tok, CAST(SUM(c) AS BIGINT) AS c_raw,
        |         CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS BIGINT) AS c_tgt
        |  FROM tf GROUP BY tok),
        |tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
        |               CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
        |               COUNT(*) AS v FROM vc),
        |lam AS (
        |  SELECT tok,
        |         CAST(ROUND(LN(CAST((c_tgt + 1) * (n_raw + v) AS DOUBLE) /
        |                       CAST((c_raw + 1) * (n_tgt + v) AS DOUBLE))
        |                    * 1000000, 0) AS BIGINT) AS lam_micro
        |  FROM vc, tot),
        |pd AS (
        |  SELECT t.doc_id, t.source,
        |         CAST(SUM(t.c * l.lam_micro) AS BIGINT) AS score_micro
        |  FROM tf t JOIN lam l USING (tok) GROUP BY t.doc_id, t.source)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN score_micro > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
        |       CAST(SUM(CASE WHEN score_micro > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         * 1000000 // COUNT(*) AS sel_ppm,
        |       CAST(SUM(CASE WHEN score_micro > 0 THEN score_micro ELSE 0 END) AS BIGINT) AS sel_mass_micro
        |FROM pd GROUP BY source ORDER BY source""".stripMargin,

    "x300_context_chunking" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         len([x FOR x IN string_split(LOWER(text), ' ') IF x <> '']) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n, 1 + (GREATEST(n - 32, 0) + 23) // 24 AS n_chunks
        |  FROM d WHERE n >= 1)
        |SELECT doc_id, i - 1 AS chunk_id, (i - 1) * 24 AS start_tok,
        |       LEAST((i - 1) * 24 + 32, n) - 1 AS end_tok,
        |       LEAST((i - 1) * 24 + 32, n) - (i - 1) * 24 AS n_toks,
        |       32 - (LEAST((i - 1) * 24 + 32, n) - (i - 1) * 24) AS pad,
        |       CASE WHEN i = 1 THEN 0
        |            ELSE LEAST(8, LEAST((i - 1) * 24 + 32, n) - (i - 1) * 24)
        |       END AS overlap
        |FROM c, UNNEST(generate_series(1, n_chunks)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "x301_dedup_aware_split" ->
      """WITH g AS (
        |  SELECT LOWER(text) AS key, MIN(doc_id) AS gid
        |  FROM documents GROUP BY LOWER(text)),
        |gs AS (
        |  SELECT key, gid,
        |         CASE WHEN (((gid % 100000000) * 2654435761) % 2147483647) % 10 < 8
        |              THEN 'train' ELSE 'eval' END AS split
        |  FROM g),
        |m AS (
        |  SELECT d.doc_id, d.n_chars, gs.gid, gs.split
        |  FROM documents d JOIN gs ON LOWER(d.text) = gs.key),
        |ps AS (
        |  SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT gid) AS n_groups,
        |         CAST(SUM(n_chars) AS BIGINT) AS char_mass
        |  FROM m GROUP BY split),
        |tot AS (SELECT COUNT(DISTINCT gid) AS g_total FROM gs)
        |SELECT split, n_docs, n_groups, char_mass,
        |       SUM(n_groups) OVER () = g_total AS no_leakage
        |FROM ps, tot ORDER BY split""".stripMargin
  )
}
