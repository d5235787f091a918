package graft

/** Round-15 oracle statements.
  *
  * x315 replays x298's exact-substring gram truth (the committed
  * round-13 CTE chain) and then INDEPENDENTLY applies the cut: coverage
  * positions from the flagged starts, per-doc position-set subtraction,
  * cleaned text rebuilt by list comprehension. The cross-engine hash
  * match is the conservation check — both engines derive kept/removed/
  * cleaned from the same stated truth via different position arithmetic.
  */
object OracleSqlRound15 {

  val round15: Map[String, String] = Map(
    // x315: the substring-dedup APPLY pass — x298's flagged-window truth
    // drives a per-document token cut; the survivor audit (n_flag_survive)
    // is RECOMPUTED here, not stated TRUE, because a cut junction can in
    // principle rebuild a flagged gram (never observed; both engines
    // would agree if it happened).
    "x315_substring_dedup_apply" ->
      """WITH toks AS (
        |  SELECT doc_id, [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |sites AS (
        |  SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+12], ' ') AS gram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS u(i)
        |  WHERE len(t) >= 13),
        |g AS (SELECT gram FROM sites GROUP BY gram HAVING COUNT(*) >= 2),
        |f AS (SELECT s.doc_id, s.p FROM sites s JOIN g USING (gram)),
        |runs AS (
        |  SELECT doc_id, CAST(SUM(brk) AS BIGINT) AS n_runs_cut
        |  FROM (SELECT doc_id,
        |          CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
        |                 <= 13 THEN 0 ELSE 1 END AS brk
        |        FROM f)
        |  GROUP BY doc_id),
        |cov AS (
        |  SELECT DISTINCT doc_id, p + j AS cpos
        |  FROM f, UNNEST(generate_series(0, 12)) AS v(j)),
        |cuts AS (
        |  SELECT doc_id, list_sort(list(cpos)) AS cut,
        |         CAST(COUNT(*) AS BIGINT) AS removed_tokens
        |  FROM cov GROUP BY doc_id),
        |cleaned AS (
        |  SELECT tk.doc_id, tk.t,
        |         [tk.t[i] FOR i IN generate_series(1, len(tk.t))
        |          IF NOT list_contains(COALESCE(cu.cut, CAST([] AS BIGINT[])),
        |                               i - 1)] AS kept,
        |         COALESCE(cu.removed_tokens, 0) AS removed_tokens,
        |         COALESCE(r.n_runs_cut, 0) AS n_runs_cut
        |  FROM toks tk
        |  LEFT JOIN cuts cu USING (doc_id)
        |  LEFT JOIN runs r USING (doc_id)),
        |csites AS (
        |  SELECT doc_id, array_to_string(kept[i:i+12], ' ') AS gram
        |  FROM cleaned, UNNEST(generate_series(1, len(kept) - 12)) AS w(i)
        |  WHERE len(kept) >= 13),
        |surv AS (
        |  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_flag_survive
        |  FROM csites s JOIN g USING (gram) GROUP BY s.doc_id)
        |SELECT cl.doc_id,
        |       CAST(len(cl.t) AS BIGINT) AS n_tokens,
        |       CAST(len(cl.kept) AS BIGINT) AS kept_tokens,
        |       CAST(cl.removed_tokens AS BIGINT) AS removed_tokens,
        |       CAST(cl.n_runs_cut AS BIGINT) AS n_runs_cut,
        |       COALESCE(sv.n_flag_survive, 0) AS n_flag_survive,
        |       CAST(len(cl.kept) AS BIGINT) + CAST(cl.removed_tokens AS BIGINT)
        |         = CAST(len(cl.t) AS BIGINT) AS conserve_ok,
        |       COALESCE(array_to_string(cl.kept, ' '), '') AS cleaned_text
        |FROM cleaned cl
        |LEFT JOIN surv sv USING (doc_id)
        |ORDER BY cl.doc_id""".stripMargin,

    // x316: gram-grain novelty rollup — x298's site/gram CTEs with a
    // min-doc/occurrence aggregate and a per-source rollup; every
    // aggregated column cast BIGINT before // (the HUGEINT rule).
    "x316_gram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |sites AS (
        |  SELECT doc_id, source, array_to_string(t[i:i+12], ' ') AS gram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS u(i)
        |  WHERE len(t) >= 13),
        |g AS (SELECT gram, MIN(doc_id) AS first_doc, COUNT(*) AS occ
        |      FROM sites GROUP BY gram)
        |SELECT s.source,
        |       COUNT(*) AS n_sites,
        |       CAST(SUM(CASE WHEN s.doc_id = g.first_doc THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN g.occ >= 2 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_dup_sites,
        |       CAST(SUM(CASE WHEN s.doc_id = g.first_doc THEN 1 ELSE 0 END)
        |            AS BIGINT) * 1000000 // COUNT(*) AS novelty_ppm,
        |       CAST(SUM(CASE WHEN g.occ >= 2 THEN 1 ELSE 0 END)
        |            AS BIGINT) * 1000000 // COUNT(*) AS dup_ppm
        |FROM sites s JOIN g USING (gram)
        |GROUP BY s.source ORDER BY s.source""".stripMargin,

    // x317: exact band-filtered top-5 per anchor — q45's cosine kernel
    // in micro-units, band BEFORE rank, (cos DESC, neg_id) total order.
    "x317_hard_negative_mining" ->
      """WITH nzv AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE list_sum([CAST(embedding[i] AS DOUBLE) *
        |                  CAST(embedding[i] AS DOUBLE)
        |                  FOR i IN generate_series(1, 64)]) > 0),
        |anc AS (SELECT vec_id AS anchor_id, embedding AS ae
        |        FROM nzv WHERE vec_id % 50 = 0),
        |p AS (
        |  SELECT a.anchor_id, e.vec_id AS neg_id,
        |    CAST(ROUND(
        |      list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(a.ae[i] AS DOUBLE)
        |                FOR i IN generate_series(1, 64)]) /
        |      (SQRT(list_sum([CAST(e.embedding[i] AS DOUBLE) *
        |                      CAST(e.embedding[i] AS DOUBLE)
        |                      FOR i IN generate_series(1, 64)])) *
        |       SQRT(list_sum([CAST(a.ae[i] AS DOUBLE) * CAST(a.ae[i] AS DOUBLE)
        |                      FOR i IN generate_series(1, 64)])))
        |      * 1000000, 0) AS BIGINT) AS cos_micro
        |  FROM nzv e, anc a WHERE e.vec_id <> a.anchor_id),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
        |                               ORDER BY cos_micro DESC, neg_id)
        |            AS rank
        |  FROM p WHERE cos_micro BETWEEN 400000 AND 980000)
        |SELECT anchor_id, CAST(rank AS BIGINT) AS rank, neg_id, cos_micro
        |FROM r WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin
  )
}
