package graft

/** Round-14 oracle statements.
  *
  * x308 reuses the proven x281 generated chain (OracleSqlRound12
  * .mChunkChainAt) with the Ave reducer swapped in — the only varying
  * fragment is the `partial` → `final_rb` fusion stage, so the
  * membership/weight/scoring SQL stays byte-identical to the committed
  * x281 contract.
  */
object OracleSqlRound14 {

  /** The Ave fusion stage (Chi-FRBCS-BigData-Ave): per (antecedent,
    * consequent) average the partial-RB weights — numerator an exact
    * BIGINT sum of once-quantized micro-unit weights, the cross-consequent
    * comparison scaled by 720720 // cnt (lcm(1..16)) so averages over
    * different chunk counts compare in exact integers. The emitted rw is
    * the quantized average, one IEEE divide spelled identically on the
    * engine side (ChiMl.mChunkAveFusedRbFrom). */
  private val aveFusionSql =
    """avew AS (SELECT a1, a2, rule_cls,
      |                CAST(SUM(CAST(ROUND(rw * 1000000, 0) AS BIGINT))
      |                     AS BIGINT) AS s_micro,
      |                COUNT(*) AS cnt
      |         FROM partial GROUP BY 1, 2, 3),
      |fused AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
      |                                       ORDER BY s_micro * (720720 // cnt) DESC,
      |                                                rule_cls) AS fn
      |          FROM avew),
      |final_rb AS (SELECT a1, a2, rule_cls,
      |                    CAST(s_micro AS DOUBLE)
      |                      / CAST(cnt * 1000000 AS DOUBLE) AS rw
      |             FROM fused WHERE fn = 1),""".stripMargin

  /** x314's water-filling unroll, GENERATED (the x262/x281 enumeration
    * discipline): 24 rounds, each allocating `remaining DIV n_uncapped`
    * to every uncapped source truncated at its cap gap — convergence-safe
    * because every productive round caps a source or drives the residue
    * under n_uncapped, after which rounds are exact no-ops. All integer
    * arithmetic; HUGEINT sums cast to BIGINT before `//` (the r10 x229
    * exactness rule). */
  private def x314Sql: String = {
    // Each round references the PREVIOUS round's CTE exactly ONCE (the
    // per-round state — remaining budget and uncapped count — comes from
    // unpartitioned window sums, not scalar subqueries): DuckDB inlines
    // CTEs per reference, so a round with 4 references to its
    // predecessor expands 4^24 ways and dies on file handles before it
    // dies on CPU. With one reference per round the expansion is linear.
    val nUnc = "CAST(SUM(CASE WHEN alloc < cap THEN 1 ELSE 0 END) " +
      "OVER () AS BIGINT)"
    val allocd = "CAST(SUM(alloc) OVER () AS BIGINT)"
    val rounds = (1 to 24).map { k =>
      val prev = if (k == 1) "r0" else s"r${k - 1}"
      s"""r$k AS (
         |  SELECT source, t, cap,
         |    alloc + GREATEST(0, LEAST(
         |      CASE WHEN $nUnc > 0
         |           THEN ((SELECT b FROM bb) - $allocd) // $nUnc
         |           ELSE 0 END,
         |      cap - alloc)) AS alloc
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""WITH r0 AS (
       |  SELECT source, CAST(SUM(n) AS BIGINT) AS t,
       |         (11 * CAST(SUM(n) AS BIGINT)) // 10 AS cap,
       |         CAST(0 AS BIGINT) AS alloc
       |  FROM (SELECT source,
       |          len([x FOR x IN string_split(LOWER(text), ' ') IF x <> ''])
       |            AS n
       |        FROM documents)
       |  GROUP BY source),
       |bb AS (SELECT (5 * CAST(SUM(t) AS BIGINT)) // 4 AS b FROM r0),
       |$rounds
       |SELECT source, t, cap, alloc, alloc * 1000000 // t AS epochs_ppm,
       |       alloc = cap AS capped,
       |       $allocd <= (SELECT b FROM bb) AND
       |       ($nUnc = 0 OR
       |        (SELECT b FROM bb) - $allocd < $nUnc) AS conserve_ok
       |FROM r24 ORDER BY source""".stripMargin
  }

  val round14: Map[String, String] = Map(
    // x308: the m-chunk ablation under Ave fusion — one generated
    // train+score chain per m ∈ {1, 4, 16}, unioned (the x281 device).
    "x308_chi_mchunk_ave" ->
      Seq(1, 4, 16)
        .map(m => OracleSqlRound12.mChunkChainAt(m, aveFusionSql))
        .mkString("", "\nUNION ALL\n", "\nORDER BY m"),

    // x309 theorem form: exact per-doc gram truth (x298's site chain,
    // capped at the fingerprint expression's 256-token bound, rolled up
    // to duplicated-window + merged-run counts) + fp_ok = TRUE (the
    // engine-computed "fp-flagged ⊇ gram-flagged" containment, which
    // holds by construction because equal grams have equal fingerprints).
    "x309_substring_dedup_fp" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         ([x FOR x IN string_split(LOWER(text), ' ') IF x <> ''])[1:256]
        |           AS t
        |  FROM documents),
        |sites AS (
        |  SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+12], ' ') AS gram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS u(i)
        |  WHERE len(t) >= 13),
        |g AS (SELECT gram FROM sites GROUP BY gram HAVING COUNT(*) >= 2),
        |f AS (SELECT s.doc_id, s.p FROM sites s JOIN g USING (gram)),
        |b AS (
        |  SELECT doc_id, p,
        |         CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p)
        |                <= 13 THEN 0 ELSE 1 END AS brk
        |  FROM f)
        |SELECT doc_id, COUNT(*) AS n_dup_windows,
        |       CAST(SUM(brk) AS BIGINT) AS n_runs, TRUE AS fp_ok
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x310 theorem form (x18's device): the exact brute-force top-20 for
    // vec 0 (q45's kernel, ranked — recomputed verbatim here) + pq_ok =
    // TRUE; the engine computes the IVF-PQ recall-floor contract
    // (nprobe=4 probe + ADC shortlist + exact re-rank finds >= 5 of the
    // exact top-20) for real — a codebook/ADC/shortlist regression flips
    // the flag red.
    "x310_ann_ivfpq" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (SELECT e.vec_id,
        |  CAST(ROUND(
        |    list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |              FOR i IN generate_series(1,64)]) /
        |    (SQRT(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |                    FOR i IN generate_series(1,64)])) *
        |     SQRT(list_sum([CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
        |                    FOR i IN generate_series(1,64)]))),
        |  6) AS DOUBLE) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> 0),
        |top AS (SELECT vec_id, cos,
        |               ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rk
        |        FROM sims)
        |SELECT rk, vec_id, cos, TRUE AS pq_ok FROM top
        |WHERE rk <= 20 ORDER BY rk""".stripMargin,

    // x311: x284's verbatim SemDeDup chain at the PRODUCTION cell count
    // k = GREATEST(8, N // 25), k emitted as a column so the scaled-k
    // claim itself is hash-pinned.
    "x311_semdedup_production_k" ->
      """WITH e AS (SELECT vec_id,
        |            [CAST(embedding[i] AS DOUBLE)
        |             FOR i IN generate_series(1, 64)] AS emb
        |           FROM embeddings),
        |kk AS (SELECT GREATEST(8, COUNT(*) // 25) AS k FROM e),
        |c AS (SELECT vec_id AS cell, emb AS ce FROM e
        |      WHERE vec_id < (SELECT k FROM kk)),
        |a AS (SELECT vec_id, cell, emb,
        |             ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id)
        |               AS crn
        |      FROM (
        |  SELECT e.vec_id, c.cell, e.emb,
        |         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |           ROUND(list_sum([(e.emb[i] - c.ce[i]) * (e.emb[i] - c.ce[i])
        |                           FOR i IN generate_series(1, 64)]), 6),
        |           c.cell) AS rn
        |  FROM e CROSS JOIN c) WHERE rn = 1),
        |p AS (SELECT u.vec_id AS u_id, v.vec_id AS v_id, u.cell AS cell,
        |        CAST(ROUND(
        |          list_sum([u.emb[i] * v.emb[i]
        |                    FOR i IN generate_series(1, 64)])
        |          / (SQRT(list_sum([u.emb[i] * u.emb[i]
        |                            FOR i IN generate_series(1, 64)]))
        |           * SQRT(list_sum([v.emb[i] * v.emb[i]
        |                            FOR i IN generate_series(1, 64)])))
        |          * 1000000, 0) AS BIGINT) AS cos_micro
        |      FROM a u JOIN a v ON u.cell = v.cell AND u.vec_id < v.vec_id
        |                       AND u.crn <= 256),
        |d AS (SELECT v_id, cell, u_id, cos_micro,
        |        ROW_NUMBER() OVER (PARTITION BY v_id
        |                           ORDER BY cos_micro DESC, u_id) AS rn
        |      FROM p WHERE cos_micro >= 400000)
        |SELECT v_id AS vec_id, CAST(cell AS BIGINT) AS cell,
        |       u_id AS keeper, cos_micro,
        |       CAST((SELECT k FROM kk) AS BIGINT) AS k
        |FROM d WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // x312: planted-credential scan — the plant and the detector are both
    // exact integer/regex arithmetic, replayed verbatim.
    "x312_secret_scan" ->
      """WITH planted AS (
        |  SELECT doc_id, source,
        |         CASE WHEN doc_id % 53 = 0 THEN 1 ELSE 0 END AS is_planted,
        |         CASE WHEN doc_id % 53 = 0
        |              THEN text || ' sk' ||
        |                   lpad(CAST(doc_id * 2654435761 % 100000000000000
        |                             AS VARCHAR), 14, '0')
        |              ELSE text END AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, source, is_planted, tok,
        |         CASE WHEN LENGTH(tok) >= 16
        |                   AND regexp_matches(tok, '[0-9]')
        |                   AND regexp_matches(tok, '[A-Za-z]')
        |              THEN 1 ELSE 0 END AS hit
        |  FROM (SELECT doc_id, source, is_planted,
        |          UNNEST([x FOR x IN string_split(t, ' ') IF x <> '']) AS tok
        |        FROM planted)),
        |perdoc AS (
        |  SELECT doc_id, source, is_planted,
        |         CAST(SUM(hit) AS BIGINT) AS hits,
        |         CAST(SUM(CASE WHEN hit = 1
        |                       THEN len(list_distinct(string_split(tok, '')))
        |                       ELSE 0 END) AS BIGINT) AS hdc
        |  FROM toks GROUP BY 1, 2, 3)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_flagged_docs,
        |       CAST(SUM(hits) AS BIGINT) AS n_flagged_tokens,
        |       CAST(SUM(is_planted) AS BIGINT) AS n_planted,
        |       CAST(SUM(CASE WHEN is_planted = 1 AND hits > 0 THEN 1 ELSE 0
        |                END) AS BIGINT) AS caught_planted,
        |       CAST(SUM(hdc) AS BIGINT) AS sum_hit_distinct_chars,
        |       SUM(CASE WHEN is_planted = 1 AND hits > 0 THEN 1 ELSE 0 END)
        |         = SUM(is_planted) AS all_planted_caught
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,

    // x313: FIM transform audit — thirds arithmetic, sentinel rebuild,
    // token-conservation theorem, all replayed verbatim.
    "x313_fim_transform" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |         [x FOR x IN string_split(LOWER(text), ' ') IF x <> '']
        |           AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, source, toks, len(toks) AS n,
        |         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_fim,
        |         len(toks) // 3 AS a, (2 * len(toks)) // 3 AS b
        |  FROM base WHERE len(toks) >= 3),
        |built AS (
        |  SELECT doc_id, source, n, is_fim, a, b,
        |    CASE WHEN is_fim = 1 THEN
        |      concat_ws(' ', '<fim_pre>', array_to_string(toks[1:a], ' '),
        |                '<fim_suf>', array_to_string(toks[b+1:n], ' '),
        |                '<fim_mid>', array_to_string(toks[a+1:b], ' '))
        |    ELSE array_to_string(toks, ' ') END AS out_text
        |  FROM d),
        |b2 AS (
        |  SELECT *,
        |    len([x FOR x IN string_split(out_text, ' ') IF x <> ''])
        |      AS out_toks
        |  FROM built)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(is_fim) AS BIGINT) AS n_fim_docs,
        |       CAST(SUM(n) AS BIGINT) AS tokens_in,
        |       CAST(SUM(out_toks) AS BIGINT) AS tokens_out,
        |       CAST(SUM(CASE WHEN is_fim = 1 THEN b - a ELSE 0 END)
        |            AS BIGINT) AS middle_tokens,
        |       CAST(SUM(CASE WHEN is_fim = 1 THEN b - a ELSE 0 END)
        |            AS BIGINT) * 1000000
        |         // GREATEST(CAST(SUM(n) AS BIGINT), 1) AS mid_frac_ppm,
        |       CAST(SUM(LENGTH(out_text)) AS BIGINT) AS out_chars,
        |       CAST(MIN(CASE WHEN out_toks = n + is_fim * 3 THEN 1 ELSE 0
        |                END) AS BIGINT) AS conserve_ok
        |FROM b2 GROUP BY source ORDER BY source""".stripMargin,

    // x314: the generated 24-round water-filling unroll.
    "x314_epoch_allocation" -> x314Sql
  )
}
