package graft

/** Round-12 oracle statements: theorem-form contracts for the four
  * previously `no_oracle` hash-seeded dedup keys (x01/x07/x08/x09).
  *
  * Device (= the round-9 x15/x18/x108 upgrade): each key's emitted rows are
  * an EXACT, hash-free ground truth both engines compute — the exhaustive
  * Jaccard-≥-4/5 pair set (x01/x08), the exact-duplicate token-multiset
  * groups (x07), the exact cosine pairs over the bounded probe slice
  * (x09) — plus an engine-computed contract flag (soundness / exact-dup
  * completeness / band-nesting monotonicity of the REAL LSH / SimHash
  * chains) that the oracle states as TRUE. The DuckDB side recomputes the
  * ground truth with plain ALL-PAIRS joins, so the driver's hash compare
  * additionally proves the engine's prefix-filter no-miss theorem on real
  * data every round.
  */
object OracleSqlRound12 {

  /** x281 chain, GENERATED per chunk count m (the x215 device): the full
    * q41+q42 Chi-CS train+score chain with the paper's m-chunk map-side
    * learning semantics — chunk-local weight sums and conflict resolution,
    * max-RW fusion across chunks — over q41's two-attribute task. The
    * membership/argmax/weight fragments are verbatim from the proven
    * OracleSqlMl q41/q42 chain; the chunk id is the portable Knuth mix of
    * (l_orderkey, l_linenumber) both engines replay.
    *
    * `fusionSql` is the reducer stage — CTEs from `partial` to `final_rb`
    * (columns a1, a2, rule_cls, rw). Default = the Max fusion (x281);
    * OracleSqlRound14 passes the Ave fusion for x308. */
  private[graft] def mChunkChainAt(
      m: Int,
      fusionSql: String =
        """fused AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
          |                                       ORDER BY rw DESC, rule_cls) AS fn
          |          FROM partial),
          |final_rb AS (SELECT a1, a2, rule_cls, rw FROM fused WHERE fn = 1),"""
          .stripMargin): String = {
    val wt =
      """CAST(ROUND(
        |      (CASE WHEN l.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12))""".stripMargin
    s"""SELECT * FROM (
       |WITH base AS (
       |  SELECT l_orderkey, l_linenumber, l_quantity AS x1, l_discount AS x2,
       |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls,
       |         ((l_orderkey % 100000000) * 2654435761
       |          + l_linenumber * 97564181) % 2147483647 % $m AS chunk
       |  FROM lineitem),
       |costs AS (
       |  SELECT MAX(CASE WHEN cls=1 THEN c END) AS c1,
       |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
       |    SELECT cls, CASE WHEN n = MIN(n) OVER () THEN MAX(n) OVER () * 1.0 / n
       |                     ELSE 1.0 END AS c
       |    FROM (SELECT cls, COUNT(*) AS n FROM base GROUP BY cls))),
       |maj AS (SELECT cls FROM (SELECT cls, COUNT(*) AS n FROM base
       |                         GROUP BY 1 ORDER BY n DESC, cls LIMIT 1)),
       |lab AS (
       |  SELECT *,
       |    CASE WHEN GREATEST(0,1-ABS(x1-1.0)/24.5) >= GREATEST(0,1-ABS(x1-25.5)/24.5)
       |          AND GREATEST(0,1-ABS(x1-1.0)/24.5) >= GREATEST(0,1-ABS(x1-50.0)/24.5) THEN 0
       |         WHEN GREATEST(0,1-ABS(x1-25.5)/24.5) >= GREATEST(0,1-ABS(x1-50.0)/24.5) THEN 1
       |         ELSE 2 END AS a1,
       |    CASE WHEN GREATEST(0,1-ABS(x2-0.0)/0.05) >= GREATEST(0,1-ABS(x2-0.05)/0.05)
       |          AND GREATEST(0,1-ABS(x2-0.0)/0.05) >= GREATEST(0,1-ABS(x2-0.1)/0.05) THEN 0
       |         WHEN GREATEST(0,1-ABS(x2-0.05)/0.05) >= GREATEST(0,1-ABS(x2-0.1)/0.05) THEN 1
       |         ELSE 2 END AS a2
       |  FROM base),
       |ants AS (SELECT DISTINCT chunk, a1, a2, cls FROM lab),
       |wsum AS (
       |  SELECT a.chunk, a.a1, a.a2, a.cls AS rule_cls,
       |    SUM(CASE WHEN l.cls = a.cls THEN $wt END) AS w_match,
       |    SUM($wt) AS w_all
       |  FROM ants a JOIN lab l ON l.chunk = a.chunk GROUP BY 1, 2, 3, 4),
       |rw AS (SELECT chunk, a1, a2, rule_cls,
       |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
       |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
       |       FROM wsum WHERE w_all > 0),
       |prb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk, a1, a2
       |                                     ORDER BY rw DESC, rule_cls) AS rn
       |        FROM rw),
       |partial AS (SELECT chunk, a1, a2, rule_cls, rw
       |            FROM prb WHERE rn = 1 AND rw > 0),
       |$fusionSql
       |gex AS (SELECT x1, x2, cls, COUNT(*) AS mm FROM lab GROUP BY x1, x2, cls),
       |scored AS (
       |  SELECT g.x1, g.x2, g.cls AS actual, g.mm, r.rule_cls,
       |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
       |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
       |        * r.rw, 12) AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
       |                                      ORDER BY score DESC, rule_cls) AS rn
       |         FROM scored),
       |win AS (SELECT actual, mm,
       |               CASE WHEN score > 0 THEN rule_cls
       |                    ELSE (SELECT cls FROM maj) END AS pred
       |        FROM best WHERE rn = 1),
       |nrc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rules FROM final_rb),
       |cm AS (
       |  SELECT SUM(CASE WHEN actual=1 AND pred=1 THEN mm ELSE 0 END) AS tp,
       |         SUM(CASE WHEN actual=0 AND pred=0 THEN mm ELSE 0 END) AS tn,
       |         SUM(CASE WHEN actual=0 AND pred=1 THEN mm ELSE 0 END) AS fp,
       |         SUM(CASE WHEN actual=1 AND pred=0 THEN mm ELSE 0 END) AS fn
       |  FROM win)
       |SELECT CAST($m AS BIGINT) AS m, nrc.n_rules,
       |       CAST(ROUND((tp+tn) * 1000000.0 / (tp+tn+fp+fn), 0) AS BIGINT)
       |         AS acc_ppm,
       |       CAST(ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))) * 1000000,
       |                  0) AS BIGINT) AS gm_ppm
       |FROM cm CROSS JOIN nrc
       |)""".stripMargin
  }

  /** Shared exact-Jaccard CTE chain: 3-token shingle sets of
    * `lower(text)` split on single spaces (split keeps empty tokens; a
    * sub-3-token doc yields its single shorter shingle — exactly the native
    * `shingles` expression's semantics), inverted-index all-pairs
    * intersection counts, exact integer threshold J ≥ 4/5 ⟺ 9I ≥ 4(|A|+|B|),
    * value in integer micro-units. */
  private val jaccardCte =
    """WITH t AS (SELECT doc_id, string_split(LOWER(text), ' ') AS toks
      |           FROM documents),
      |idx AS (SELECT doc_id, toks,
      |               UNNEST(generate_series(1, greatest(len(toks) - 2, 1)))
      |                 AS i
      |        FROM t),
      |sh AS (SELECT DISTINCT doc_id,
      |              array_to_string(toks[i:least(i + 2, len(toks))], ' ')
      |                AS shingle
      |       FROM idx),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT inter.a, inter.b,
      |         CAST(ROUND(i * 1000000.0 / (na.n + nb.n - i), 0) AS BIGINT)
      |           AS jacc_micro
      |  FROM inter JOIN sizes na ON na.doc_id = inter.a
      |             JOIN sizes nb ON nb.doc_id = inter.b
      |  WHERE 9 * i >= 4 * (na.n + nb.n))
      |""".stripMargin

  val round12: Map[String, String] = Map(
    // x01 theorem form: the exact Jaccard-≥-4/5 pairs as micro-unit
    // DISTANCES + lsh_ok = TRUE (3-band MinHash soundness + exact-dup
    // completeness, computed for real on the engine side).
    "x01_dedup_minhash_lsh" ->
      (jaccardCte +
        """SELECT a AS doc_a, b AS doc_b,
          |       1000000 - jacc_micro AS jacc_dist_micro, TRUE AS lsh_ok
          |FROM j ORDER BY doc_a, doc_b""".stripMargin),

    // x07 theorem form: exact-duplicate groups by sorted non-empty token
    // multiset (what determines the SimHash vote sums) + simhash_ok = TRUE
    // (per-group fingerprint consistency + corpus-wide separation).
    "x07_dedup_simhash" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |         array_to_string(list_sort(list_filter(
        |           string_split(LOWER(text), ' '), x -> x <> '')), ' ')
        |           AS mkey
        |  FROM documents),
        |g AS (SELECT mkey, MIN(doc_id) AS rep, COUNT(*) AS n_docs
        |      FROM keyed WHERE mkey <> '' GROUP BY mkey)
        |SELECT rep, CAST(n_docs AS BIGINT) AS n_docs, TRUE AS simhash_ok
        |FROM g ORDER BY rep""".stripMargin,

    // x08 theorem form: the same exact pair set as similarities + lsh_ok =
    // TRUE (4-band soundness + exact-dup completeness + 3⊆4 band nesting).
    "x08_dedup_ngram_jaccard" ->
      (jaccardCte +
        """SELECT a, b, jacc_micro, TRUE AS lsh_ok
          |FROM j ORDER BY a, b""".stripMargin),

    // x09 theorem form: exact cosine pairs (micro-units) over the bounded
    // vec_id < 1000 probe slice + lsh_ok = TRUE (banded hyperplane-LSH
    // soundness within the slice).
    "x09_embedding_neardup_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         list_sum([CAST(embedding[i] AS DOUBLE)
        |                   * CAST(embedding[i] AS DOUBLE)
        |                   FOR i IN generate_series(1, 64)]) AS nrm
        |  FROM embeddings WHERE vec_id < 1000),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         CAST(ROUND(
        |           list_sum([CAST(a.embedding[i] AS DOUBLE)
        |                     * CAST(b.embedding[i] AS DOUBLE)
        |                     FOR i IN generate_series(1, 64)])
        |           / (SQRT(a.nrm) * SQRT(b.nrm)) * 1000000, 0) AS BIGINT)
        |           AS cos_micro
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE a.nrm > 0 AND b.nrm > 0)
        |SELECT vec_a, vec_b, cos_micro, TRUE AS lsh_ok FROM p
        |WHERE cos_micro >= 450000
        |ORDER BY cos_micro DESC, vec_a, vec_b""".stripMargin,

    // x281: the m-chunk map-side learning ablation — one generated
    // chunked q41+q42 chain per m, unioned (the x215 device).
    "x281_chi_mchunk_ablation" ->
      (Seq(1, 4, 16).map(m => mChunkChainAt(m)).mkString("", "\nUNION ALL\n", "\nORDER BY m")),

    // x282: one hard-EM round of the unigram LM — BOTH Viterbi rounds
    // unrolled as the x262 enumeration device, the second joining weights
    // re-estimated (add-one smoothed, capped) from the first's argmax.
    "x282_unigram_em_round" -> x282Sql,

    // x283: the vocabulary-pruning round — a THIRD unrolled enumeration
    // under the pruned (len = 1 OR round-1 usage >= 2), re-weighted
    // inventory, proving E→M→E→prune→M→E in one statement.
    "x283_unigram_prune_round" -> x283Sql,

    // x284: SemDeDup-style cluster-scoped embedding pruning — nearest of
    // the 8 fixed centroids (the x140 assignment device), within-cell
    // exact cosines, drop-the-higher-id rule at cos ≥ 0.40. The keeper-
    // candidate side is capped at each cell's 256 earliest members (the
    // r15 hot-cell anchor cap, Clustering.HotCellCap — mirrored here
    // verbatim; no sf0.01 cell exceeds 70, so the clause is live only on
    // pathological corpora and sf0.1's ~290-member cells).
    "x284_semdedup_prune" ->
      """WITH e AS (SELECT vec_id,
        |            [CAST(embedding[i] AS DOUBLE)
        |             FOR i IN generate_series(1, 64)] AS emb
        |           FROM embeddings),
        |c AS (SELECT vec_id AS cell, emb AS ce FROM e WHERE vec_id < 8),
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
        |       u_id AS keeper, cos_micro
        |FROM d WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // x285: the FRM ablation — one generated q41+q42-style chain per
    // (inference, t-norm) cell, the t-norm threaded through BOTH weight
    // learning and scoring, unioned (the x281 device).
    "x285_chi_frm_ablation" ->
      (for (frm <- Seq("additive", "winner"); tn <- Seq(false, true))
        yield frmChainAt(frm, tn)).mkString("", "\nUNION ALL\n",
                                            "\nORDER BY frm, tnorm"),

    // x286: the deterministic stride-scheduling interleave — ppm weights
    // by largest remainder, t = ceil(k·10⁶/w) in exact integers, global
    // (t, source) order, 200-step prefix, Bresenham flag recomputed.
    "x286_interleave_schedule" ->
      """WITH counts AS (SELECT source, COUNT(*) AS n_docs
        |                FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tn FROM counts),
        |appo AS (SELECT source, n_docs,
        |           (n_docs * 1000000) // (SELECT tn FROM tot) AS base,
        |           (n_docs * 1000000) % (SELECT tn FROM tot) AS rem
        |         FROM counts),
        |wts AS (SELECT source,
        |          base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
        |                        <= 1000000 -
        |                           (SELECT CAST(SUM(base) AS BIGINT) FROM appo)
        |                      THEN 1 ELSE 0 END AS w_ppm
        |        FROM appo),
        |keyed AS (
        |  SELECT d.doc_id, d.source, w.w_ppm,
        |         ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY d.doc_id)
        |           AS k
        |  FROM documents d JOIN wts w ON d.source = w.source
        |  WHERE w.w_ppm > 0),
        |vtimed AS (SELECT *, (k * 1000000 + w_ppm - 1) // w_ppm AS vt
        |           FROM keyed),
        |lim AS (SELECT *, ROW_NUMBER() OVER (ORDER BY vt, source) AS step
        |        FROM vtimed)
        |SELECT step, vt, source, k, doc_id, w_ppm,
        |       ((vt - 1) * w_ppm) // 1000000 < k
        |         AND k <= (vt * w_ppm) // 1000000 AS quota_ok
        |FROM lim WHERE step <= 200 ORDER BY step""".stripMargin,

    // x287: common-neighbors + Adamic–Adar link prediction — the oracle
    // affords the naive customer self-join; terms round to micro-units
    // once, the pair score is an order-free BIGINT sum.
    "x287_link_prediction" ->
      """WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |            FROM orders o
        |            JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |deg AS (SELECT c, COUNT(*) AS d FROM cp GROUP BY c),
        |cand AS (SELECT a.p AS pa, b.p AS pb, g.d AS d
        |         FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
        |         JOIN deg g ON g.c = a.c
        |         WHERE g.d BETWEEN 2 AND 256),
        |scored AS (SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS cn,
        |             CAST(SUM(CAST(ROUND(1000000.0 / LN(d), 0) AS BIGINT))
        |                  AS BIGINT) AS aa_micro
        |           FROM cand GROUP BY pa, pb
        |           HAVING COUNT(*) >= 2),
        |edges AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |          FROM lineitem a JOIN lineitem b
        |            ON a.l_orderkey = b.l_orderkey
        |           AND a.l_partkey < b.l_partkey)
        |SELECT s.pa, s.pb, s.cn, s.aa_micro FROM scored s
        |WHERE NOT EXISTS (SELECT 1 FROM edges e
        |                  WHERE e.pa = s.pa AND e.pb = s.pb)
        |ORDER BY cn DESC, aa_micro DESC, pa, pb LIMIT 50""".stripMargin,

    // x288: license-lattice propagation — two-hop MAX-rank rollup with
    // rank-argmax provenance, declared-vs-effective violation audit.
    "x288_license_lattice" ->
      """WITH docs AS (SELECT doc_id, source,
        |         CAST(substring(source, 4) AS BIGINT) % 4 AS lic_rank,
        |         doc_id // 25 AS shard, (doc_id // 25) % 5 AS dataset
        |       FROM documents),
        |shards AS (SELECT dataset, shard, COUNT(*) AS n_docs,
        |             MAX(lic_rank) AS s_rank
        |           FROM docs GROUP BY 1, 2),
        |ssrc AS (SELECT dataset, shard, source AS s_src FROM (
        |    SELECT dataset, shard, source,
        |           ROW_NUMBER() OVER (PARTITION BY dataset, shard
        |                              ORDER BY lic_rank DESC, source) AS rn
        |    FROM docs) WHERE rn = 1),
        |sh AS (SELECT s.dataset, s.shard, s.n_docs, s.s_rank, c.s_src
        |       FROM shards s JOIN ssrc c
        |         ON s.dataset = c.dataset AND s.shard = c.shard),
        |perds AS (SELECT dataset, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |            CAST(COUNT(*) AS BIGINT) AS n_shards,
        |            MAX(s_rank) AS eff_rank
        |          FROM sh GROUP BY 1),
        |wsrc AS (SELECT dataset, s_src AS worst_source FROM (
        |    SELECT dataset, s_src,
        |           ROW_NUMBER() OVER (PARTITION BY dataset
        |                              ORDER BY s_rank DESC, s_src) AS rn
        |    FROM sh) WHERE rn = 1),
        |atmax AS (SELECT d.dataset, CAST(COUNT(*) AS BIGINT)
        |            AS n_docs_at_max
        |          FROM docs d JOIN perds p
        |            ON d.dataset = p.dataset AND d.lic_rank = p.eff_rank
        |          GROUP BY 1),
        |lic(r, nm) AS (VALUES (0, 'cc0'), (1, 'cc-by'), (2, 'cc-by-sa'),
        |                      (3, 'proprietary'))
        |SELECT p.dataset, p.n_docs, p.n_shards, p.eff_rank,
        |       le.nm AS effective_license, ld.nm AS declared_license,
        |       w.worst_source, a.n_docs_at_max,
        |       p.eff_rank > p.dataset % 4 AS violation
        |FROM perds p
        |JOIN wsrc w ON w.dataset = p.dataset
        |JOIN atmax a ON a.dataset = p.dataset
        |JOIN lic le ON le.r = p.eff_rank
        |JOIN lic ld ON ld.r = p.dataset % 4
        |ORDER BY p.dataset""".stripMargin,

    // x290: personalized PageRank — 3 unrolled integer push iterations,
    // damped transfer (m·17)//(20·deg), teleport pool redistributed over
    // the seeds, mass-conservation flag recomputed from the totals.
    "x290_personalized_pagerank" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
        |       FROM op a JOIN op b
        |         ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM und GROUP BY u),
        |seeds AS (SELECT DISTINCT u AS node FROM und WHERE u % 97 = 0),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds),
        |m0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS m FROM seeds),
        |i1 AS (SELECT node, CAST(SUM(c) AS BIGINT) AS m FROM (
        |    SELECT e.v AS node, (t.m * 17) // (20 * d.deg) AS c
        |    FROM m0 t JOIN und e ON e.u = t.node JOIN deg d ON d.u = t.node
        |    UNION ALL
        |    SELECT s.node,
        |           (SELECT CAST(SUM((m * 3) // 20) AS BIGINT) FROM m0)
        |             // (SELECT ns FROM ns) AS c
        |    FROM seeds s)
        |  GROUP BY node HAVING SUM(c) > 0),
        |i2 AS (SELECT node, CAST(SUM(c) AS BIGINT) AS m FROM (
        |    SELECT e.v AS node, (t.m * 17) // (20 * d.deg) AS c
        |    FROM i1 t JOIN und e ON e.u = t.node JOIN deg d ON d.u = t.node
        |    UNION ALL
        |    SELECT s.node,
        |           (SELECT CAST(SUM((m * 3) // 20) AS BIGINT) FROM i1)
        |             // (SELECT ns FROM ns) AS c
        |    FROM seeds s)
        |  GROUP BY node HAVING SUM(c) > 0),
        |i3 AS (SELECT node, CAST(SUM(c) AS BIGINT) AS m FROM (
        |    SELECT e.v AS node, (t.m * 17) // (20 * d.deg) AS c
        |    FROM i2 t JOIN und e ON e.u = t.node JOIN deg d ON d.u = t.node
        |    UNION ALL
        |    SELECT s.node,
        |           (SELECT CAST(SUM((m * 3) // 20) AS BIGINT) FROM i2)
        |             // (SELECT ns FROM ns) AS c
        |    FROM seeds s)
        |  GROUP BY node HAVING SUM(c) > 0),
        |flag AS (SELECT
        |    (SELECT CAST(SUM(m) AS BIGINT) FROM i1) <=
        |      (SELECT CAST(SUM(m) AS BIGINT) FROM m0)
        |    AND (SELECT CAST(SUM(m) AS BIGINT) FROM i2) <=
        |      (SELECT CAST(SUM(m) AS BIGINT) FROM i1)
        |    AND (SELECT CAST(SUM(m) AS BIGINT) FROM i3) <=
        |      (SELECT CAST(SUM(m) AS BIGINT) FROM i2) AS mass_conserved)
        |SELECT node, m AS mass, (SELECT mass_conserved FROM flag)
        |         AS mass_conserved
        |FROM i3 ORDER BY mass DESC, node LIMIT 20""".stripMargin,

    // x291: out-of-fold target encoding — exact complement means in ppm,
    // all-fold fallback for single-fold categories, Knuth-fold split.
    "x291_oof_target_encoding" ->
      """WITH folded AS (
        |  SELECT o_orderpriority AS cat,
        |         ((o_orderkey % 100000000) * 2654435761
        |          + 97564181) % 2147483647 % 5 AS fold,
        |         CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pos
        |  FROM orders),
        |grid AS (SELECT cat, fold, CAST(COUNT(*) AS BIGINT) AS n_f,
        |                CAST(SUM(pos) AS BIGINT) AS pos_f
        |         FROM folded GROUP BY 1, 2),
        |percat AS (SELECT cat, CAST(SUM(n_f) AS BIGINT) AS n_tot,
        |                  CAST(SUM(pos_f) AS BIGINT) AS pos_tot
        |           FROM grid GROUP BY 1),
        |gtot AS (SELECT CAST(SUM(n_f) AS BIGINT) AS n_all,
        |                CAST(SUM(pos_f) AS BIGINT) AS pos_all FROM grid)
        |SELECT g.cat, g.fold, g.n_f,
        |  CASE WHEN p.n_tot > g.n_f
        |       THEN (p.pos_tot - g.pos_f) * 1000000 // (p.n_tot - g.n_f)
        |       ELSE ((SELECT pos_all FROM gtot) - g.pos_f) * 1000000
        |              // ((SELECT n_all FROM gtot) - g.n_f) END AS oof_ppm,
        |  p.n_tot = g.n_f AS fallback
        |FROM grid g JOIN percat p ON p.cat = g.cat
        |ORDER BY g.cat, g.fold""".stripMargin,

    // x292: incremental join-view maintenance — maintained = base ⊕ Δ,
    // ivm_ok recomputed against the from-scratch view (full outer, so a
    // wrong delta rule shows as FALSE or an unmatched row, never hides).
    "x292_delta_join_maintenance" ->
      """WITH v_base AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS sum_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey % 7 <> 0 GROUP BY 1),
        |v_delta AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS sum_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey % 7 = 0 GROUP BY 1),
        |maintained AS (
        |  SELECT c_mktsegment, CAST(SUM(n_orders) AS BIGINT) AS n_orders,
        |         CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
        |  FROM (SELECT * FROM v_base UNION ALL SELECT * FROM v_delta)
        |  GROUP BY 1),
        |scratch AS (
        |  SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS rn,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS rs
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        |SELECT COALESCE(m.c_mktsegment, s.seg) AS c_mktsegment,
        |       m.n_orders, m.sum_cents,
        |       COALESCE(m.n_orders = s.rn AND m.sum_cents = s.rs, FALSE)
        |         AS ivm_ok
        |FROM maintained m FULL OUTER JOIN scratch s ON m.c_mktsegment = s.seg
        |ORDER BY c_mktsegment""".stripMargin,

    // x293: DRO mixture weights — exact integer per-source surprisal under
    // the corpus bigram LM, exp(2s) upweighting, largest-remainder ppm mix,
    // Hamilton + monotonicity flags recomputed.
    "x293_dro_mixture_weights" ->
      """WITH t AS (SELECT doc_id,
        |            [x FOR x IN string_split(LOWER(text), ' ') IF x <> '']
        |              AS tk
        |           FROM documents),
        |bg AS (SELECT doc_id, tk[i] AS tok_a, tk[i + 1] AS tok_b
        |       FROM t, UNNEST(range(1, len(tk))) AS s(i)),
        |paircnt AS (SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS b
        |            FROM bg GROUP BY 1, 2),
        |headcnt AS (SELECT tok_a, CAST(SUM(b) AS BIGINT) AS h
        |            FROM paircnt GROUP BY 1),
        |model AS (SELECT p.tok_a, p.tok_b,
        |            CAST(ROUND(LN(CAST(h AS DOUBLE) / CAST(b AS DOUBLE))
        |                       * 1000000, 0) AS BIGINT) AS term_micro
        |          FROM paircnt p JOIN headcnt hh ON hh.tok_a = p.tok_a),
        |persrc AS (
        |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |         CAST(SUM(m.term_micro) AS BIGINT) AS tsum
        |  FROM bg JOIN documents d ON d.doc_id = bg.doc_id
        |       JOIN model m ON m.tok_a = bg.tok_a AND m.tok_b = bg.tok_b
        |  GROUP BY 1),
        |wted AS (SELECT source, n_bigrams, tsum // n_bigrams AS s_ppm,
        |           CAST(ROUND(EXP(CAST(tsum // n_bigrams AS DOUBLE)
        |                          / 1000000.0 * 2.0) * 1000000.0, 0)
        |                AS BIGINT) AS w_micro
        |         FROM persrc),
        |tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tw FROM wted),
        |appo AS (SELECT *,
        |           (w_micro * 1000000) // (SELECT tw FROM tot) AS base,
        |           (w_micro * 1000000) % (SELECT tw FROM tot) AS rem
        |         FROM wted),
        |fin AS (SELECT *,
        |          base + CASE WHEN ROW_NUMBER() OVER
        |                             (ORDER BY rem DESC, source)
        |                        <= 1000000 -
        |                           (SELECT CAST(SUM(base) AS BIGINT)
        |                            FROM appo)
        |                      THEN 1 ELSE 0 END AS mix_ppm
        |        FROM appo)
        |SELECT source, n_bigrams, s_ppm, w_micro, mix_ppm,
        |  (SELECT CAST(SUM(mix_ppm) AS BIGINT) FROM fin) = 1000000
        |    AS sum_ok,
        |  COALESCE(w_micro >= LAG(w_micro) OVER (ORDER BY s_ppm, source),
        |           TRUE) AS monotone_ok
        |FROM fin ORDER BY source""".stripMargin,

    // x294: sequential-pattern support — first-occurrence strict ordering
    // per user, confidence in exact ppm.
    "x294_sequence_support" ->
      """WITH firsts AS (
        |  SELECT user_id, event_type, MIN(ts) AS t0
        |  FROM events GROUP BY 1, 2),
        |pertype AS (SELECT event_type AS a, CAST(COUNT(*) AS BIGINT)
        |              AS n_users_a
        |            FROM firsts GROUP BY 1),
        |pairs AS (
        |  SELECT x.event_type AS a, y.event_type AS b,
        |         CAST(COUNT(*) AS BIGINT) AS n_users_ab
        |  FROM firsts x JOIN firsts y
        |    ON x.user_id = y.user_id
        |   AND x.event_type <> y.event_type AND x.t0 < y.t0
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, p.n_users_ab, t.n_users_a,
        |       p.n_users_ab * 1000000 // t.n_users_a AS conf_ppm
        |FROM pairs p JOIN pertype t ON t.a = p.a
        |ORDER BY p.a, p.b""".stripMargin,

    // x295: curriculum pacing — exact cross-multiplied unlock steps under
    // the root pacing curve, histogram + coverage/completion flags.
    "x295_curriculum_pacing" ->
      """WITH ranked AS (
        |  SELECT doc_id, n_chars,
        |         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS nn
        |  FROM documents),
        |un AS (
        |  SELECT CASE WHEN 100 * r * r <= nn * nn THEN 0
        |         ELSE (10000 * (100 * r * r - nn * nn) + 99 * nn * nn - 1)
        |                // (99 * nn * nn) END AS unlock, nn
        |  FROM ranked),
        |hist AS (
        |  SELECT unlock // 1000 AS bucket, CAST(COUNT(*) AS BIGINT)
        |           AS n_docs,
        |         CAST(MIN(unlock) AS BIGINT) AS min_unlock,
        |         CAST(MAX(unlock) AS BIGINT) AS max_unlock,
        |         MAX(nn) AS nn
        |  FROM un GROUP BY 1)
        |SELECT bucket, n_docs, min_unlock, max_unlock,
        |  (SELECT CAST(SUM(n_docs) AS BIGINT) FROM hist) = MAX(nn) OVER ()
        |    AS coverage_ok,
        |  (SELECT CAST(MAX(max_unlock) AS BIGINT) FROM hist) <= 10000
        |    AS complete_ok
        |FROM hist ORDER BY bucket""".stripMargin,

    // x296: RAG context packing — exact-dup canonical filter, x142's BM25
    // in micro-units, top-20 per query (the corpus's top-3 df tokens),
    // greedy 512-token cumulative fill.
    "x296_rag_context_pack" ->
      """WITH canon AS (SELECT MIN(doc_id) AS doc_id
        |               FROM documents GROUP BY LOWER(text)),
        |toks AS (SELECT d.doc_id, UNNEST(string_split(LOWER(d.text), ' '))
        |           AS tok
        |         FROM documents d JOIN canon c ON c.doc_id = d.doc_id),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |       WHERE tok <> '' GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks
        |       WHERE tok <> '' GROUP BY doc_id),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |qs AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 3),
        |st AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
        |       FROM dl),
        |scored AS (SELECT tf.tok AS query, tf.doc_id,
        |             CAST(ROUND(
        |               LN((st.n_docs - qs.df + 0.5) / (qs.df + 0.5) + 1.0) *
        |               (tf.tf * 2.2) / (tf.tf + 1.2 *
        |                 (0.25 + 0.75 * dl.dl / st.avgdl)) * 1000000, 0)
        |               AS BIGINT) AS score_micro,
        |             dl.dl AS n_toks
        |           FROM tf JOIN qs ON qs.tok = tf.tok
        |                JOIN dl USING (doc_id) CROSS JOIN st),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query
        |             ORDER BY score_micro DESC, doc_id) AS rank
        |           FROM scored),
        |top AS (SELECT * FROM ranked WHERE rank <= 20),
        |fill AS (SELECT *, SUM(n_toks) OVER (PARTITION BY query
        |           ORDER BY rank) AS cum_toks FROM top)
        |SELECT query, CAST(rank AS BIGINT) AS rank, doc_id, score_micro,
        |       n_toks, CAST(cum_toks AS BIGINT) AS cum_toks,
        |       cum_toks <= 512 AS admitted
        |FROM fill ORDER BY query, rank""".stripMargin,

    // x297: isotonic calibration — the exact integer minimax closed form
    // (floor commutes with min/max, so this IS the floor of the real
    // isotonic regression), monotone flag recomputed.
    "x297_isotonic_calibration" ->
      """WITH bins AS (
        |  SELECT (CAST(l_quantity AS BIGINT) - 1) // 5 AS bin,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN l_extendedprice > 95000
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM lineitem GROUP BY 1),
        |pre AS (SELECT *,
        |          CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |          CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cpos
        |        FROM bins),
        |grid AS (
        |  SELECT i.bin AS i, j.bin AS j,
        |         MIN((k.cpos - (j.cpos - j.pos)) * 1000000
        |             // (k.cn - (j.cn - j.n))) AS m
        |  FROM pre i JOIN pre j ON j.bin <= i.bin
        |             JOIN pre k ON k.bin >= i.bin
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, CAST(MAX(m) AS BIGINT) AS fit_ppm
        |        FROM grid GROUP BY i)
        |SELECT p.bin, p.n, p.pos, p.pos * 1000000 // p.n AS raw_ppm,
        |       f.fit_ppm,
        |       COALESCE(f.fit_ppm >= LAG(f.fit_ppm) OVER (ORDER BY p.bin),
        |                TRUE) AS monotone_ok
        |FROM pre p JOIN fit f ON f.i = p.bin ORDER BY p.bin""".stripMargin,

    // x289: Neyman allocation — N_hσ_h = isqrt(N·Σy² − (Σy)²) exactly,
    // largest-remainder apportionment, Hamilton + Cauchy–Schwarz flags.
    "x289_neyman_allocation" ->
      """WITH stats AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |                 CAST(SUM(n_chars) AS BIGINT) AS sy,
        |                 CAST(SUM(n_chars * n_chars) AS BIGINT) AS syy
        |               FROM documents GROUP BY source),
        |vr AS (SELECT source, n_docs, n_docs * syy - sy * sy AS v
        |       FROM stats),
        |w AS (SELECT source, n_docs, v,
        |    CASE WHEN (CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) + 1)
        |              * (CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) + 1)
        |              <= v
        |           THEN CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) + 1
        |         WHEN CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT)
        |              * CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) > v
        |           THEN CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) - 1
        |         ELSE CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT)
        |         END AS w
        |      FROM vr),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw,
        |               CAST(SUM(n_docs) AS BIGINT) AS tn,
        |               CAST(SUM((v + n_docs - 1) // n_docs) AS BIGINT) AS tvn
        |        FROM w),
        |appo AS (SELECT source, n_docs, v, w,
        |           (w * 100) // (SELECT tw FROM tot) AS base,
        |           (w * 100) % (SELECT tw FROM tot) AS rem
        |         FROM w),
        |fin AS (SELECT source, n_docs, v, w, base,
        |          base + CASE WHEN ROW_NUMBER() OVER
        |                             (ORDER BY rem DESC, source)
        |                        <= 100 - (SELECT CAST(SUM(base) AS BIGINT)
        |                                  FROM appo)
        |                      THEN 1 ELSE 0 END AS alloc
        |        FROM appo)
        |SELECT source, n_docs, v, w, alloc,
        |  (SELECT CAST(SUM(alloc) AS BIGINT) FROM fin) = 100 AS sum_ok,
        |  (SELECT tw * tw <= tn * tvn FROM tot) AS neyman_ok
        |FROM fin ORDER BY source""".stripMargin
  )

  /** One (inference FRM, t-norm) cell of x285's ablation: the q41+q42
    * train+score chain (verbatim fragments from the proven OracleSqlMl /
    * x281 chains) with the t-norm threaded through BOTH the CS-PCF weight
    * sums and the classification scores. The additive FRM sums per-class
    * evidence as exact pico-unit BIGINTs (round(score·10¹², 0) per bounded
    * rule term — order-free), argmax class with tie → lower class,
    * majority fallback on zero evidence. */
  private def frmChainAt(frm: String, tnormMin: Boolean): String = {
    val tname = if (tnormMin) "min" else "prod"
    def comb(g1: String, g2: String) =
      if (tnormMin) s"LEAST($g1, $g2)" else s"$g1 * $g2"
    val g1l =
      "GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)"
    val g2l =
      "GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)"
    val wt =
      s"""CAST(ROUND(
         |      (CASE WHEN l.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)
         |    * ${comb(g1l, g2l)},
         |    12) AS DECIMAL(38,12))""".stripMargin
    val g1g =
      "GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)"
    val g2g =
      "GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)"
    val score = s"ROUND(${comb(g1g, g2g)} * r.rw, 12)"
    val classify =
      if (frm == "winner")
        """best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
          |                                      ORDER BY score DESC, rule_cls) AS rn
          |         FROM scored),
          |win AS (SELECT actual, mm,
          |               CASE WHEN score > 0 THEN rule_cls
          |                    ELSE (SELECT cls FROM maj) END AS pred
          |        FROM best WHERE rn = 1),""".stripMargin
      else
        """votes AS (SELECT x1, x2, actual, mm, rule_cls,
          |            SUM(CAST(ROUND(score * 1000000000000.0, 0) AS BIGINT)) AS v
          |          FROM scored GROUP BY 1, 2, 3, 4, 5),
          |bestv AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
          |                                       ORDER BY v DESC, rule_cls) AS rn
          |          FROM votes),
          |win AS (SELECT actual, mm,
          |               CASE WHEN v > 0 THEN rule_cls
          |                    ELSE (SELECT cls FROM maj) END AS pred
          |        FROM bestv WHERE rn = 1),""".stripMargin
    s"""SELECT * FROM (
       |WITH base AS (
       |  SELECT l_quantity AS x1, l_discount AS x2,
       |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls
       |  FROM lineitem),
       |costs AS (
       |  SELECT MAX(CASE WHEN cls=1 THEN c END) AS c1,
       |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
       |    SELECT cls, CASE WHEN n = MIN(n) OVER () THEN MAX(n) OVER () * 1.0 / n
       |                     ELSE 1.0 END AS c
       |    FROM (SELECT cls, COUNT(*) AS n FROM base GROUP BY cls))),
       |maj AS (SELECT cls FROM (SELECT cls, COUNT(*) AS n FROM base
       |                         GROUP BY 1 ORDER BY n DESC, cls LIMIT 1)),
       |lab AS (
       |  SELECT *,
       |    CASE WHEN GREATEST(0,1-ABS(x1-1.0)/24.5) >= GREATEST(0,1-ABS(x1-25.5)/24.5)
       |          AND GREATEST(0,1-ABS(x1-1.0)/24.5) >= GREATEST(0,1-ABS(x1-50.0)/24.5) THEN 0
       |         WHEN GREATEST(0,1-ABS(x1-25.5)/24.5) >= GREATEST(0,1-ABS(x1-50.0)/24.5) THEN 1
       |         ELSE 2 END AS a1,
       |    CASE WHEN GREATEST(0,1-ABS(x2-0.0)/0.05) >= GREATEST(0,1-ABS(x2-0.05)/0.05)
       |          AND GREATEST(0,1-ABS(x2-0.0)/0.05) >= GREATEST(0,1-ABS(x2-0.1)/0.05) THEN 0
       |         WHEN GREATEST(0,1-ABS(x2-0.05)/0.05) >= GREATEST(0,1-ABS(x2-0.1)/0.05) THEN 1
       |         ELSE 2 END AS a2
       |  FROM base),
       |ants AS (SELECT DISTINCT a1, a2, cls FROM lab),
       |wsum AS (
       |  SELECT a.a1, a.a2, a.cls AS rule_cls,
       |    SUM(CASE WHEN l.cls = a.cls THEN $wt END) AS w_match,
       |    SUM($wt) AS w_all
       |  FROM ants a CROSS JOIN lab l GROUP BY 1, 2, 3),
       |rw AS (SELECT a1, a2, rule_cls,
       |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
       |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
       |       FROM wsum WHERE w_all > 0),
       |prb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
       |                                     ORDER BY rw DESC, rule_cls) AS rn
       |        FROM rw),
       |final_rb AS (SELECT a1, a2, rule_cls, rw
       |             FROM prb WHERE rn = 1 AND rw > 0),
       |gex AS (SELECT x1, x2, cls, COUNT(*) AS mm FROM lab GROUP BY x1, x2, cls),
       |scored AS (
       |  SELECT g.x1, g.x2, g.cls AS actual, g.mm, r.rule_cls,
       |    $score AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |$classify
       |nrc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rules FROM final_rb),
       |cm AS (
       |  SELECT SUM(CASE WHEN actual=1 AND pred=1 THEN mm ELSE 0 END) AS tp,
       |         SUM(CASE WHEN actual=0 AND pred=0 THEN mm ELSE 0 END) AS tn,
       |         SUM(CASE WHEN actual=0 AND pred=1 THEN mm ELSE 0 END) AS fp,
       |         SUM(CASE WHEN actual=1 AND pred=0 THEN mm ELSE 0 END) AS fn
       |  FROM win)
       |SELECT '$frm' AS frm, '$tname' AS tnorm, nrc.n_rules,
       |       CAST(ROUND((tp+tn) * 1000000.0 / (tp+tn+fp+fn), 0) AS BIGINT)
       |         AS acc_ppm,
       |       CAST(ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))) * 1000000,
       |                  0) AS BIGINT) AS gm_ppm
       |FROM cm CROSS JOIN nrc
       |)""".stripMargin
  }

  /** One unrolled Viterbi enumeration round (the x262 device): every
    * segmentation of every ≤8-char token under inventory `inv`, the
    * per-position tie rule restated globally as
    * (product DESC, reversed length list DESC). */
  private def segRound(name: String, rec: String, inv: String): String =
    s"""$name AS (
       |  WITH RECURSIVE $rec(tok, tf, pos, prod, lens, pieces) AS (
       |    SELECT tok, tf, 0, CAST(1 AS HUGEINT),
       |           CAST([] AS INTEGER[]), CAST([] AS VARCHAR[])
       |    FROM vocab WHERE length(tok) <= 8
       |    UNION ALL
       |    SELECT $rec.tok, $rec.tf, $rec.pos + i.len, $rec.prod * i.wq,
       |           list_append($rec.lens, i.len), list_append($rec.pieces, i.g)
       |    FROM $rec JOIN $inv i ON i.g = substr($rec.tok, $rec.pos + 1, i.len)
       |                         AND $rec.pos + i.len <= length($rec.tok)
       |    WHERE $rec.pos < length($rec.tok))
       |  SELECT tok, tf, pieces,
       |         ROW_NUMBER() OVER (PARTITION BY tok
       |             ORDER BY prod DESC, list_reverse(lens) DESC) AS rn
       |  FROM $rec WHERE pos = length(tok))""".stripMargin

  /** Per-piece corpus usage of an enumeration round's argmax. */
  private def usageCte(name: String, best: String, c: String): String =
    s"""$name AS (SELECT piece, CAST(SUM(tf) AS BIGINT) AS $c
       |       FROM (SELECT tf, unnest(pieces) AS piece
       |             FROM $best WHERE rn = 1) GROUP BY 1)""".stripMargin

  /** The M-step: re-quantized weights from a usage CTE over the base
    * inventory; with `prune`, multi-char pieces below 2 uses are dropped
    * (single chars never — the total-coverage floor). */
  private def reWeight(name: String, usage: String, c: String,
                       prune: Boolean): String = {
    val keep = if (prune) s"\n         WHERE inv.len = 1 OR COALESCE(u.$c, 0) >= 2" else ""
    s"""$name AS (SELECT inv.g, inv.len,
       |           CAST(least(COALESCE(u.$c, 0) + 1, 9999) AS HUGEINT)
       |             * CASE inv.len WHEN 1 THEN 1 WHEN 2 THEN 10000
       |                            ELSE 100000000 END AS wq
       |         FROM inv LEFT JOIN $usage u ON u.piece = inv.g$keep)""".stripMargin
  }

  /** CTE prefix shared by x282/x283: corpus vocab, raw gram inventories
    * (all chars + bi-30 + tri-20 — x256's derivation), round-0 weights. */
  private def unigramPrefix: String =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '),
      |                x -> x <> '')) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1),
      |bi AS (
      |  SELECT substr(tok, i, 2) AS g, SUM(tf) AS w
      |  FROM vocab, generate_series(1, 32) AS gs(i)
      |  WHERE i + 1 <= length(tok) GROUP BY 1),
      |tri AS (
      |  SELECT substr(tok, i, 3) AS g, SUM(tf) AS w
      |  FROM vocab, generate_series(1, 32) AS gs(i)
      |  WHERE i + 2 <= length(tok) GROUP BY 1),
      |ch AS (
      |  SELECT substr(tok, i, 1) AS g, SUM(tf) AS w
      |  FROM vocab, generate_series(1, 32) AS gs(i)
      |  WHERE i <= length(tok) GROUP BY 1),
      |inv AS (SELECT g, 1 AS len, w FROM ch
      |        UNION ALL
      |        SELECT g, 2, w FROM (SELECT g, w FROM bi
      |                             ORDER BY w DESC, g LIMIT 30)
      |        UNION ALL
      |        SELECT g, 3, w FROM (SELECT g, w FROM tri
      |                             ORDER BY w DESC, g LIMIT 20)),
      |inv0 AS (SELECT g, len,
      |           CAST(least(w, 9999) AS HUGEINT)
      |             * CASE len WHEN 1 THEN 1 WHEN 2 THEN 10000
      |                        ELSE 100000000 END AS wq
      |         FROM inv)""".stripMargin

  /** The chain through round 1 (E → M → E), shared by x282/x283. */
  private def throughU1: String =
    s"""$unigramPrefix,
       |${segRound("best0", "r0", "inv0")},
       |${usageCte("u0", "best0", "usage_r0")},
       |${reWeight("inv1", "u0", "usage_r0", prune = false)},
       |${segRound("best1", "r1", "inv1")},
       |${usageCte("u1", "best1", "usage_r1")}""".stripMargin

  /** x282: the x262 recursive-CTE segmentation enumeration run TWICE —
    * seg0 under the raw-gram-mass weights (x262's), u0 = round-0 per-piece
    * Viterbi usage, inv1 = least(u0 + 1, 9999)·10^(4·(len−1)) over the
    * SAME inventory, seg1 under inv1. */
  private def x282Sql: String =
    s"""$throughU1
       |SELECT u1.piece, CAST(length(u1.piece) AS BIGINT) AS len,
       |       CAST(COALESCE(u0.usage_r0, 0) AS BIGINT) AS usage_r0,
       |       u1.usage_r1
       |FROM u1 LEFT JOIN u0 ON u0.piece = u1.piece
       |ORDER BY u1.usage_r1 DESC, u1.piece LIMIT 30""".stripMargin

  /** x283: x282's chain plus the pruning round — inv2 keeps single chars
    * unconditionally and multi-char pieces with round-1 usage ≥ 2,
    * re-weighted from round-1 usage; one more enumeration under inv2. */
  private def x283Sql: String =
    s"""$throughU1,
       |${reWeight("inv2", "u1", "usage_r1", prune = true)},
       |${segRound("best2", "r2", "inv2")},
       |${usageCte("u2", "best2", "usage_r2")}
       |SELECT u2.piece, CAST(length(u2.piece) AS BIGINT) AS len,
       |       CAST(COALESCE(u1.usage_r1, 0) AS BIGINT) AS usage_r1,
       |       u2.usage_r2
       |FROM u2 LEFT JOIN u1 ON u1.piece = u2.piece
       |ORDER BY u2.usage_r2 DESC, u2.piece LIMIT 30""".stripMargin
}
