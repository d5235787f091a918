package graft

/** Round-13 oracle statements.
  *
  * x298 is hash-free by construction (the gram join key is the literal
  * 13-token substring), so the oracle is a verbatim SQL restatement of the
  * operator — positional k-gram explode, shared-gram filter, interval-union
  * run merge — with no theorem-form scaffolding needed.
  */
object OracleSqlRound13 {

  private val L = 3

  /** Triangular-grid fragments (the x215 generator discipline): grid
    * arithmetic stays an IEEE EXPRESSION (lo + k*((hi-lo)/(L-1))), never a
    * pre-evaluated literal — one ULP of drift flips argmax ties. */
  private def mu(x: String, lo: String, hi: String, k: Int): String = {
    val w = s"(($hi - $lo) / ${L - 1})"
    s"GREATEST(0, 1 - ABS($x - ($lo + $k * $w)) / $w)"
  }
  private def argmax(x: String, lo: String, hi: String): String = {
    val cases = (0 until L - 1).map { k =>
      val conds = (k + 1 until L)
        .map(j => s"${mu(x, lo, hi, k)} >= ${mu(x, lo, hi, j)}")
        .mkString(" AND ")
      s"WHEN $conds THEN $k"
    }.mkString(" ")
    s"CASE $cases ELSE ${L - 1} END"
  }
  private def muAt(x: String, label: String, lo: String, hi: String): String = {
    val w = s"(($hi - $lo) / ${L - 1})"
    val c = (0 until L - 1).map(k => s"WHEN $k THEN ($lo + $k * $w)").mkString(" ")
    s"GREATEST(0, 1 - ABS($x - (CASE $label $c ELSE ($lo + ${L - 1} * $w) END)) / $w)"
  }

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
        |  -- double-per-FACTOR, matching the engine: a BIGINT product
        |  -- overflows past ~3e9-token corpora (ADVICE r13)
        |  SELECT tok,
        |         CAST(ROUND(LN((CAST(c_tgt + 1 AS DOUBLE) *
        |                        CAST(n_raw + v AS DOUBLE)) /
        |                       (CAST(c_raw + 1 AS DOUBLE) *
        |                        CAST(n_tgt + v AS DOUBLE)))
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

    // x302: the full Chi-CS train+score chain (the proven x215/q41 oracle
    // device at n = 2, documents-based features) with the x47 gate verdict
    // as the weak label. Grid: x1 in [10, 100], x2 in [0, 100], L = 3 —
    // the muAt/argmax fragments keep grid arithmetic as IEEE EXPRESSIONS
    // (lo + k*((hi-lo)/(L-1))), never pre-evaluated literals.
    "x302_learned_quality_filter" -> {
      val (lo1, hi1, lo2, hi2) = ("10.0", "100.0", "0.0", "100.0")
      val wt =
        s"""CAST(ROUND(
           |      (CASE WHEN t.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)
           |    * ${muAt("t.x1", "a.a1", lo1, hi1)}
           |    * ${muAt("t.x2", "a.a2", lo2, hi2)},
           |    12) AS DECIMAL(38,12))""".stripMargin
      s"""WITH tok AS (
         |  SELECT doc_id, x AS tk FROM documents,
         |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
         |rep AS (
         |  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_tok FROM (
         |    SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2) GROUP BY doc_id),
         |base AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(r.n_tok AS DOUBLE) AS x1,
         |         CAST(r.max_c AS DOUBLE) * 100.0 / CAST(r.n_tok AS DOUBLE) AS x2,
         |         CASE WHEN d.n_chars BETWEEN 100 AND 500 AND r.max_c * 5 < r.n_tok
         |                   AND (list_contains([x FOR x IN string_split(LOWER(d.text),' ') IF x <> ''], 'the')
         |                        OR list_contains([x FOR x IN string_split(LOWER(d.text),' ') IF x <> ''], 'a'))
         |              THEN 1 ELSE 0 END AS cls
         |  FROM documents d JOIN rep r USING (doc_id)
         |  WHERE TRIM(d.text) <> ''),
         |lab AS (
         |  SELECT *, ${argmax("x1", lo1, hi1)} AS a1, ${argmax("x2", lo2, hi2)} AS a2
         |  FROM base),
         |costs AS (
         |  SELECT MAX(CASE WHEN cls=1 THEN c END) AS c1,
         |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
         |    SELECT cls, CASE WHEN n = MIN(n) OVER () AND MIN(n) OVER () <> MAX(n) OVER ()
         |                     THEN MAX(n) OVER () * 1.0 / n ELSE 1.0 END AS c
         |    FROM (SELECT cls, COUNT(*) AS n FROM lab GROUP BY cls))),
         |maj AS (SELECT cls FROM (SELECT cls, COUNT(*) AS n FROM base
         |                         GROUP BY 1 ORDER BY n DESC, cls LIMIT 1)),
         |ants AS (SELECT DISTINCT a1, a2, cls FROM lab),
         |m AS (
         |  SELECT a.a1, a.a2, a.cls AS rule_cls,
         |    COALESCE(SUM(CASE WHEN t.cls = a.cls THEN $wt END), 0) AS w_match,
         |    SUM($wt) AS w_all
         |  FROM ants a CROSS JOIN lab t GROUP BY 1, 2, 3),
         |rw AS (SELECT a1, a2, rule_cls,
         |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
         |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
         |       FROM m WHERE w_all > 0),
         |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
         |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
         |final_rb AS (SELECT a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
         |gex AS (SELECT source, x1, x2, cls, COUNT(*) AS m
         |        FROM lab GROUP BY 1, 2, 3, 4),
         |scored AS (
         |  SELECT g.source, g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
         |    ROUND(${muAt("g.x1", "r.a1", lo1, hi1)}
         |        * ${muAt("g.x2", "r.a2", lo2, hi2)} * r.rw, 12) AS score
         |  FROM gex g CROSS JOIN final_rb r),
         |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source, x1, x2, actual
         |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
         |win AS (SELECT source, actual, m,
         |               CASE WHEN score > 0 THEN rule_cls
         |                    ELSE (SELECT cls FROM maj) END AS pred
         |        FROM best WHERE rn=1)
         |SELECT source, CAST(SUM(m) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN actual=1 THEN m ELSE 0 END) AS BIGINT) AS n_keep_label,
         |       CAST(SUM(CASE WHEN pred=1 THEN m ELSE 0 END) AS BIGINT) AS n_keep_pred,
         |       CAST(SUM(CASE WHEN pred=actual THEN m ELSE 0 END) AS BIGINT) * 1000000
         |         // CAST(SUM(m) AS BIGINT) AS agree_ppm
         |FROM win GROUP BY source ORDER BY source""".stripMargin
    },

    "x303_ngram_decontamination" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source, array_to_string(t[i:i+12], ' ') AS gram
        |  FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS u(i)
        |  WHERE len(t) >= 13),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
        |corpus AS (SELECT doc_id, source FROM documents WHERE doc_id % 97 <> 0),
        |hits AS (
        |  SELECT g.doc_id, g.source, COUNT(*) AS hit_sites
        |  FROM grams g JOIN bench USING (gram)
        |  WHERE g.doc_id % 97 <> 0
        |  GROUP BY g.doc_id, g.source),
        |psd AS (SELECT source, COUNT(*) AS n_docs FROM corpus GROUP BY source),
        |psc AS (SELECT source, COUNT(*) AS n_contaminated,
        |               CAST(SUM(hit_sites) AS BIGINT) AS hit_sites
        |        FROM hits GROUP BY source)
        |SELECT p.source, p.n_docs,
        |       COALESCE(c.n_contaminated, 0) AS n_contaminated,
        |       COALESCE(c.n_contaminated, 0) * 1000000 // p.n_docs AS contam_ppm,
        |       COALESCE(c.hit_sites, 0) AS hit_sites
        |FROM psd p LEFT JOIN psc c USING (source)
        |ORDER BY p.source""".stripMargin,

    // x304: per-prefix-dimension truncated cosine vs the full dimension —
    // the per-d fragments are GENERATED so the dim list cannot drift from
    // the engine's (the x215 generator discipline); float elements cast to
    // DOUBLE once, every cosine micro-rounded once (the proven q45/x284
    // device), integer aggregation only.
    "x304_matryoshka_audit" -> {
      def nrm(v: String, d: Int) =
        s"list_sum([$v[i]*$v[i] FOR i IN generate_series(1,$d)])"
      def cosd(d: Int) =
        s"CAST(ROUND(list_sum([ea[i]*eb[i] FOR i IN generate_series(1,$d)]) / " +
          s"(SQRT(${nrm("ea", d)}) * SQRT(${nrm("eb", d)})) * 1000000, 0) AS BIGINT)"
      val dims = Seq(8, 16, 32, 64)
      val cosSel = dims.map(d => s"${cosd(d)} AS c$d").mkString(",\n       ")
      val unioned = dims.map(d =>
        s"SELECT $d AS dim, c$d AS cos_d, c64 FROM c").mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb
         |  FROM embeddings),
         |p AS (
         |  SELECT a.emb AS ea, b.emb AS eb
         |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
         |  WHERE ${nrm("a.emb", 8)} > 0 AND ${nrm("b.emb", 8)} > 0),
         |c AS (SELECT $cosSel FROM p),
         |s AS (
         |$unioned
         |)
         |SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n_pairs,
         |       CAST(SUM(ABS(cos_d - c64)) AS BIGINT) // COUNT(*) AS mean_abs_err_micro,
         |       CAST(MAX(ABS(cos_d - c64)) AS BIGINT) AS max_abs_err_micro,
         |       CAST(SUM(CASE WHEN (cos_d > 0 AND c64 > 0) OR (cos_d < 0 AND c64 < 0)
         |                          OR (cos_d = 0 AND c64 = 0) THEN 1 ELSE 0 END) AS BIGINT)
         |         * 1000000 // COUNT(*) AS sign_agree_ppm
         |FROM s GROUP BY dim ORDER BY dim""".stripMargin
    },

    // x305: leave-one-source-out retrains of the x302 task's BASE-Chi fit
    // (cost-free), restated data-driven in ONE statement: per-(candidate,
    // source) weight sums on the bounded grid, LOSO = total − slice (exact
    // DECIMAL subtraction ≡ refitting), '(full)' control subtracts nothing.
    "x305_loso_attribution" -> {
      val (lo1, hi1, lo2, hi2) = ("10.0", "100.0", "0.0", "100.0")
      val w =
        s"""CAST(ROUND(${muAt("g.x1", "s.ra1", lo1, hi1)}
           |    * ${muAt("g.x2", "s.ra2", lo2, hi2)}, 12) AS DECIMAL(18,12))""".stripMargin
      s"""WITH tok AS (
         |  SELECT doc_id, x AS tk FROM documents,
         |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
         |rep AS (
         |  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_tok FROM (
         |    SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2) GROUP BY doc_id),
         |base AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(r.n_tok AS DOUBLE) AS x1,
         |         CAST(r.max_c AS DOUBLE) * 100.0 / CAST(r.n_tok AS DOUBLE) AS x2,
         |         CASE WHEN d.n_chars BETWEEN 100 AND 500 AND r.max_c * 5 < r.n_tok
         |                   AND (list_contains([x FOR x IN string_split(LOWER(d.text),' ') IF x <> ''], 'the')
         |                        OR list_contains([x FOR x IN string_split(LOWER(d.text),' ') IF x <> ''], 'a'))
         |              THEN 1 ELSE 0 END AS cls
         |  FROM documents d JOIN rep r USING (doc_id)
         |  WHERE TRIM(d.text) <> ''),
         |lab AS (
         |  SELECT *, ${argmax("x1", lo1, hi1)} AS a1, ${argmax("x2", lo2, hi2)} AS a2
         |  FROM base),
         |seeds AS (
         |  SELECT a1 AS ra1, a2 AS ra2, cls AS rcls,
         |         COUNT(DISTINCT source) AS n_seed_src, MAX(source) AS a_seed_src
         |  FROM lab GROUP BY 1, 2, 3),
         |sums AS (
         |  SELECT g.source, s.ra1, s.ra2, s.rcls,
         |         COALESCE(SUM(CASE WHEN g.cls = s.rcls THEN $w END), 0) AS s_match,
         |         COALESCE(SUM($w), 0) AS s_all
         |  FROM seeds s CROSS JOIN lab g GROUP BY 1, 2, 3, 4),
         |tot AS (SELECT ra1, ra2, rcls, SUM(s_match) AS t_match, SUM(s_all) AS t_all
         |        FROM sums GROUP BY 1, 2, 3),
         |models AS (SELECT DISTINCT source AS lo FROM base UNION ALL SELECT '(full)'),
         |rbw AS (
         |  SELECT m.lo, t.ra1, t.ra2, t.rcls,
         |         t.t_match - COALESCE(sm.s_match, 0) AS w_match,
         |         t.t_all - COALESCE(sm.s_all, 0) AS w_all
         |  FROM tot t CROSS JOIN models m
         |  JOIN seeds sd ON sd.ra1 = t.ra1 AND sd.ra2 = t.ra2 AND sd.rcls = t.rcls
         |  LEFT JOIN sums sm ON sm.source = m.lo AND sm.ra1 = t.ra1
         |                   AND sm.ra2 = t.ra2 AND sm.rcls = t.rcls
         |  WHERE sd.n_seed_src > 1 OR sd.a_seed_src <> m.lo),
         |rwt AS (
         |  SELECT lo, ra1, ra2, rcls,
         |         CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
         |           / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
         |  FROM rbw WHERE w_all > 0),
         |rb AS (SELECT lo, ra1, ra2, rcls, rw FROM (
         |         SELECT *, ROW_NUMBER() OVER (PARTITION BY lo, ra1, ra2
         |                                      ORDER BY rw DESC, rcls) AS rn
         |         FROM rwt WHERE rw > 0) WHERE rn = 1),
         |majg AS (
         |  SELECT m.lo, g.cls,
         |         SUM(CASE WHEN g.source = m.lo THEN 0 ELSE g.n END) AS n
         |  FROM (SELECT source, cls, COUNT(*) AS n FROM lab GROUP BY 1, 2) g
         |  CROSS JOIN models m GROUP BY 1, 2),
         |maj AS (SELECT lo, cls AS maj FROM (
         |          SELECT *, ROW_NUMBER() OVER (PARTITION BY lo
         |                                       ORDER BY n DESC, cls) AS rn
         |          FROM majg) WHERE rn = 1),
         |vecs AS (SELECT x1, x2, cls, COUNT(*) AS mm FROM lab GROUP BY 1, 2, 3),
         |vm AS (SELECT v.*, m.lo FROM vecs v CROSS JOIN models m),
         |scored AS (
         |  SELECT vm.lo, vm.x1, vm.x2, vm.cls, vm.mm, r.rcls,
         |         COALESCE(ROUND(${muAt("vm.x1", "r.ra1", lo1, hi1)}
         |                      * ${muAt("vm.x2", "r.ra2", lo2, hi2)} * r.rw, 12),
         |                  -1) AS score
         |  FROM vm LEFT JOIN rb r ON r.lo = vm.lo),
         |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lo, x1, x2, cls
         |                                      ORDER BY score DESC, rcls) AS rn
         |         FROM scored),
         |win AS (SELECT b.lo, b.cls, b.mm,
         |               CASE WHEN b.score > 0 THEN b.rcls ELSE mj.maj END AS pred
         |        FROM best b JOIN maj mj ON mj.lo = b.lo WHERE rn = 1),
         |acc AS (SELECT lo, CAST(SUM(mm) AS BIGINT) AS n_docs,
         |               CAST(SUM(CASE WHEN cls = pred THEN mm ELSE 0 END) AS BIGINT) AS agree
         |        FROM win GROUP BY lo),
         |fullr AS (SELECT ra1, ra2, rcls FROM rb WHERE lo = '(full)'),
         |inter AS (SELECT r.lo, COUNT(*) AS n_inter
         |          FROM rb r JOIN fullr f USING (ra1, ra2, rcls) GROUP BY 1),
         |nr AS (SELECT lo, COUNT(*) AS n_rules FROM rb GROUP BY 1),
         |nf AS (SELECT COUNT(*) AS n_full FROM fullr)
         |SELECT a.lo AS left_out,
         |       COALESCE(nr.n_rules, 0) AS n_rules,
         |       COALESCE(nr.n_rules, 0) + nf.n_full - 2 * COALESCE(i.n_inter, 0) AS rules_changed,
         |       a.n_docs, a.agree * 1000000 // a.n_docs AS agree_ppm
         |FROM acc a LEFT JOIN nr ON nr.lo = a.lo
         |LEFT JOIN inter i ON i.lo = a.lo CROSS JOIN nf
         |ORDER BY left_out""".stripMargin
    },

    // x306: the single-batch streaming replay folds each LSH bucket's docs
    // ascending, so flagged ≡ "a lower doc_id shares a band bucket" and
    // partner ≡ the bucket minimum — restated with x86's proven signature
    // fragments (same 8 portable hash pairs, same banding).
    "x306_stream_neardup_dedup" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """hs AS (SELECT * FROM (VALUES
          |  (0, 1540483477, 11), (1, 1103515245, 12345), (2, 69069, 7),
          |  (3, 1664525, 1013904223), (4, 22695477, 1), (5, 134775813, 1),
          |  (6, 214013, 2531011), (7, 1597334677, 3)) AS v(j, a, b)),
          |sig AS (
          |  SELECT doc_id, j, MIN((a * fp + b) % 2147483647) AS mh
          |  FROM fps, hs GROUP BY doc_id, j),
          |banded AS (
          |  SELECT doc_id, j // 2 AS band,
          |         STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY j) AS key
          |  FROM sig GROUP BY doc_id, j // 2),
          |m AS (SELECT band, key, MIN(doc_id) AS first_id
          |      FROM banded GROUP BY 1, 2),
          |fl AS (SELECT b.doc_id, mm.first_id
          |       FROM banded b JOIN m mm USING (band, key)
          |       WHERE b.doc_id > mm.first_id)
          |SELECT doc_id, MIN(first_id) AS partner, COUNT(*) AS n_buckets
          |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // x307: adjacent-pair longest common token prefix under two orderings,
    // generated per ordering so the two blocks cannot drift; the LCP is
    // set-based (first mismatch position per pair via a lateral
    // generate_series), never a per-row procedural scan.
    "x307_prefix_cache_order" -> {
      def block(tag: String, orderBy: String, label: String): String =
        s"""r$tag AS (SELECT doc_id, t,
           |       ROW_NUMBER() OVER (ORDER BY $orderBy) AS r FROM f),
           |p$tag AS (SELECT c.r, c.t AS tc, p.t AS tp
           |       FROM r$tag c JOIN r$tag p ON p.r = c.r - 1),
           |m$tag AS (SELECT p.r, MIN(g.i) AS fm
           |       FROM p$tag p,
           |            UNNEST(generate_series(1, LEAST(len(p.tc), len(p.tp)))) AS g(i)
           |       WHERE p.tc[g.i] <> p.tp[g.i] GROUP BY p.r),
           |l$tag AS (SELECT p.r,
           |       COALESCE(m$tag.fm - 1, LEAST(len(p.tc), len(p.tp))) AS lcp,
           |       len(p.tc) AS nt
           |       FROM p$tag p LEFT JOIN m$tag USING (r)),
           |s$tag AS (SELECT '$label' AS ordering, COUNT(*) AS n_pairs,
           |       CAST(SUM(lcp) AS BIGINT) AS shared_tokens,
           |       CAST(SUM(lcp) AS BIGINT) * 1000000
           |         // CAST(SUM(nt) AS BIGINT) AS hit_ppm
           |       FROM l$tag)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, LOWER(text) AS key,
         |         [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
         |  FROM documents),
         |f AS (SELECT * FROM d WHERE len(t) >= 1),
         |${block("1", "doc_id", "arrival")},
         |${block("2", "key, doc_id", "sorted")}
         |SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |ORDER BY ordering""".stripMargin
    },

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
