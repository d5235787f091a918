package graft

/** DuckDB oracle SQL for the ML surface (q38–q43) and LLM-pipeline extensions
  * (q44–q49). q40–q43 share the ML_CTE prefix (FIXTURES.md §5): labeled
  * lineitem rows with argmax fuzzy labels, ≥-chains so ties resolve to the
  * lowest label index — the same convention ChiCore.argmaxLabel encodes.
  * Float parity notes: per-term weights ROUND(...,12) → DECIMAL(38,12) sums;
  * vector kernels spell squares as x*x (not pow) so both engines run the
  * identical IEEE multiply.
  */
object OracleSqlMl {

  private val mlCte =
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity AS x1, l_discount AS x2,
      |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls
      |  FROM lineitem),
      |costs AS (
      |  SELECT MAX(CASE WHEN cls=1 THEN c END) AS c1,
      |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
      |    SELECT cls, CASE WHEN n = MIN(n) OVER () THEN MAX(n) OVER () * 1.0 / n
      |                     ELSE 1.0 END AS c
      |    FROM (SELECT cls, COUNT(*) AS n FROM base GROUP BY cls))),
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
      |  FROM base)""".stripMargin

  /** Per-(example l × candidate a) matching degree, exact; the cost factor
    * is 1.0 for the base (non-CS) variant. */
  private def wTermWith(costFactor: String) =
    s"""CAST(ROUND(
       |      $costFactor
       |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
       |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
       |    12) AS DECIMAL(38,12))""".stripMargin

  private val wTerm = wTermWith(
    "(CASE WHEN l.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)")
  private val wTermBase = wTermWith("1.0")

  private def ruleBaseCtesWith(wt: String) =
    s"""$mlCte,
       |ants AS (SELECT DISTINCT a1, a2, cls FROM lab),
       |m AS (
       |  SELECT a.a1, a.a2, a.cls AS rule_cls,
       |    SUM(CASE WHEN l.cls = a.cls THEN $wt END) AS w_match,
       |    SUM($wt) AS w_all
       |  FROM ants a CROSS JOIN lab l GROUP BY a.a1, a.a2, a.cls),
       |rw AS (SELECT a1, a2, rule_cls,
       |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)/CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
       |       FROM m WHERE w_all > 0),
       |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1,a2
       |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw)""".stripMargin

  private val ruleBaseCtes = ruleBaseCtesWith(wTerm)
  private val ruleBaseCtesBase = ruleBaseCtesWith(wTermBase)

  // Classification is per DISTINCT feature vector with multiplicity m:
  // (l_orderkey, l_linenumber) is not unique in lineitem, so a per-"row"
  // window would merge different examples and order cross-example score ties
  // arbitrarily. Identical vectors classify identically, so weighting by m
  // preserves per-row confusion counts exactly.
  private def classifyCtesWith(rbCtes: String) =
    s"""$rbCtes,
       |final_rb AS (SELECT a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
       |gex AS (SELECT x1, x2, cls, COUNT(*) AS m FROM lab GROUP BY x1, x2, cls),
       |scored AS (
       |  SELECT g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
       |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
       |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
       |        * r.rw, 12) AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
       |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored)""".stripMargin

  private val classifyCtes = classifyCtesWith(ruleBaseCtes)
  private val classifyCtesBase = classifyCtesWith(ruleBaseCtesBase)

  val ml: Map[String, String] = Map(
    "q38_ml_class_costs" ->
      """WITH lab AS (SELECT CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls
        |             FROM lineitem),
        |cnt AS (SELECT cls, COUNT(*) AS n FROM lab GROUP BY cls)
        |SELECT CAST(cls AS BIGINT) AS cls, n,
        |       ROUND(CAST(CASE WHEN n = (SELECT MIN(n) FROM cnt)
        |                       THEN (SELECT MAX(n) FROM cnt) * 1.0 / (SELECT MIN(n) FROM cnt)
        |                       ELSE 1.0 END AS DOUBLE),6) AS cost
        |FROM cnt ORDER BY cls""".stripMargin,

    "q39_ml_fuzzy_membership" ->
      """WITH p AS (SELECT l_orderkey, l_linenumber, l_quantity AS x1, l_discount AS x2
        |           FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  ROUND(GREATEST(0, 1 - ABS(x1 - 1.0)/24.5),6)  AS q_lo,
        |  ROUND(GREATEST(0, 1 - ABS(x1 - 25.5)/24.5),6) AS q_mid,
        |  ROUND(GREATEST(0, 1 - ABS(x1 - 50.0)/24.5),6) AS q_hi,
        |  ROUND(GREATEST(0, 1 - ABS(x2 - 0.0)/0.05),6)  AS d_lo,
        |  ROUND(GREATEST(0, 1 - ABS(x2 - 0.05)/0.05),6) AS d_mid,
        |  ROUND(GREATEST(0, 1 - ABS(x2 - 0.1)/0.05),6)  AS d_hi
        |FROM p ORDER BY l_orderkey, l_linenumber, x1, x2""".stripMargin,

    "q40_ml_chi_rulegen" ->
      s"""$mlCte
         |SELECT CAST(a1 AS BIGINT) AS a1, CAST(a2 AS BIGINT) AS a2,
         |       CAST(cls AS BIGINT) AS cls, COUNT(*) AS n
         |FROM lab GROUP BY a1,a2,cls ORDER BY a1,a2,cls""".stripMargin,

    "q41_ml_chi_rule_weights" ->
      s"""$ruleBaseCtes
         |SELECT CAST(a1 AS BIGINT) AS a1, CAST(a2 AS BIGINT) AS a2,
         |       CAST(rule_cls AS BIGINT) AS cls, ROUND(rw,6) AS rw
         |FROM rb WHERE rn=1 AND rw > 0 ORDER BY a1, a2""".stripMargin,

    "q42_ml_chi_classify" ->
      s"""$classifyCtes
         |SELECT CAST(actual AS BIGINT) AS actual, CAST(rule_cls AS BIGINT) AS predicted,
         |       CAST(SUM(m) AS BIGINT) AS n
         |FROM best WHERE rn=1 GROUP BY actual, rule_cls ORDER BY actual, predicted""".stripMargin,

    "q43_ml_metrics" ->
      s"""$classifyCtes,
         |win AS (SELECT actual, rule_cls, m FROM best WHERE rn=1),
         |cm AS (SELECT
         |  SUM(CASE WHEN actual=1 AND rule_cls=1 THEN m ELSE 0 END) AS tp,
         |  SUM(CASE WHEN actual=0 AND rule_cls=0 THEN m ELSE 0 END) AS tn,
         |  SUM(CASE WHEN actual=0 AND rule_cls=1 THEN m ELSE 0 END) AS fp,
         |  SUM(CASE WHEN actual=1 AND rule_cls=0 THEN m ELSE 0 END) AS fn
         |  FROM win)
         |SELECT ROUND((tp+tn)*1.0/(tp+tn+fp+fn),6) AS accuracy,
         |       ROUND(tp*1.0/(tp+fn),6) AS tpr,
         |       ROUND(tn*1.0/(tn+fp),6) AS tnr,
         |       ROUND(SQRT((tp*1.0/(tp+fn))*(tn*1.0/(tn+fp))),6) AS gm,
         |       ROUND((1 + tp*1.0/(tp+fn) - fp*1.0/(fp+tn))/2,6) AS auc
         |FROM cm""".stripMargin,

    // x201/x202 share the q42 chain but need the winning RULE, not just its
    // class: the per-example tie order is refined to the TOTAL order
    // (score DESC, rule_cls, a1, a2) — identical winners to q42 (same
    // leading keys), now rule-deterministic.
    "x201_rule_coverage" ->
      s"""$ruleBaseCtes,
         |final_rb AS (SELECT a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
         |gex AS (SELECT x1, x2, cls, COUNT(*) AS m FROM lab GROUP BY x1, x2, cls),
         |scored AS (
         |  SELECT g.x1, g.x2, g.cls AS actual, g.m, r.a1, r.a2, r.rule_cls, r.rw,
         |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
         |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
         |        * r.rw, 12) AS score
         |  FROM gex g CROSS JOIN final_rb r),
         |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
         |                   ORDER BY score DESC, rule_cls, a1, a2) AS rn FROM scored),
         |win AS (SELECT * FROM best WHERE rn=1),
         |cov AS (SELECT a1, a2, rule_cls,
         |               CAST(SUM(m) AS BIGINT) AS n_won,
         |               CAST(SUM(CASE WHEN actual = rule_cls THEN m ELSE 0 END) AS BIGINT) AS n_correct
         |        FROM win GROUP BY 1,2,3)
         |SELECT CAST(f.a1 AS BIGINT) AS a1, CAST(f.a2 AS BIGINT) AS a2,
         |       CAST(f.rule_cls AS BIGINT) AS cls, ROUND(f.rw, 6) AS rw,
         |       COALESCE(c.n_won, 0) AS n_won,
         |       COALESCE(c.n_correct, 0) AS n_correct,
         |       CASE WHEN COALESCE(c.n_won, 0) > 0
         |            THEN ROUND(c.n_correct*1.0/c.n_won, 6) END AS rule_precision,
         |       ROUND(COALESCE(c.n_won, 0)*1.0 / SUM(COALESCE(c.n_won, 0)) OVER (), 6)
         |         AS win_share
         |FROM final_rb f LEFT JOIN cov c
         |  ON c.a1 = f.a1 AND c.a2 = f.a2 AND c.rule_cls = f.rule_cls
         |ORDER BY a1, a2""".stripMargin,

    "x202_score_calibration" ->
      s"""$ruleBaseCtes,
         |final_rb AS (SELECT a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
         |gex AS (SELECT x1, x2, cls, COUNT(*) AS m FROM lab GROUP BY x1, x2, cls),
         |scored AS (
         |  SELECT g.x1, g.x2, g.cls AS actual, g.m, r.a1, r.a2, r.rule_cls, r.rw,
         |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
         |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
         |        * r.rw, 12) AS score
         |  FROM gex g CROSS JOIN final_rb r),
         |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
         |                   ORDER BY score DESC, rule_cls, a1, a2) AS rn FROM scored),
         |win AS (SELECT * FROM best WHERE rn=1),
         |acts AS (
         |  SELECT m, actual, rule_cls,
         |    ROUND(GREATEST(0,1-ABS(x1 - (CASE a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
         |        * GREATEST(0,1-ABS(x2 - (CASE a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
         |        12) AS act
         |  FROM win),
         |b AS (SELECT LEAST(CAST(FLOOR(act*10) AS BIGINT), 9) AS bucket, m,
         |             CAST(ROUND(act*1000000, 0) AS BIGINT) AS p6,
         |             CASE WHEN actual = rule_cls THEN m ELSE 0 END AS mc
         |      FROM acts)
         |SELECT bucket, CAST(SUM(m) AS BIGINT) AS n,
         |       ROUND(SUM(p6*m)*1.0 / (SUM(m) * 1000000.0), 6) AS mean_activation,
         |       CAST(SUM(mc) AS BIGINT) AS n_correct,
         |       ROUND(SUM(mc)*1.0 / SUM(m), 6) AS accuracy
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  )

  val llm: Map[String, String] = Map(
    "q44_dedup_exact" ->
      """SELECT LOWER(text) AS norm, MIN(doc_id) AS rep, COUNT(*) AS n
        |FROM documents GROUP BY norm ORDER BY rep""".stripMargin,

    "q45_similarity_cosine_topk" ->
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
        |  FROM embeddings e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, cos FROM sims ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,

    "q46_knn_label_vote" ->
      """WITH d AS (SELECT a.vec_id AS qid, b.vec_id AS nid, b.label,
        |  ROUND(list_sum([(CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
        |                * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
        |                  FOR i IN generate_series(1,64)]),6) AS d2
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id WHERE a.vec_id < 100),
        |nn    AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn FROM d),
        |votes AS (SELECT qid, label, COUNT(*) AS v FROM nn WHERE rn <= 5 GROUP BY qid, label),
        |win   AS (SELECT qid, label,
        |                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY v DESC, label) AS rn
        |          FROM votes)
        |SELECT qid AS vec_id, CAST(label AS BIGINT) AS predicted FROM win WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    "q47_text_tokenize_topk" ->
      """SELECT tok, COUNT(*) AS n
        |FROM (SELECT UNNEST(string_split(LOWER(text),' ')) AS tok FROM documents)
        |WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,

    "q48_text_tfidf" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(LOWER(text),' ')) AS tok FROM documents),
        |tf  AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
        |df  AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n   AS (SELECT COUNT(doc_id) AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.tok, ROUND(tf.tf * LN(n.n * 1.0 / df.df), 6) AS tfidf
        |           FROM tf JOIN df USING (tok) CROSS JOIN n WHERE tf.doc_id < 50),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                      ORDER BY tfidf DESC, tok) AS rn FROM scored)
        |SELECT doc_id, tok, tfidf FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q49_text_lang_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       ROUND(AVG(n_chars),4) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin
  )

  /** Oracle SQL for the arithmetic-portable extended operators. */
  /** Shared rolling-hash fingerprint prelude (x13's machinery): tokenized
    * docs → positioned tokens (first 256) → 5-token Horner codes. Callers
    * append their own `fps` head (with or without DISTINCT). */
  private[graft] val fpCodedCtes =
    """d AS (SELECT doc_id,
      |  [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t FROM documents),
      |toks AS (
      |  SELECT doc_id, gs.i AS pos, t[gs.i] AS tok
      |  FROM d, generate_series(1, 256) AS gs(i) WHERE gs.i <= len(t)),
      |coded AS (
      |  SELECT doc_id, pos, code AS c0,
      |    LEAD(code,1) OVER w AS c1, LEAD(code,2) OVER w AS c2,
      |    LEAD(code,3) OVER w AS c3, LEAD(code,4) OVER w AS c4
      |  FROM (SELECT doc_id, pos,
      |        CAST(ascii(substr(tok,1,1))*4096 + ascii(substr(tok,2,1))*64
      |             + length(tok) AS BIGINT) AS code FROM toks)
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos))""".stripMargin

  /** Distinct per-doc fingerprints over the prelude. */
  private[graft] val fpsDistinctCte =
    """fps AS (
      |  SELECT DISTINCT doc_id,
      |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
      |      % 1000000007 * 131 + c0) % 1000000007 AS fp
      |  FROM coded WHERE c4 IS NOT NULL)""".stripMargin

  /** x24's connected components (recursive transitive closure, min label per
    * node) — shared by the x33 survivor-selection oracle. */
  private val componentCtes =
    fpCodedCtes + ",\n" + fpsDistinctCte + ",\n" +
      """edges AS (
        |  SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id <> b.doc_id),
        |reach(node, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.u, r.lab FROM reach r JOIN edges e ON e.v = r.node),
        |comp AS (SELECT node AS doc_id, MIN(lab) AS comp FROM reach GROUP BY node)""".stripMargin

  val ext: Map[String, String] = Map(
    // x05 rebuilds a map from "k=<json k>,type=<event_type>" then emits
    // sorted keys + two lookups. Both keys exist on every row, so the
    // portable statement of the expected output is direct: the sorted key
    // list is the constant "k,type" and the lookups are the source values.
    // The Spark side still exercises str_to_map/map_keys/element_at; the
    // oracle pins what they must produce.
    "x05_map_funcs" ->
      """SELECT event_id, 'k,type' AS keys,
        |       CAST(json_extract_string(props,'$.k') AS BIGINT) AS k_val,
        |       event_type AS type_val
        |FROM events ORDER BY event_id""".stripMargin,

    // x106: every aggregate is over the BIGINT-cast parse of the single
    // real props field; `parsed` counts successful parses on both engines.
    // TRY_CAST, not CAST: the Spark side's from_json contract is
    // NULL-on-malformed (pinned by OutputContractSpec), and DuckDB's CAST
    // would ABORT on a hostile/non-numeric k instead of matching that.
    "x106_json_typed_parse" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS parsed,
        |       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x11_text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |       ROUND(LEAST(n_chars*1.0/500, 1.0)*0.4
        |           + (len(list_distinct(toks))*1.0/len(toks))*0.4
        |           + LEAST((n_chars*1.0/len(toks))/10, 1.0)*0.2, 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "x12_text_tokencount" ->
      """SELECT doc_id,
        |  CAST(len([x FOR x IN string_split(text, ' ') IF x <> '']) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(LOWER(text), '[a-z]+')) AS BIGINT) AS re_tokens,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x13_text_fingerprint" ->
      ("WITH " + fpCodedCtes + ",\n" +
        """fps AS (
          |  SELECT doc_id,
          |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
          |      % 1000000007 * 131 + c0) % 1000000007 AS fp
          |  FROM coded WHERE c4 IS NOT NULL)
          |SELECT doc_id, COUNT(*) AS n_windows, COUNT(DISTINCT fp) AS n_distinct_fp,
          |       MIN(fp) AS min_fp
          |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // x34: token-level filler strip — list comprehension preserves token
    // order on both engines, so the rejoined text lengths match exactly.
    // x116: identical planting, identical RE2/Java-agreeing patterns; 'g'
    // flag on regexp_replace because DuckDB replaces only the first match
    // by default where Spark replaces all.
    "x116_pii_redact" ->
      """WITH planted AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN text || ' contact u' || CAST(doc_id AS VARCHAR)
        |              || '@example.com from 10.2.'
        |              || CAST(doc_id % 256 AS VARCHAR) || '.'
        |              || CAST(doc_id % 100 AS VARCHAR)
        |         ELSE text END AS t
        |  FROM documents),
        |red AS (
        |  SELECT source, t,
        |    len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |    regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean
        |  FROM planted)
        |SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN n_emails + n_ips > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs,
        |       CAST(SUM(n_emails) AS BIGINT) AS n_emails,
        |       CAST(SUM(n_ips) AS BIGINT) AS n_ips,
        |       CAST(SUM(len(t) - len(clean)) AS BIGINT) AS chars_removed
        |FROM red GROUP BY source ORDER BY source""".stripMargin,

    "x34_text_clean" ->
      """WITH cleaned AS (
        |  SELECT doc_id, lang,
        |    [x FOR x IN string_split(text, ' ')
        |       IF x <> '' AND x <> 'a' AND x <> 'the'] AS kept,
        |    [x FOR x IN string_split(text, ' ') IF x <> ''] AS alltok
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CAST(len(alltok) - len(kept) AS BIGINT) AS n_removed,
        |       CAST(length(array_to_string(kept, ' ')) AS BIGINT) AS clean_chars
        |FROM cleaned ORDER BY doc_id""".stripMargin,

    "x35_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(MAX(c) AS BIGINT) AS max_tok_cnt,
        |       ROUND(MAX(c) * 1.0 / SUM(c), 6) AS rep_frac
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x36_vocab_build" ->
      """WITH toks AS (
        |  SELECT x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
        |          HAVING COUNT(*) >= 5)
        |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS token_id, tok,
        |       CAST(cnt AS BIGINT) AS cnt
        |FROM vocab ORDER BY token_id""".stripMargin
  )

  /** Pivot/unpivot over a fixed value list — portable conditional agg. */
  val reshape: Map[String, String] = Map(
    "x16_pivot_wide" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(SUM(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(SUM(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(SUM(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x17_unpivot_long" ->
      """SELECT user_id, event_type, COUNT(*) AS cnt
        |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin
  )

  /** Training-corpus assembly (x20–x21) — exact BIGINT arithmetic and string
    * normalization, portable to DuckDB. */
  val pipeline: Map[String, String] = Map(
    "x20_split_hash" ->
      """WITH bucketed AS (
        |  SELECT lang, n_chars,
        |         CASE WHEN ((doc_id % 100000000) * 2654435761) % 1000 < 800 THEN 'train'
        |              WHEN ((doc_id % 100000000) * 2654435761) % 1000 < 900 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM bucketed GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "x30_corpus_mix" ->
      """WITH m AS (
        |  SELECT lang, n_chars,
        |         ((doc_id % 100000000) * 2246822519) % 1000 AS bucket,
        |         CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 800
        |                   WHEN 'fr' THEN 700 WHEN 'zh' THEN 900
        |                   ELSE 1000 END AS thresh
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN bucket < thresh THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN bucket < thresh THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,

    "x21_decontaminate" ->
      """SELECT lang, COUNT(*) AS n_clean, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents b
        |  WHERE b.doc_id % 97 = 0 AND lower(b.text) = lower(d.text))
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "x22_skew_salted_join" ->
      """WITH ut AS (SELECT user_id, COUNT(*) AS user_events
        |            FROM events GROUP BY user_id)
        |SELECT e.event_type, COUNT(*) AS n, CAST(SUM(ut.user_events) AS BIGINT) AS sum_user_events
        |FROM events e JOIN ut ON e.user_id = ut.user_id
        |GROUP BY e.event_type ORDER BY event_type""".stripMargin,

    // x31: same fingerprint CTEs as x13, then drop documents sharing any
    // fingerprint with the benchmark slice (doc_id % 97 = 0).
    "x31_decontaminate_ngram" ->
      ("WITH " + fpCodedCtes + ",\n" + fpsDistinctCte + ",\n" +
        """bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
          |contaminated AS (SELECT DISTINCT doc_id FROM fps JOIN bench USING (fp))
          |SELECT lang, COUNT(*) AS n_clean, CAST(SUM(n_chars) AS BIGINT) AS n_chars
          |FROM documents doc
          |WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = doc.doc_id)
          |GROUP BY lang ORDER BY lang""".stripMargin),

    // x24: same fingerprint CTEs as x13, then connected components as a
    // recursive-CTE transitive closure with min label per node.
    "x24_dedup_components" ->
      ("WITH RECURSIVE " + componentCtes + "\n" +
        "SELECT doc_id, comp FROM comp ORDER BY doc_id"),

    // x33: x24's components, then the canonical survivor per component
    // (longest text, ties to smallest doc_id) plus cluster mass.
    "x33_dedup_canonical" ->
      ("WITH RECURSIVE " + componentCtes + ",\n" +
        """ranked AS (
          |  SELECT c.comp, c.doc_id, doc.n_chars,
          |    ROW_NUMBER() OVER (PARTITION BY c.comp
          |                       ORDER BY doc.n_chars DESC, c.doc_id) AS rn
          |  FROM comp c JOIN documents doc USING (doc_id))
          |SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_members,
          |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          |       MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
          |       CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS survivor_chars
          |FROM ranked GROUP BY comp ORDER BY comp""".stripMargin),

    // x32: per-shard running offsets are exact BIGINT window sums; window
    // assignment is integer division on both engines.
    "x32_sequence_pack" ->
      """WITH c AS (
        |  SELECT doc_id, doc_id % 8 AS shard, n_chars,
        |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
        |  FROM documents)
        |SELECT shard, CAST(start_off // 16384 AS BIGINT) AS window_id,
        |       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )

  /** Oracles for the streaming twins (round-2 addition). Each replay is ONE
    * AvailableNow batch over one parquet file, which makes the stream output
    * a deterministic function of the data:
    *   - x02/x03 run in COMPLETE mode → every window/session is emitted
    *     regardless of watermark, so the output equals the batch aggregate.
    *   - x04 runs in UPDATE mode and the entry takes max(cnt) per window —
    *     update-mode counts are cumulative, so the max IS the final count
    *     even if the source ever split into multiple batches.
    *   - x25's dedup state cannot expire mid-batch (the watermark advances
    *     only between batches), so the emitted key set equals batch DISTINCT.
    * x19 (APPEND mode) emits: every non-final session per user (closed
    * in-batch by a later event), plus final sessions whose event-time
    * timeout fired — Spark fires when timeout_ms < watermark_ms with
    * timeout_ms = (last_us+gap)/1000 and watermark_ms = max_us/1000 − delay,
    * all integer-floor µs→ms. That boundary is replicated digit-for-digit
    * below (// 1000 both sides, strict <); StreamingSpec guards the one
    * case where < vs <= could diverge (exact-equality timeouts). */
  val streaming: Map[String, String] = Map(
    // complete-mode tumbling replay == the q35 batch aggregate, same columns
    "x02_stream_tumbling_watermark" -> OracleSql.relational("q35_window_tumbling"),

    // x91: a capacity-64 Misra–Gries summary of a 31-token vocabulary never
    // evicts, so the streamed sketch weights ARE the exact counts — the
    // plain batch top-20 (x62's oracle) pins it; the sketch's lossy regime
    // is property-tested in WrangleSpec instead.
    "x91_stream_heavy_hitters" -> OracleSqlWrangle.wrangle("x62_heavy_hitters"),

    "x03_stream_session_window" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         -- >= not >: session_window is half-open [start, last+gap), so
        |         -- an event at EXACTLY last+gap starts a new session (ADVICE r2)
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
        |                   OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |sess AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x04_stream_late_data" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, COUNT(*) AS cnt
        |FROM events GROUP BY bucket_us ORDER BY bucket_us""".stripMargin,

    "x25_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_keys
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x114: on the single-batch replay the transformWithState processor
    // emits each user exactly once with lifetime totals — the plain batch
    // per-user aggregate. Cross-batch accumulation is MemoryStream-tested.
    "x114_stream_transform_state" ->
      """SELECT user_id, COUNT(*) AS n_events, MAX(epoch_us(ts)) AS last_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x134: single-batch replay ⇒ each user's ListState journey equals the
    // batch first-3-by-event-time path (x132's per-user prefix, no top-k).
    // Late-event displacement is MemoryStream-tested.
    "x134_stream_entry_journey" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x19_stream_custom_state" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us,
        |        CASE WHEN LAG(us) OVER w IS NULL
        |                  OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, us,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |sess AS (SELECT user_id, sid, MAX(us) AS last_us, COUNT(*) AS n
        |         FROM s GROUP BY 1, 2),
        |wm AS (SELECT MAX(us) AS mx FROM e),
        |closed AS (
        |  SELECT sess.* FROM sess
        |  WHERE sid < (SELECT MAX(sid) FROM sess s2 WHERE s2.user_id = sess.user_id)
        |     OR (last_us + 1800000000) // 1000 < (SELECT mx FROM wm) // 1000 - 600000)
        |SELECT user_id, COUNT(*) AS n_closed_sessions,
        |       CAST(SUM(n) AS BIGINT) AS n_events
        |FROM closed GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x29: inner stream-stream joins emit every match present in the batch;
    // the batch twin is a plain range join (q09's family)
    "x29_stream_stream_join" ->
      """SELECT p.event_id AS p_id, COUNT(*) AS n_clicks_10m
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |GROUP BY p_id ORDER BY p_id""".stripMargin
  )

  /** x28: exact percentiles — both engines compute the type-7 linear
    * interpolation at index p·(n−1) over the sorted group. */
  val percentile: Map[String, String] = Map(
    "x28_percentile_exact" ->
      """SELECT o_orderpriority,
        |       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75,
        |       ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // x15 theorem form: exact distinct + exact type-7 percentiles (the
    // x28-proven quantile_cont pairing) and approx_ok = TRUE — the engine
    // computes the sketch contract (HLL within 5%, percentile_approx
    // within ±0.005·n rank) for real; a regression flips the flag red.
    "x15_approx_sketches" ->
      """SELECT o_orderpriority,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.95), 6) AS p95,
        |       TRUE AS approx_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // x108 theorem form: exact distinct + sketch_ok = TRUE (tiled union
    // within 2% of direct, direct within 5% of exact — the x112 bounds).
    "x108_hll_mergeable" ->
      """SELECT o_orderpriority,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        |       TRUE AS sketch_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // x18 theorem form: the exact brute-force top-20 for vec 0 (q45's
    // kernel, ranked) + ivf_ok = TRUE — the engine computes the IVF
    // contract (nprobe=4 probe finds >= 18 of the exact top-20) for real;
    // a recall regression flips the flag red.
    "x18_ann_ivf" ->
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
        |SELECT rk, vec_id, cos, TRUE AS ivf_ok FROM top
        |WHERE rk <= 20 ORDER BY rk""".stripMargin
  )

  /** x10 lang-ID is pure deterministic relational algebra (top-20 token
    * profile per language, argmax hits per doc, explicit tiebreaks) —
    * portable to DuckDB verbatim. */
  val langid: Map[String, String] = Map(
    "x10_text_langid" ->
      """WITH langtoks AS (
        |  SELECT doc_id, lang, tok FROM (
        |    SELECT doc_id, lang, UNNEST(string_split(LOWER(text),' ')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |profile AS (
        |  SELECT lang AS p_lang, tok FROM (
        |    SELECT lang, tok,
        |           ROW_NUMBER() OVER (PARTITION BY lang
        |                              ORDER BY COUNT(*) DESC, tok) AS rn
        |    FROM langtoks GROUP BY lang, tok) WHERE rn <= 20),
        |hits AS (
        |  SELECT t.doc_id, p.p_lang, COUNT(*) AS hits
        |  FROM langtoks t JOIN profile p USING (tok)
        |  GROUP BY t.doc_id, p.p_lang),
        |predicted AS (
        |  SELECT doc_id, p_lang AS predicted FROM (
        |    SELECT doc_id, p_lang,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id
        |                              ORDER BY hits DESC, p_lang) AS rn
        |    FROM hits) WHERE rn = 1)
        |SELECT d.lang, COALESCE(p.predicted,'unknown') AS predicted, COUNT(*) AS n
        |FROM documents d LEFT JOIN predicted p USING (doc_id)
        |GROUP BY d.lang, predicted ORDER BY d.lang, predicted""".stripMargin
  )

  /** x37–x40: pattern-mining extensions (round 4) — exact window/integer
    * arithmetic, portable term-for-term. */
  val mining: Map[String, String] = Map(
    // x37: ntile among TIES is order-dependent — the custkey tiebreak makes
    // the window order total, so bucket assignment matches across engines
    "x37_analytic_ranks" ->
      """SELECT c_custkey, c_mktsegment,
        |       ntile(4)        OVER w AS bucket,
        |       ROUND(percent_rank() OVER w, 6) AS pr,
        |       ROUND(cume_dist()    OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    // x104: identical statement (exact decimal cross-multiplication, never a
    // float AVG) — both engines decorrelate; values compare bit-for-bit.
    "x104_correlated_subquery" ->
      """SELECT o.o_orderpriority, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders o
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) *
        |        (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |      > (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
        |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,

    // x107: same integer-cents arithmetic; DuckDB's integer floor division
    // is `//` (Spark spells it DIV), and its BIGINT SUM widens to HUGEINT —
    // cast back so dtypes align.
    "x107_scalar_subquery_share" ->
      """WITH l AS (SELECT o_orderpriority,
        |                  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
        |           FROM orders)
        |SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS cents,
        |       CAST(SUM(c) * 1000000 // (SELECT SUM(c) FROM l) AS BIGINT) AS rev_ppm,
        |       CAST(COUNT(*) * 1000000 // (SELECT COUNT(*) FROM l) AS BIGINT) AS cnt_ppm
        |FROM l GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // x105: the oracle restates min_by/max_by/mode as window rn=1 picks
    // under the same total orders (price,key asc | price,key desc | freq
    // desc, value asc) — proving the aggregates against first principles.
    "x105_mode_argmax" ->
      """WITH b AS (SELECT o_orderpriority AS pri, o_orderkey AS k,
        |                  CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
        |lo AS (SELECT pri, k AS cheapest_key FROM
        |        (SELECT pri, k, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY p, k) AS rn
        |         FROM b) WHERE rn = 1),
        |hi AS (SELECT pri, k AS priciest_key FROM
        |        (SELECT pri, k, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY p DESC, k DESC) AS rn
        |         FROM b) WHERE rn = 1),
        |md AS (SELECT pri, s AS mode_status FROM
        |        (SELECT o_orderpriority AS pri, o_orderstatus AS s, COUNT(*) AS c
        |         FROM orders GROUP BY 1, 2) t
        |       QUALIFY ROW_NUMBER() OVER (PARTITION BY pri ORDER BY c DESC, s) = 1)
        |SELECT lo.pri AS o_orderpriority, cheapest_key, priciest_key, mode_status
        |FROM lo JOIN hi ON lo.pri = hi.pri JOIN md ON lo.pri = md.pri
        |ORDER BY o_orderpriority""".stripMargin,

    "x38_fuzzy_match_join" ->
      """WITH toks AS (
        |  SELECT regexp_extract(p_name, '^([a-z]+)', 1) AS tok,
        |         COUNT(*) AS n_parts
        |  FROM part WHERE regexp_extract(p_name, '^([a-z]+)', 1) <> ''
        |  GROUP BY 1),
        |probes AS (SELECT * FROM (VALUES ('cld'), ('bleu'), ('largee'),
        |                                 ('hut'), ('smal'), ('redd')) v(probe))
        |SELECT probe, tok, CAST(levenshtein(tok, probe) AS BIGINT) AS dist,
        |       n_parts
        |FROM toks JOIN probes
        |  ON abs(length(tok) - length(probe)) <= 2
        | AND levenshtein(tok, probe) <= 2
        |ORDER BY probe, tok""".stripMargin,

    "x39_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin,

    // x40: DuckDB 1.0's generate_series cannot take a lateral column stop —
    // fixed bound 32 + WHERE, the same pattern as the x13 fingerprint CTEs;
    // the engine side caps at 32 identically (tokens are ≤8 chars [MEASURED])
    "x40_bpe_pair_counts" ->
      """WITH toks AS (
        |  SELECT x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |pairs AS (
        |  SELECT substr(tok, CAST(g.i AS INTEGER), 2) AS pair
        |  FROM toks, generate_series(1, 32) g(i)
        |  WHERE g.i <= length(tok) - 1)
        |SELECT pair, COUNT(*) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,

    "x41_class_rebalance" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS label,
        |         ((CAST(l_orderkey AS BIGINT) * 10 + l_linenumber) % 100000000)
        |           * 2971215073 % 1000 AS bucket
        |  FROM lineitem)
        |SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN label = 1 OR bucket < 110
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM t GROUP BY label ORDER BY label""".stripMargin,

    // x42: modulus 61 (prime) — % 64 would cancel the char terms (multiples
    // of 64) and collapse the hash to length-only buckets
    "x42_feature_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)
        |  WHERE doc_id < 20)
        |SELECT doc_id,
        |       CAST((ascii(substr(tok,1,1)) * 4096 + ascii(substr(tok,2,1)) * 64
        |             + length(tok)) % 61 AS BIGINT) AS bucket,
        |       COUNT(*) AS cnt
        |FROM toks GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin,

    "x43_cooccurrence" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    [x FOR x IN string_split(LOWER(text),' ') IF x <> ''][1:256] AS t
        |  FROM documents),
        |p1 AS (SELECT t[g.i] || ' ' || t[g.i+1] AS pair
        |       FROM d, generate_series(1, 255) g(i) WHERE g.i + 1 <= len(t)),
        |p2 AS (SELECT t[g.i] || ' ' || t[g.i+2] AS pair
        |       FROM d, generate_series(1, 254) g(i) WHERE g.i + 2 <= len(t)),
        |u AS (SELECT pair FROM p1 UNION ALL SELECT pair FROM p2)
        |SELECT pair, COUNT(*) AS cnt FROM u
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""".stripMargin
  )

  /** x44–x48: corpus-curation extensions (round 5) — entropy, quantization,
    * novelty, quality gate, and class geometry. Double aggregates rounded at
    * ≥6 digits below the ~1e-14 cross-engine float-sum-order noise; counts
    * and quantization codes are exact integers. */
  val curation: Map[String, String] = Map(
    "x44_token_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       ROUND(LN(CAST(SUM(c) AS DOUBLE))
        |             - SUM(c * LN(CAST(c AS DOUBLE))) / SUM(c), 6) AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x45: codes are integral doubles before the BIGINT cast on both engines
    // (round-half-away-from-zero matches Spark's HALF_UP for doubles), so
    // code_sum is bit-exact; the two error metrics are per-row IEEE double
    // chains, identical in both engines, rounded only against repr noise.
    "x45_embedding_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb,
        |         list_max([ABS(CAST(x AS DOUBLE)) FOR x IN embedding]) AS mx
        |  FROM embeddings)
        |SELECT vec_id, CAST(len(emb) AS BIGINT) AS dim,
        |  ROUND(mx / 127.0, 8) AS scale,
        |  CAST(list_sum([CAST(ROUND(x / (mx / 127.0), 0) AS BIGINT)
        |                 FOR x IN emb]) AS BIGINT) AS code_sum,
        |  ROUND(list_max([ABS(x - ROUND(x / (mx / 127.0), 0) * (mx / 127.0))
        |                  FOR x IN emb]), 8) AS max_abs_err
        |FROM e WHERE mx > 0 ORDER BY vec_id""".stripMargin,

    "x46_bigram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         [x FOR x IN string_split(LOWER(text),' ') IF x <> ''] AS t
        |  FROM documents),
        |b AS (SELECT DISTINCT doc_id, x AS bg FROM d,
        |      UNNEST([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS u(x)),
        |df AS (SELECT bg, COUNT(*) AS df FROM b GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(df), 4) AS avg_df,
        |       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |FROM b JOIN df USING (bg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x47: the repetition test is integer algebra (5·max < total) so the
    // verdict is exact; only keep_rate is a rounded double.
    "x47_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |rep AS (
        |  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_tok FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2) GROUP BY doc_id),
        |d AS (
        |  SELECT doc_id, source, n_chars,
        |    (list_contains([x FOR x IN string_split(LOWER(text),' ') IF x <> ''], 'the')
        |     OR list_contains([x FOR x IN string_split(LOWER(text),' ') IF x <> ''], 'a'))
        |      AS stop_ok
        |  FROM documents),
        |v AS (
        |  SELECT source,
        |    (n_chars BETWEEN 100 AND 500 AND max_c * 5 < n_tok AND stop_ok) AS keep
        |  FROM d JOIN rep USING (doc_id))
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) * 1.0
        |        / COUNT(*), 4) AS keep_rate
        |FROM v GROUP BY source ORDER BY source""".stripMargin,

    "x49_source_cap" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rn <= 20 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS chars_kept
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // x51/x52: the q41/q42 chains with unit costs — the base Chi-FRBCS
    // variant the CS algorithm extends
    "x51_ml_chi_base_weights" ->
      s"""$ruleBaseCtesBase
         |SELECT CAST(a1 AS BIGINT) AS a1, CAST(a2 AS BIGINT) AS a2,
         |       CAST(rule_cls AS BIGINT) AS cls, ROUND(rw,6) AS rw
         |FROM rb WHERE rn=1 AND rw > 0 ORDER BY a1, a2""".stripMargin,

    "x52_ml_chi_base_classify" ->
      s"""$classifyCtesBase
         |SELECT CAST(actual AS BIGINT) AS actual, CAST(rule_cls AS BIGINT) AS predicted,
         |       CAST(SUM(m) AS BIGINT) AS n
         |FROM best WHERE rn=1 GROUP BY actual, rule_cls ORDER BY actual, predicted""".stripMargin,

    "x50_length_histogram" ->
      """SELECT lang, CAST(n_chars // 50 AS BIGINT) AS bin,
        |       COUNT(*) AS n_docs,
        |       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |       CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    // x14/x26: the multimodal decode STUB is a deterministic pure function
    // of the payload bytes (16-bin high-nibble histogram / payload-size
    // dims), and the corpus is ASCII (MultimodalSpec guards this), so
    // char-indexed SQL reproduces the byte math exactly. Pair-sums in x26
    // are 2-term float additions — commutative, hence order-exact.
    "x14_multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |         WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
        |    length(text) AS len, text
        |  FROM documents),
        |bins AS (
        |  SELECT doc_id, ascii(substr(text, CAST(u.i AS INTEGER), 1)) // 16 AS bin
        |  FROM b, UNNEST(range(1, len + 1)) AS u(i)),
        |h AS (SELECT doc_id, bin, COUNT(*) AS c FROM bins GROUP BY 1, 2),
        |per AS (
        |  SELECT b.doc_id, b.format,
        |         COALESCE(SQRT(SUM((h.c * 1.0 / b.len) * (h.c * 1.0 / b.len))), 0.0) AS norm,
        |         64 + b.len % 64 AS width, 64 + (b.len // 64) % 64 AS height
        |  FROM b LEFT JOIN h USING (doc_id) GROUP BY b.doc_id, b.format, b.len)
        |SELECT format, COUNT(*) AS n, ROUND(AVG(norm), 6) AS avg_norm,
        |       ROUND(AVG(width), 6) AS avg_width, ROUND(AVG(height), 6) AS avg_height
        |FROM per GROUP BY format ORDER BY format""".stripMargin,

    "x26_multimodal_frames" ->
      """WITH b AS (
        |  SELECT doc_id, length(text) AS len, text FROM documents
        |  WHERE doc_id % 4 = 3),
        |f AS (SELECT doc_id, len, text,
        |             LEAST(8, GREATEST(1, len // 256)) AS n FROM b),
        |fr AS (SELECT doc_id, text, u.f AS frame_id,
        |              (u.f * len) // n AS lo, ((u.f + 1) * len) // n AS hi
        |       FROM f, UNNEST(range(0, n)) AS u(f)),
        |h16 AS (
        |  SELECT doc_id, frame_id, hi - lo AS flen,
        |         ascii(substr(text, CAST(lo + u2.i + 1 AS INTEGER), 1)) // 16 AS bin
        |  FROM fr, UNNEST(range(0, hi - lo)) AS u2(i)),
        |hc AS (SELECT doc_id, frame_id, flen, bin, COUNT(*) AS c
        |       FROM h16 GROUP BY 1, 2, 3, 4),
        |g AS (SELECT doc_id, frame_id, bin // 2 AS gb,
        |             SUM(c * 1.0 / flen) AS v
        |      FROM hc GROUP BY doc_id, frame_id, flen, bin // 2),
        |per AS (SELECT doc_id, frame_id, SQRT(SUM(v * v)) AS fnorm
        |        FROM g GROUP BY doc_id, frame_id)
        |SELECT doc_id, COUNT(*) AS n_frames,
        |       ROUND(AVG(fnorm), 6) AS avg_frame_norm
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x56: x36's vocab (min-count 5, ids by desc count then tok) applied to
    // each doc's first 20 tokens; OOV encodes as 0
    "x56_encode_tokens" ->
      """WITH t0 AS (
        |  SELECT x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |vocab AS (
        |  SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS token_id
        |  FROM (SELECT tok, COUNT(*) AS cnt FROM t0 GROUP BY tok)
        |  WHERE cnt >= 5),
        |d AS (SELECT doc_id,
        |        [x FOR x IN string_split(LOWER(text),' ') IF x <> ''][1:20] AS t
        |      FROM documents),
        |p AS (SELECT doc_id, unnest(t) AS tok,
        |             unnest(range(1, len(t) + 1)) AS pos FROM d),
        |enc AS (SELECT doc_id, pos, COALESCE(v.token_id, 0) AS id
        |        FROM p LEFT JOIN vocab v USING (tok))
        |SELECT doc_id, COUNT(*) AS n_enc,
        |       string_agg(id, ',' ORDER BY pos) AS ids
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x53_funnel_ordered" ->
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage_n, 'signup' AS stage,
        |       COUNT(*) AS users FROM s1
        |UNION ALL SELECT 2, 'view_after_signup', COUNT(*) FROM s2
        |UNION ALL SELECT 3, 'purchase_after_view', COUNT(*) FROM s3
        |ORDER BY stage_n""".stripMargin,

    "x54_cohort_retention" ->
      """WITH ev AS (SELECT user_id,
        |              epoch_us(ts) // 604800000000 AS week FROM events),
        |cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, week FROM ev)
        |SELECT cohort_week, (week - cohort_week) AS week_offset,
        |       COUNT(*) AS users
        |FROM active JOIN cohort USING (user_id)
        |WHERE week - cohort_week <= 3
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "x55_inverted_index" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x))
        |SELECT tok, COUNT(*) AS df,
        |       array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
        |FROM t GROUP BY tok HAVING COUNT(*) >= 5 ORDER BY tok""".stripMargin,

    // x48: pos is a join key internal to each engine (Spark 0-based,
    // DuckDB 1-based — never output), so the offset is immaterial.
    "x48_label_centroid" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         UNNEST(embedding) AS v0,
        |         UNNEST(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings),
        |e2 AS (SELECT vec_id, label, pos, CAST(v0 AS DOUBLE) AS v FROM e),
        |c AS (SELECT label, pos, AVG(v) AS cv FROM e2 GROUP BY 1, 2),
        |p AS (SELECT vec_id, e2.label AS label, SUM(v * cv) AS dot,
        |             SUM(v * v) AS nv, SUM(cv * cv) AS nc
        |      FROM e2 JOIN c USING (label, pos) GROUP BY 1, 2)
        |SELECT label, COUNT(*) AS n_vecs,
        |       ROUND(AVG(dot / SQRT(nv * nc)), 6) AS mean_cos
        |FROM p GROUP BY label ORDER BY label""".stripMargin
  )

  def all: Map[String, String] =
    ml ++ llm ++ ext ++ reshape ++ pipeline ++ streaming ++ langid ++ percentile ++ mining ++ curation ++
      Map("x06_chi_estimator_fit" -> ml("q42_ml_chi_classify"),
          // the native as-of operator must produce exactly the composed form's
          // results — same oracle as q11
          "x23_asof_join_native" -> OracleSql.relational("q11_join_asof_prior"),
          // the stream-static join is x22's semantics through the streaming
          // runtime (complete-mode single-batch replay) — same oracle
          "x27_stream_static_join" -> pipeline("x22_skew_salted_join"),
          // streaming model serving scores the full replay through the
          // q42-identical model — same confusion matrix, same oracle
          "x203_stream_chi_score" -> ml("q42_ml_chi_classify"),
          // the save→load round trip and the KEEL .dat train path must each
          // reproduce the in-memory model's classification exactly
          "x204_model_save_load" -> ml("q42_ml_chi_classify"),
          "x205_keel_train_pipeline" -> ml("q42_ml_chi_classify"),

          // x272: decile lift/gains over the q42 classification grain —
          // groups occupy row intervals [cum+1, cum+m] under the total
          // order (score DESC, x1, x2, cls); decile membership is interval
          // intersection (a straddling group splits exactly); all rates are
          // BIGINT-exact ppm floor divisions, lift = ppm-rate // ppm-base.
          "x272_decile_lift" ->
            s"""$classifyCtes,
               |grp AS (SELECT x1, x2, actual AS cls, m, score
               |        FROM best WHERE rn = 1),
               |spans AS (
               |  SELECT *, COALESCE(SUM(m) OVER (
               |      ORDER BY score DESC, x1, x2, cls
               |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS lo
               |  FROM grp),
               |tot AS (SELECT SUM(m) AS N,
               |               SUM(CASE WHEN cls = 1 THEN m ELSE 0 END) AS P
               |        FROM grp),
               |cells AS (
               |  SELECT d.decile, s.cls,
               |    GREATEST(0, LEAST(s.lo + s.m - 1, d.dhi)
               |                - GREATEST(s.lo, d.dlo) + 1) AS ov
               |  FROM spans s CROSS JOIN
               |    (SELECT decile, (decile - 1) * N // 10 + 1 AS dlo,
               |            decile * N // 10 AS dhi
               |     FROM generate_series(1, 10) AS g(decile), tot) d),
               |perd AS (SELECT decile, SUM(ov) AS n,
               |                SUM(CASE WHEN cls = 1 THEN ov ELSE 0 END) AS n_pos
               |         FROM cells WHERE ov > 0 GROUP BY decile)
               |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
               |  CAST(n_pos AS BIGINT) AS n_pos,
               |  CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_ppm,
               |  CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
               |       * 1000000 // (SELECT P FROM tot) AS BIGINT) AS cum_capture_ppm,
               |  CAST((n_pos * 1000000 // n) * 1000000
               |       // ((SELECT P FROM tot) * 1000000 // (SELECT N FROM tot))
               |       AS BIGINT) AS lift_ppm
               |FROM perd ORDER BY decile""".stripMargin)
}
