package graft

/** DuckDB oracle SQL, round-11 batch: the nominal-attribute and
  * missing-value Chi chains.
  *
  * This extends x215's generated-chain device (OracleSqlRound10) with two
  * per-feature fragment kinds:
  *  - CATEGORICAL: the dictionary is restated as a ROW_NUMBER rank over the
  *    sorted distinct non-null values (exactly the estimator's sorted
  *    collect_set scan), the code rides a LEFT JOIN so NULLs survive, the
  *    crisp argmax is the code itself, and μ = GREATEST(0, 1 − ABS(code −
  *    label)) — IEEE-identical to the engine's triangular arithmetic at
  *    halfWidth exactly 1 (δ_{code,label} at integer codes, no tolerance);
  *  - NULL-AWARE: every μ factor is CASE WHEN x IS NULL THEN 1.0 ELSE
  *    <fragment> END (the skipped-t-norm missing-value policy), antecedent
  *    labels are NULL for NULL attributes, and candidates require fully
  *    non-null antecedents. The engine's explode-to-all-labels support for
  *    a null attribute is equivalent to this cross-join factor-1
  *    restatement by construction: the exploded copies meet exactly the
  *    candidates the cross join scores at factor 1.
  * Grid arithmetic stays as IEEE EXPRESSIONS, never pre-evaluated literals
  * (the OracleSqlRound8d lesson — one ULP flips argmax ties).
  */
object OracleSqlRound11 {

  private val L = 3

  /** One feature of a generated Chi chain. */
  private sealed trait OFeat
  /** Numeric fuzzy attribute: raw expression + declared [lo, hi] (L = 3). */
  private final case class ONum(raw: String, lo: String, hi: String) extends OFeat
  /** Nominal attribute: raw (string) expression; dictionary derived. */
  private final case class ONom(raw: String) extends OFeat

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

  /** The full Chi-CS train+score chain over a feature list with nominal and
    * null-aware fragments; emits ONE row
    * (n_rules, tp, tn, fp, fn, accuracy, gm). */
  private def chain(table: String, where: String, cls: String,
                    fs: Seq[OFeat]): String = {
    val n = fs.length
    val xs = (1 to n).map(i => s"x$i")
    val as = (1 to n).map(i => s"a$i")
    val rawSel = fs.zipWithIndex
      .map { case (f, i) =>
        val raw = f match { case ONum(r, _, _) => r; case ONom(r) => r }
        s"$raw AS raw${i + 1}"
      }.mkString(",\n         ")
    val nomIdx = fs.zipWithIndex.collect { case (ONom(_), i) => i }
    val dictCtes = nomIdx.map { i =>
      s"""dict${i + 1} AS (
         |  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS DOUBLE) AS r
         |  FROM (SELECT DISTINCT raw${i + 1} AS v FROM src
         |        WHERE raw${i + 1} IS NOT NULL))""".stripMargin
    }
    val baseSel = fs.zipWithIndex.map {
      case (ONum(_, _, _), i) => s"src.raw${i + 1} AS x${i + 1}"
      case (ONom(_), i)       => s"d${i + 1}.r AS x${i + 1}"
    }.mkString(", ")
    val baseJoins = nomIdx.map { i =>
      s"LEFT JOIN dict${i + 1} d${i + 1} ON src.raw${i + 1} = d${i + 1}.v"
    }.mkString("\n  ")
    val labSel = fs.zipWithIndex.map {
      case (ONum(_, lo, hi), i) =>
        s"CASE WHEN x${i + 1} IS NULL THEN NULL ELSE ${argmax(s"x${i + 1}", lo, hi)} END AS a${i + 1}"
      case (ONom(_), i) =>
        s"CASE WHEN x${i + 1} IS NULL THEN NULL ELSE CAST(x${i + 1} AS INTEGER) END AS a${i + 1}"
    }.mkString(",\n         ")
    def factor(tAlias: String, aAlias: String): String = fs.zipWithIndex.map {
      case (ONum(_, lo, hi), i) =>
        s"(CASE WHEN $tAlias.x${i + 1} IS NULL THEN 1.0 ELSE ${muAt(s"$tAlias.x${i + 1}", s"$aAlias.a${i + 1}", lo, hi)} END)"
      case (ONom(_), i) =>
        s"(CASE WHEN $tAlias.x${i + 1} IS NULL THEN 1.0 ELSE GREATEST(0, 1 - ABS($tAlias.x${i + 1} - $aAlias.a${i + 1})) END)"
    }.mkString("\n    * ")
    val wt =
      s"""CAST(ROUND(
         |      (CASE WHEN t.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)
         |    * ${factor("t", "a")},
         |    12) AS DECIMAL(38,12))""".stripMargin
    val antsNotNull = as.map(a => s"$a IS NOT NULL").mkString(" AND ")
    s"""WITH src AS (
       |  SELECT $rawSel,
       |         $cls AS cls
       |  FROM $table$where),
       |${dictCtes.map(_ + ",").mkString("\n")}
       |base AS (
       |  SELECT $baseSel, src.cls AS cls
       |  FROM src
       |  $baseJoins),
       |lab AS (
       |  SELECT *, $labSel
       |  FROM base),
       |costs AS (
       |  SELECT MAX(CASE WHEN cls=1 THEN c END) AS c1,
       |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
       |    SELECT cls, CASE WHEN n = MIN(n) OVER () AND MIN(n) OVER () <> MAX(n) OVER ()
       |                     THEN MAX(n) OVER () * 1.0 / n ELSE 1.0 END AS c
       |    FROM (SELECT cls, COUNT(*) AS n FROM lab GROUP BY cls))),
       |maj AS (SELECT cls FROM (SELECT cls, COUNT(*) AS n FROM base
       |                         GROUP BY 1 ORDER BY n DESC, cls LIMIT 1)),
       |ants AS (SELECT DISTINCT ${as.mkString(", ")}, cls FROM lab
       |         WHERE $antsNotNull),
       |m AS (
       |  SELECT ${as.map("a." + _).mkString(", ")}, a.cls AS rule_cls,
       |    COALESCE(SUM(CASE WHEN t.cls = a.cls THEN $wt END), 0) AS w_match,
       |    SUM($wt) AS w_all
       |  FROM ants a CROSS JOIN lab t GROUP BY ${(1 to n + 1).mkString(",")}),
       |rw AS (SELECT ${as.mkString(", ")}, rule_cls,
       |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
       |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
       |       FROM m WHERE w_all > 0),
       |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ${as.mkString(", ")}
       |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
       |final_rb AS (SELECT ${as.mkString(", ")}, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
       |gex AS (SELECT ${xs.mkString(", ")}, cls, COUNT(*) AS m
       |        FROM lab GROUP BY ${(1 to n + 1).mkString(",")}),
       |scored AS (
       |  SELECT ${xs.map("g." + _).mkString(", ")}, g.cls AS actual, g.m, r.rule_cls,
       |    ROUND(${factor("g", "r")} * r.rw, 12) AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ${xs.mkString(", ")}, actual
       |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
       |win AS (SELECT actual, m,
       |               CASE WHEN score > 0 THEN rule_cls
       |                    ELSE (SELECT cls FROM maj) END AS pred
       |        FROM best WHERE rn=1),
       |nrc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rules FROM final_rb),
       |cm AS (
       |  SELECT CAST(SUM(CASE WHEN actual=1 AND pred=1 THEN m ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(SUM(CASE WHEN actual=0 AND pred=0 THEN m ELSE 0 END) AS BIGINT) AS tn,
       |         CAST(SUM(CASE WHEN actual=0 AND pred=1 THEN m ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(SUM(CASE WHEN actual=1 AND pred=0 THEN m ELSE 0 END) AS BIGINT) AS fn
       |  FROM win)
       |SELECT nrc.n_rules, tp, tn, fp, fn,
       |       ROUND((tp+tn)*1.0/(tp+tn+fp+fn), 6) AS accuracy,
       |       ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))), 6) AS gm
       |FROM cm CROSS JOIN nrc""".stripMargin
  }

  /** x262: inventory restated as in x256's oracle (tri-20 + bi-30 + all
    * single chars) with capped fixed-point weights; the Viterbi argmax
    * restated by ENUMERATING every segmentation (recursive CTE over piece
    * extensions, ≤ 81 per ≤8-char token) and ranking by (exact HUGEINT
    * product DESC, reversed piece-length list DESC) — the global form of
    * the engine DP's ties-to-the-longer-ending-piece rule. */
  private val x262Sql: String =
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
      |bi30 AS (SELECT g, CAST(least(w, 9999) * 10000 AS HUGEINT) AS wq
      |         FROM bi ORDER BY w DESC, g LIMIT 30),
      |tri20 AS (SELECT g, CAST(least(w, 9999) * 100000000 AS HUGEINT) AS wq
      |          FROM tri ORDER BY w DESC, g LIMIT 20),
      |ch AS (
      |  SELECT substr(tok, i, 1) AS g,
      |         CAST(least(SUM(tf), 9999) AS HUGEINT) AS wq
      |  FROM vocab, generate_series(1, 32) AS gs(i)
      |  WHERE i <= length(tok) GROUP BY 1),
      |inv AS (SELECT g, 1 AS len, wq FROM ch
      |        UNION ALL SELECT g, 2, wq FROM bi30
      |        UNION ALL SELECT g, 3, wq FROM tri20),
      |seg AS (
      |  WITH RECURSIVE r(tok, tf, pos, prod, lens, pieces) AS (
      |    SELECT tok, tf, 0, CAST(1 AS HUGEINT),
      |           CAST([] AS INTEGER[]), CAST([] AS VARCHAR[])
      |    FROM vocab WHERE length(tok) <= 8
      |    UNION ALL
      |    SELECT r.tok, r.tf, r.pos + inv.len, r.prod * inv.wq,
      |           list_append(r.lens, inv.len), list_append(r.pieces, inv.g)
      |    FROM r JOIN inv ON inv.g = substr(r.tok, r.pos + 1, inv.len)
      |                   AND r.pos + inv.len <= length(r.tok)
      |    WHERE r.pos < length(r.tok))
      |  SELECT tok, tf, prod, lens, pieces FROM r WHERE pos = length(tok)),
      |best AS (
      |  SELECT tok, tf, pieces,
      |         ROW_NUMBER() OVER (PARTITION BY tok
      |             ORDER BY prod DESC, list_reverse(lens) DESC) AS rn
      |  FROM seg)
      |SELECT piece, CAST(length(piece) AS BIGINT) AS len,
      |       CAST(SUM(tf) AS BIGINT) AS usage
      |FROM (SELECT tf, unnest(pieces) AS piece FROM best WHERE rn = 1)
      |GROUP BY 1 ORDER BY usage DESC, piece LIMIT 30""".stripMargin

  /** Shared by x260 (data-derived dictionary) and x264 (the same training
    * frame round-tripped through KEEL with the dictionary taken from the
    * generated header): the generated header enumerates the sorted distinct
    * values — exactly this chain's ROW_NUMBER dictionary — and the KEEL
    * numeric round trip is lossless (pinned by x205), so both keys must
    * produce THIS chain's report bit-for-bit. */
  private val x260Chain: String = chain(
    table = "orders", where = "", cls =
      "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice > 150000 THEN 1 ELSE 0 END",
    fs = Seq(
      ONum("o_totalprice", "0.0", "600000.0"),
      ONom("o_orderpriority")))

  /** DuckDB cosine at 6dp between two 64-dim list columns — the q45 device. */
  private def cos6(a: String, b: String): String =
    s"""CAST(ROUND(
       |    list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
       |              FOR i IN generate_series(1,64)]) /
       |    (SQRT(list_sum([CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)
       |                    FOR i IN generate_series(1,64)])) *
       |     SQRT(list_sum([CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
       |                    FOR i IN generate_series(1,64)]))),
       |  6) AS DOUBLE)""".stripMargin

  /** x271's oracle: the greedy MMR loop UNROLLED — sel1 is the pure-
    * relevance argmax, each later step ranks the unselected pool by the
    * identical raw-double `0.7·rel − 0.3·maxsim` (literal coefficients on
    * both engines — never `1 − λ` in Scala, whose IEEE value is not the
    * 0.3 literal) and appends its per-query winner. Generated by the same
    * loop count the engine runs, so depth changes can never desync. */
  private val x271Sql: String = {
    val steps = (2 to 5).map { r =>
      s"""sel$r AS (SELECT qid, cid, $r AS pick, mmr FROM (
         |  SELECT p.qid, p.cid, 0.7 * p.rel - 0.3 * ms.maxsim AS mmr,
         |    ROW_NUMBER() OVER (PARTITION BY p.qid
         |      ORDER BY 0.7 * p.rel - 0.3 * ms.maxsim DESC, p.cid) AS rk
         |  FROM pool p
         |  JOIN (SELECT s.qid AS qid, s.a AS cid, MAX(s.sim) AS maxsim
         |        FROM sim s JOIN selall${r - 1} t
         |          ON s.qid = t.qid AND s.b = t.cid GROUP BY 1, 2) ms
         |    ON ms.qid = p.qid AND ms.cid = p.cid
         |  LEFT JOIN selall${r - 1} z ON z.qid = p.qid AND z.cid = p.cid
         |  WHERE z.cid IS NULL) WHERE rk = 1),
         |selall$r AS (SELECT * FROM selall${r - 1}
         |             UNION ALL SELECT * FROM sel$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |           WHERE vec_id < 5),
       |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |      WHERE vec_id >= 5),
       |rel AS (SELECT qid, cid, ce, ${cos6("ce", "qe")} AS rel
       |        FROM c CROSS JOIN q),
       |pool AS (SELECT qid, cid, ce, rel FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY rel DESC, cid) AS rk FROM rel) WHERE rk <= 12),
       |sim AS (SELECT p1.qid AS qid, p1.cid AS a, p2.cid AS b,
       |          ${cos6("p1.ce", "p2.ce")} AS sim
       |        FROM pool p1 JOIN pool p2
       |          ON p1.qid = p2.qid AND p1.cid <> p2.cid),
       |sel1 AS (SELECT qid, cid, 1 AS pick, mmr FROM (
       |  SELECT qid, cid, 0.7 * rel AS mmr,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY 0.7 * rel DESC, cid) AS rk FROM pool) WHERE rk = 1),
       |selall1 AS (SELECT * FROM sel1),
       |$steps
       |SELECT qid, CAST(pick AS BIGINT) AS pick, cid,
       |  CAST(ROUND(mmr * 1000000) AS BIGINT) AS mmr_micro
       |FROM selall5 ORDER BY qid, pick""".stripMargin
  }

  val round11: Map[String, String] = Map(
    "x271_mmr_rerank" -> x271Sql,
    "x262_unigram_viterbi" -> x262Sql,
    "x264_chi_keel_nominal" -> x260Chain,

    // x265: each engine-side single-pass conditional aggregate restated as
    // one CTE; the FK orphan + date-order checks share the same left join.
    "x265_quality_audit" ->
      """WITH li AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS v_null,
        |    SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS v_range,
        |    SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v_set
        |  FROM lineitem),
        |ordx AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS v_set,
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_pos
        |  FROM orders),
        |uniq AS (
        |  SELECT SUM(c) AS n, SUM(c - 1) AS v FROM (
        |    SELECT COUNT(*) AS c FROM lineitem
        |    GROUP BY l_orderkey, l_linenumber)),
        |j AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v_fk,
        |    SUM(CASE WHEN o.o_orderkey IS NOT NULL
        |             AND l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS v_date
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |comp AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS v
        |  FROM events)
        |SELECT constraint_name, CAST(n_checked AS BIGINT) AS n_checked,
        |       CAST(n_violations AS BIGINT) AS n_violations, pass FROM (
        |  SELECT 'lineitem_discount_in_0_0.1' AS constraint_name, n AS n_checked,
        |         v_range AS n_violations, v_range = 0 AS pass FROM li
        |  UNION ALL SELECT 'lineitem_orderkey_fk', n, v_fk, v_fk = 0 FROM j
        |  UNION ALL SELECT 'lineitem_pk_unique', n, v, v = 0 FROM uniq
        |  UNION ALL SELECT 'lineitem_quantity_not_null', n, v_null, v_null = 0 FROM li
        |  UNION ALL SELECT 'lineitem_returnflag_in_set', n, v_set, v_set = 0 FROM li
        |  UNION ALL SELECT 'lineitem_ship_after_order', n, v_date, v_date = 0 FROM j
        |  UNION ALL SELECT 'orders_status_in_set', n, v_set, v_set = 0 FROM ordx
        |  UNION ALL SELECT 'orders_totalprice_positive', n, v_pos, v_pos = 0 FROM ordx
        |  UNION ALL SELECT 'events_props_99pct_complete', n, v, v * 100 <= n FROM comp)
        |ORDER BY constraint_name""".stripMargin,

    // x266: the engine's window chain restated; epoch_us per the events-ts
    // contract; half-open validity with the -1 current sentinel.
    "x266_scd2_dimension" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v0 AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS ver
        |  FROM marked),
        |versions AS (
        |  SELECT user_id, ver, MIN(event_type) AS segment,
        |         MIN(epoch_us(ts)) AS valid_from_us, COUNT(*) AS n_events
        |  FROM v0 GROUP BY 1, 2)
        |SELECT user_id, CAST(ver AS BIGINT) AS version, segment,
        |  CAST(valid_from_us AS BIGINT) AS valid_from_us,
        |  CAST(COALESCE(lead(valid_from_us) OVER wv, -1) AS BIGINT) AS valid_to_us,
        |  COALESCE(lead(valid_from_us) OVER wv, -1) = -1 AS is_current,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM versions
        |WINDOW wv AS (PARTITION BY user_id ORDER BY ver)
        |ORDER BY user_id, version""".stripMargin,

    // x261: matched purchases emit unconditionally (inner semantics);
    // unmatched purchases emit iff the final watermark passed p_ts (x247's
    // cutoff verbatim); unmatched CLICKS emit iff the watermark passed
    // c_ts + 10 minutes (any qualifying purchase has p_ts ≤ c_ts + 10 min
    // and would be late) — folded under sentinel p_id = −1. The watermark
    // is the min over both watermark operators' max event time, ms-floored,
    // minus the 10-minute delay; both comparisons strict <.
    "x261_stream_full_outer_join" ->
      """WITH wm AS (
        |  SELECT ((least(
        |      (SELECT epoch_us(max(ts)) FROM events
        |       WHERE event_type = 'purchase'),
        |      (SELECT epoch_us(max(ts)) FROM events
        |       WHERE event_type = 'click')) // 1000) * 1000)
        |    - 600000000 AS cutoff_us),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_uid, ts AS c_ts
        |      FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.p_id, p.p_ts, COUNT(c.c_id) AS n
        |  FROM p LEFT JOIN c
        |    ON c.c_uid = p.user_id
        |   AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE AND c.c_ts < p.p_ts
        |  GROUP BY 1, 2),
        |pur AS (SELECT p_id, n AS n_clicks_10m FROM j, wm
        |        WHERE n > 0 OR epoch_us(p_ts) < cutoff_us),
        |unc AS (
        |  SELECT -1 AS p_id, COUNT(*) AS n_clicks_10m
        |  FROM c, wm
        |  WHERE NOT EXISTS (
        |          SELECT 1 FROM p
        |          WHERE p.user_id = c.c_uid
        |            AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE
        |            AND c.c_ts < p.p_ts)
        |    AND epoch_us(c_ts) + 600000000 < cutoff_us)
        |SELECT CAST(p_id AS BIGINT) AS p_id,
        |       CAST(n_clicks_10m AS BIGINT) AS n_clicks_10m
        |FROM (SELECT * FROM pur UNION ALL
        |      SELECT * FROM unc WHERE n_clicks_10m > 0)
        |ORDER BY p_id""".stripMargin,

    // x267: the naive formulation the engine's union-window avoids — a
    // per-label strictly-before range join (O(labels · history) here,
    // affordable at oracle scale). The last-prior-value is the argmax by
    // (ts, event_id) over non-purchase rows, matching the engine's
    // (ts, is_label DESC, event_id) frame order restricted to feature rows.
    "x267_pit_feature_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    COALESCE(CAST(round(value * 1000, 0) AS BIGINT), -1) AS val_milli
        |  FROM events),
        |lab AS (SELECT event_id AS label_id, user_id, ts FROM ev
        |        WHERE event_type = 'purchase'),
        |feats AS (
        |  SELECT l.label_id,
        |    SUM(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks,
        |    SUM(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) AS n_views
        |  FROM lab l JOIN ev e ON e.user_id = l.user_id AND e.ts < l.ts
        |  GROUP BY 1),
        |lastv AS (
        |  SELECT label_id, val_milli FROM (
        |    SELECT l.label_id, e.val_milli,
        |      ROW_NUMBER() OVER (PARTITION BY l.label_id
        |                         ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |    FROM lab l JOIN ev e
        |      ON e.user_id = l.user_id AND e.ts < l.ts
        |     AND e.event_type <> 'purchase')
        |  WHERE rn = 1)
        |SELECT l.label_id AS label_id, l.user_id,
        |  CAST(epoch_us(l.ts) AS BIGINT) AS label_ts_us,
        |  CAST(COALESCE(f.n_clicks, 0) AS BIGINT) AS n_clicks_before,
        |  CAST(COALESCE(f.n_views, 0) AS BIGINT) AS n_views_before,
        |  CAST(COALESCE(lv.val_milli, -1) AS BIGINT) AS last_val_milli
        |FROM lab l
        |LEFT JOIN feats f ON f.label_id = l.label_id
        |LEFT JOIN lastv lv ON lv.label_id = l.label_id
        |ORDER BY l.label_id""".stripMargin,

    // x268: x54's week arithmetic (epoch-µs // 604800000000, exact BIGINT
    // floor division on both engines); retention_ppm via BIGINT // BIGINT
    // (exact in DuckDB; Spark DIV is divideToIntegralValue).
    "x268_retention_matrix" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |firsts AS (SELECT user_id, MIN(week) AS cohort_week
        |           FROM act GROUP BY 1),
        |sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size
        |          FROM firsts GROUP BY 1),
        |cells AS (
        |  SELECT f.cohort_week, a.week - f.cohort_week AS weeks_since,
        |         COUNT(*) AS n_active
        |  FROM act a JOIN firsts f ON a.user_id = f.user_id
        |  GROUP BY 1, 2)
        |SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
        |  CAST(c.weeks_since AS BIGINT) AS weeks_since,
        |  CAST(c.n_active AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(c.n_active * 1000000 // s.cohort_size AS BIGINT) AS retention_ppm
        |FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
        |ORDER BY cohort_week, weeks_since""".stripMargin,

    // x269/x270 share the snapshot construction; the oracle restates the
    // engine's full-outer diff. strftime('%Y-%m') ≡ Spark date_format
    // 'yyyy-MM' (both zero-padded, session TZ pinned UTC).
    "x269_snapshot_cdc_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders),
        |a AS (SELECT * FROM o WHERE o_orderkey % 10 <> 3),
        |b AS (SELECT o_orderkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 5 = 0 THEN price_cents + 100
        |             ELSE price_cents END AS price_cents
        |      FROM o WHERE o_orderkey % 10 <> 7)
        |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  CASE WHEN a.o_orderkey IS NULL THEN 'insert'
        |       WHEN b.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS op,
        |  COALESCE(a.o_orderstatus, '') AS old_status,
        |  COALESCE(b.o_orderstatus, '') AS new_status,
        |  CAST(COALESCE(a.price_cents, -1) AS BIGINT) AS old_cents,
        |  CAST(COALESCE(b.price_cents, -1) AS BIGINT) AS new_cents
        |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
        |   OR a.o_orderstatus <> b.o_orderstatus
        |   OR a.price_cents <> b.price_cents
        |ORDER BY o_orderkey""".stripMargin,

    "x270_recompute_plan" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
        |    strftime(o_orderdate, '%Y-%m') AS month
        |  FROM orders),
        |a AS (SELECT * FROM o WHERE o_orderkey % 10 <> 3),
        |b AS (SELECT o_orderkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 5 = 0 THEN price_cents + 100
        |             ELSE price_cents END AS price_cents,
        |        month
        |      FROM o WHERE o_orderkey % 10 <> 7),
        |diff AS (
        |  SELECT COALESCE(b.month, a.month) AS month,
        |    CASE WHEN a.o_orderkey IS NULL THEN 1 ELSE 0 END AS ins,
        |    CASE WHEN b.o_orderkey IS NULL THEN 1 ELSE 0 END AS del,
        |    CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
        |          AND (a.o_orderstatus <> b.o_orderstatus
        |               OR a.price_cents <> b.price_cents)
        |         THEN 1 ELSE 0 END AS upd,
        |    CASE WHEN b.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS in_b
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        |SELECT month,
        |  CAST(SUM(ins) AS BIGINT) AS n_inserted,
        |  CAST(SUM(del) AS BIGINT) AS n_deleted,
        |  CAST(SUM(upd) AS BIGINT) AS n_updated,
        |  CAST(SUM(in_b) AS BIGINT) AS n_rows_after,
        |  CAST(CASE WHEN SUM(in_b) = 0 THEN -1
        |       ELSE (SUM(ins) + SUM(del) + SUM(upd)) * 1000000 // SUM(in_b)
        |       END AS BIGINT) AS churn_ppm,
        |  (SUM(ins) + SUM(del) + SUM(upd)) > 0 AS needs_recompute
        |FROM diff GROUP BY month ORDER BY month""".stripMargin,

    // x273: each snapshot's long-form profile as UNION ALL legs (the
    // engine's map-explode); lpad makes string min/max ≡ numeric order.
    "x273_snapshot_profile" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
        |    strftime(o_orderdate, '%Y-%m') AS month
        |  FROM orders),
        |a AS (SELECT * FROM o WHERE o_orderkey % 10 <> 3),
        |b AS (SELECT o_orderkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 5 = 0 THEN price_cents + 100
        |             ELSE price_cents END AS price_cents,
        |        month
        |      FROM o WHERE o_orderkey % 10 <> 7),
        |la AS (SELECT 'month' AS col_name, month AS val FROM a
        |       UNION ALL SELECT 'price_cents',
        |         lpad(CAST(price_cents AS VARCHAR), 12, '0') FROM a
        |       UNION ALL SELECT 'status', o_orderstatus FROM a),
        |lb AS (SELECT 'month' AS col_name, month AS val FROM b
        |       UNION ALL SELECT 'price_cents',
        |         lpad(CAST(price_cents AS VARCHAR), 12, '0') FROM b
        |       UNION ALL SELECT 'status', o_orderstatus FROM b),
        |pa AS (SELECT col_name, COUNT(*) AS n,
        |         SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS nulls,
        |         COUNT(DISTINCT val) AS ndv, MIN(val) AS mn, MAX(val) AS mx
        |       FROM la GROUP BY 1),
        |pb AS (SELECT col_name, COUNT(*) AS n,
        |         SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS nulls,
        |         COUNT(DISTINCT val) AS ndv, MIN(val) AS mn, MAX(val) AS mx
        |       FROM lb GROUP BY 1)
        |SELECT pa.col_name,
        |  CAST(pa.n AS BIGINT) AS n_a,
        |  CAST(pa.nulls * 1000000 // pa.n AS BIGINT) AS null_ppm_a,
        |  CAST(pa.ndv AS BIGINT) AS ndv_a, pa.mn AS min_a, pa.mx AS max_a,
        |  CAST(pb.n AS BIGINT) AS n_b,
        |  CAST(pb.nulls * 1000000 // pb.n AS BIGINT) AS null_ppm_b,
        |  CAST(pb.ndv AS BIGINT) AS ndv_b, pb.mn AS min_b, pb.mx AS max_b,
        |  (pa.n <> pb.n
        |   OR pa.nulls * 1000000 // pa.n <> pb.nulls * 1000000 // pb.n
        |   OR pa.ndv <> pb.ndv OR pa.mn <> pb.mn OR pa.mx <> pb.mx)
        |    AS changed
        |FROM pa JOIN pb ON pa.col_name = pb.col_name
        |ORDER BY pa.col_name""".stripMargin,

    // x274: the exact integer water-filling recursion restated; afford is
    // monotone (f(i+1)−f(i) = (n−i)(cap_{i+1}−cap_i) ≥ 0 under ascending
    // caps), so MAX over the afford rows is the level index k.
    "x274_budget_waterfill" ->
      """WITH caps AS (
        |  SELECT source, SUM(len(list_filter(string_split(lower(text), ' '),
        |                                     x -> x <> ''))) AS cap
        |  FROM documents GROUP BY source),
        |tot AS (SELECT SUM(cap) AS totcap, COUNT(*) AS nsrc FROM caps),
        |ranked AS (
        |  SELECT source, cap, totcap, nsrc, totcap * 95 // 100 AS budget,
        |    ROW_NUMBER() OVER (ORDER BY cap, source) AS i,
        |    SUM(cap) OVER (ORDER BY cap, source
        |                   ROWS UNBOUNDED PRECEDING) AS pref
        |  FROM caps, tot),
        |aff AS (SELECT *,
        |          i < nsrc AND cap * (nsrc - i) + pref <= budget AS afford
        |        FROM ranked),
        |summ AS (SELECT MAX(CASE WHEN afford THEN i ELSE 0 END) AS k,
        |                MAX(CASE WHEN afford THEN pref ELSE 0 END) AS prefk
        |         FROM aff)
        |SELECT source, CAST(cap AS BIGINT) AS cap,
        |  CAST(alloc AS BIGINT) AS allocated, capped,
        |  CAST(alloc * 1000000 // cap AS BIGINT) AS util_ppm
        |FROM (
        |  SELECT a.source, a.cap, a.i <= s.k AS capped,
        |    CASE WHEN a.i <= s.k THEN a.cap
        |         ELSE (a.budget - s.prefk) // (a.nsrc - s.k)
        |              + (CASE WHEN a.i - s.k <=
        |                        (a.budget - s.prefk) % (a.nsrc - s.k)
        |                      THEN 1 ELSE 0 END)
        |    END AS alloc
        |  FROM aff a, summ s)
        |ORDER BY source""".stripMargin,

    // x275: four subject-semi-joined aggregates UNION ALL'd — the customer
    // record carries the -1 no-timestamp sentinel.
    "x275_dsar_report" ->
      """WITH subj AS (SELECT c_custkey AS subject FROM customer
        |              WHERE c_custkey % 29 = 3)
        |SELECT subject, table_name, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(first_us AS BIGINT) AS first_us,
        |  CAST(last_us AS BIGINT) AS last_us FROM (
        |  SELECT subject, 'customer' AS table_name, 1 AS n_rows,
        |         -1 AS first_us, -1 AS last_us FROM subj
        |  UNION ALL
        |  SELECT subject, 'orders', COUNT(*),
        |         MIN(epoch_us(o_orderdate)), MAX(epoch_us(o_orderdate))
        |  FROM orders JOIN subj ON o_custkey = subject GROUP BY subject
        |  UNION ALL
        |  SELECT subject, 'lineitem', COUNT(*),
        |         MIN(epoch_us(l_shipdate)), MAX(epoch_us(l_shipdate))
        |  FROM lineitem
        |  JOIN (SELECT o_orderkey, subject FROM orders
        |        JOIN subj ON o_custkey = subject) o
        |    ON l_orderkey = o.o_orderkey GROUP BY subject
        |  UNION ALL
        |  SELECT subject, 'events', COUNT(*),
        |         MIN(epoch_us(ts)), MAX(epoch_us(ts))
        |  FROM events JOIN subj ON user_id = subject GROUP BY subject)
        |ORDER BY subject, table_name""".stripMargin,

    // x276: per-dim affine uint8 grid + half-step bound; dim is 0-based
    // (engine posexplode) so the 1-based series shifts by 1. All rounding
    // is to 0 decimals of identical doubles (bit-stable, the x271 lesson).
    "x276_int8_quant_audit" ->
      """WITH d AS (
        |  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) AS g(i)),
        |s AS (SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM d GROUP BY 1),
        |e AS (
        |  SELECT d.dim, v, lo, hi,
        |    CASE WHEN hi = lo THEN 0.0
        |         ELSE ROUND((v - lo) * 255.0 / (hi - lo)) END AS q
        |  FROM d JOIN s ON d.dim = s.dim),
        |re AS (
        |  SELECT dim, v, lo, hi, q,
        |    CASE WHEN hi = lo THEN lo ELSE lo + q * (hi - lo) / 255.0 END
        |      AS recon
        |  FROM e)
        |SELECT CAST(dim AS BIGINT) AS dim,
        |  CAST(ROUND(MAX(lo) * 1000000.0) AS BIGINT) AS lo_micro,
        |  CAST(ROUND(MAX(hi) * 1000000.0) AS BIGINT) AS hi_micro,
        |  CAST(MIN(q) AS BIGINT) AS q_min, CAST(MAX(q) AS BIGINT) AS q_max,
        |  MAX(CAST(ROUND(ABS(v - recon) * 1000000.0) AS BIGINT))
        |    AS max_err_micro,
        |  CAST(MAX(CAST(ROUND(ABS(v - recon) * 1000000.0) AS BIGINT))
        |       AS DOUBLE)
        |    <= (MAX(hi) - MAX(lo)) * 1000000.0 / 510.0 + 1.0 AS within_bound
        |FROM re GROUP BY dim ORDER BY dim""".stripMargin,

    // x277: single-sort restatement of the two-phase prefix sum; shared
    // cubed seed-11 hash; documents never split, shard = cum_before // B.
    "x277_shard_packing" -> {
      val h = graft.queries.Layout2.rdvHashSql("doc_id", "11")
      s"""WITH d AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |      AS toks,
        |    $h AS h
        |  FROM documents),
        |c AS (SELECT *, SUM(toks) OVER (ORDER BY h, doc_id
        |                                ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM d)
        |SELECT CAST((cum - toks) // 2000 AS BIGINT) AS shard,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |  CAST(MAX(toks) AS BIGINT) AS max_doc_tokens
        |FROM c GROUP BY 1 ORDER BY shard""".stripMargin
    },

    // x278: both orderings as single-sort ROW_NUMBERs; same batch/pad
    // arithmetic; partial final batch pads only occupied slots.
    "x278_padding_audit" -> {
      val h = graft.queries.Layout2.rdvHashSql("doc_id", "13")
      def leg(ord: String, name: String, b: Int) =
        s"""SELECT '$name' AS ordering, $b AS batch_size,
           |  COUNT(*) AS n_batches, SUM(sm) AS useful_tokens,
           |  SUM(n * mx - sm) AS pad_tokens
           |FROM (
           |  SELECT (rank - 1) // $b AS batch, COUNT(*) AS n,
           |         MAX(toks) AS mx, SUM(toks) AS sm
           |  FROM (SELECT toks, ROW_NUMBER() OVER (ORDER BY $ord) AS rank
           |        FROM d)
           |  GROUP BY 1)""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
         |      AS toks,
         |    $h AS h
         |  FROM documents)
         |SELECT ordering, CAST(batch_size AS BIGINT) AS batch_size,
         |  CAST(n_batches AS BIGINT) AS n_batches,
         |  CAST(useful_tokens AS BIGINT) AS useful_tokens,
         |  CAST(pad_tokens AS BIGINT) AS pad_tokens,
         |  CAST(pad_tokens * 1000000 // (pad_tokens + useful_tokens)
         |       AS BIGINT) AS pad_ppm
         |FROM (${leg("toks, doc_id", "length_sorted", 8)}
         |  UNION ALL ${leg("toks, doc_id", "length_sorted", 32)}
         |  UNION ALL ${leg("h, doc_id", "shuffled", 8)}
         |  UNION ALL ${leg("h, doc_id", "shuffled", 32)})
         |ORDER BY ordering, batch_size""".stripMargin
    },

    // x279: x256's recursive-CTE segmentation device, grouped by language;
    // the inventory stays GLOBAL (one tokenizer, many languages).
    "x279_tokenizer_fertility" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x <> '')) AS tok
        |  FROM documents),
        |gvocab AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1),
        |bi AS (
        |  SELECT substr(tok, i, 2) AS g, SUM(tf) AS w
        |  FROM gvocab, generate_series(1, 32) AS gs(i)
        |  WHERE i + 1 <= length(tok) GROUP BY 1),
        |tri AS (
        |  SELECT substr(tok, i, 3) AS g, SUM(tf) AS w
        |  FROM gvocab, generate_series(1, 32) AS gs(i)
        |  WHERE i + 2 <= length(tok) GROUP BY 1),
        |bi30 AS (SELECT g FROM bi ORDER BY w DESC, g LIMIT 30),
        |tri20 AS (SELECT g FROM tri ORDER BY w DESC, g LIMIT 20),
        |lvocab AS (SELECT lang, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |seg AS (
        |  WITH RECURSIVE r(lang, tok, tf, pos, plen) AS (
        |    SELECT lang, tok, tf, 0, CAST(NULL AS BIGINT) FROM lvocab
        |    UNION ALL
        |    SELECT r.lang, r.tok, r.tf,
        |      r.pos + CASE WHEN t.g IS NOT NULL THEN 3
        |                   WHEN b.g IS NOT NULL THEN 2 ELSE 1 END,
        |      CAST(CASE WHEN t.g IS NOT NULL THEN 3
        |                WHEN b.g IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
        |    FROM r
        |    LEFT JOIN tri20 t ON t.g = substr(r.tok, r.pos + 1, 3)
        |    LEFT JOIN bi30 b ON b.g = substr(r.tok, r.pos + 1, 2)
        |    WHERE r.pos < length(r.tok))
        |  SELECT lang, tok, tf, COUNT(plen) AS np,
        |         SUM(CASE WHEN plen = 1 THEN 1 ELSE 0 END) AS nc
        |  FROM r WHERE plen IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT lang, CAST(SUM(tf) AS BIGINT) AS n_words,
        |  CAST(SUM(tf * np) AS BIGINT) AS n_pieces,
        |  CAST(SUM(tf * nc) AS BIGINT) AS n_char_pieces,
        |  CAST(SUM(tf * np) * 1000000 // SUM(tf) AS BIGINT) AS fertility_ppm,
        |  CAST(SUM(tf * nc) * 1000000 // SUM(tf * np) AS BIGINT)
        |    AS char_fallback_ppm
        |FROM seg GROUP BY lang ORDER BY lang""".stripMargin,

    // x280: the apply restated (A minus delete/update keys, plus inserts
    // and updates' new values) vs B under the same multiset checksum; the
    // match flag is a theorem of the diff construction. The checksum sums
    // PER-ROW cubed-Knuth hashes (a = e*2654435761 mod M, h = a^3 mod M)
    // — nonlinear per row, so compensating edits can't cancel the sum.
    "x280_cdc_apply_roundtrip" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM orders),
        |a AS (SELECT * FROM o WHERE o_orderkey % 10 <> 3),
        |b AS (SELECT o_orderkey, o_orderstatus,
        |        CASE WHEN o_orderkey % 5 = 0 THEN price_cents + 100
        |             ELSE price_cents END AS price_cents
        |      FROM o WHERE o_orderkey % 10 <> 7),
        |dropk AS (
        |  SELECT a.o_orderkey AS k FROM a LEFT JOIN b USING (o_orderkey)
        |  WHERE b.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT a.o_orderkey FROM a JOIN b USING (o_orderkey)
        |  WHERE a.o_orderstatus <> b.o_orderstatus
        |     OR a.price_cents <> b.price_cents),
        |adds AS (
        |  SELECT b.o_orderkey, b.o_orderstatus, b.price_cents
        |  FROM b LEFT JOIN a USING (o_orderkey) WHERE a.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT b.o_orderkey, b.o_orderstatus, b.price_cents
        |  FROM b JOIN a USING (o_orderkey)
        |  WHERE a.o_orderstatus <> b.o_orderstatus
        |     OR a.price_cents <> b.price_cents),
        |recon AS (
        |  SELECT * FROM a WHERE o_orderkey NOT IN (SELECT k FROM dropk)
        |  UNION ALL SELECT * FROM adds),
        |hb AS (
        |  SELECT ((((o_orderkey % 100000000) * 131 + price_cents
        |            + ascii(o_orderstatus)) % 2147483647) * 2654435761)
        |           % 2147483647 AS a
        |  FROM b),
        |hr AS (
        |  SELECT ((((o_orderkey % 100000000) * 131 + price_cents
        |            + ascii(o_orderstatus)) % 2147483647) * 2654435761)
        |           % 2147483647 AS a
        |  FROM recon),
        |sb AS (
        |  SELECT COUNT(*) AS n_b,
        |    CAST(SUM(CAST(a * a % 2147483647 * a % 2147483647 AS HUGEINT))
        |         % 2147483647 AS BIGINT) AS cks_b
        |  FROM hb),
        |sr AS (
        |  SELECT COUNT(*) AS n_recon,
        |    CAST(SUM(CAST(a * a % 2147483647 * a % 2147483647 AS HUGEINT))
        |         % 2147483647 AS BIGINT) AS cks_recon
        |  FROM hr)
        |SELECT CAST(n_b AS BIGINT) AS n_b,
        |  CAST(n_recon AS BIGINT) AS n_recon, cks_b, cks_recon,
        |  (n_b = n_recon AND cks_b = cks_recon) AS match_ok
        |FROM sb, sr""".stripMargin,

    "x260_chi_nominal" -> x260Chain,

    "x263_chi_missing_values" -> chain(
      table = "lineitem", where = "", cls =
        "CASE WHEN l_quantity > 30 AND l_tax >= 0.04 THEN 1 ELSE 0 END",
      fs = Seq(
        ONum("l_quantity", "1.0", "50.0"),
        ONum("CASE WHEN l_partkey % 13 = 5 THEN NULL ELSE l_discount END",
             "0.0", "0.1"),
        ONom("CASE WHEN l_partkey % 17 = 2 THEN NULL ELSE l_returnflag END")))
  )
}
