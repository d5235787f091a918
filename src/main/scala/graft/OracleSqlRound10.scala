package graft

/** DuckDB oracle SQL, round-10 batch: the wide-antecedent Chi ablation.
  *
  * x215's chain is GENERATED over an arbitrary FEATURE LIST — the x206/x207
  * generator (OracleSqlRound8d) fixed n = 2 structurally (two hard-coded
  * muAt factors, two antecedent columns); hand-widening its CTEs to six
  * features would not survive the next width change, and [P1 §5.1]'s real
  * datasets are 41-attribute. Every per-feature fragment (argmax labeling,
  * the μ product in the weight term, the antecedent grouping keys, the
  * scoring product) is emitted by iterating the same feature list the
  * estimator trains on, with the grid arithmetic kept as IEEE EXPRESSIONS
  * (`lo + k*((hi-lo)/(L-1))`), never pre-evaluated literals — one ULP of
  * drift between engines flips argmax ties (the OracleSqlRound8d lesson).
  */
object OracleSqlRound10 {

  private val L = 3

  /** (select expression, lo literal, hi literal) per feature — the SAME
    * list, in the SAME order, as ModelOps.x215's Spark projection. */
  private val feats: Seq[(String, String, String)] = Seq(
    ("l_quantity", "1.0", "50.0"),
    ("l_discount", "0.0", "0.1"),
    ("l_tax", "0.0", "0.08"),
    ("CAST(l_linenumber AS DOUBLE)", "1.0", "7.0"),
    ("CAST(MONTH(l_shipdate) AS DOUBLE)", "1.0", "12.0"),
    ("CASE l_returnflag WHEN 'A' THEN 0.0 WHEN 'N' THEN 1.0 ELSE 2.0 END",
      "0.0", "2.0"))

  private val cls =
    "CASE WHEN l_quantity > 30 AND l_tax >= 0.04 THEN 1 ELSE 0 END"

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

  /** One (n_features, n_rules, accuracy, gm) block of the full Chi-CS
    * train+score chain over the first `n` features. */
  private def chainAt(n: Int): String = {
    val fs = feats.take(n)
    val xs = (1 to n).map(i => s"x$i")
    val as = (1 to n).map(i => s"a$i")
    val featSel = fs.zipWithIndex
      .map { case ((e, _, _), i) => s"$e AS x${i + 1}" }.mkString(", ")
    val labSel = fs.zipWithIndex
      .map { case ((_, lo, hi), i) => s"${argmax(s"x${i + 1}", lo, hi)} AS a${i + 1}" }
      .mkString(",\n            ")
    val wtMu = fs.zipWithIndex
      .map { case ((_, lo, hi), i) => muAt(s"t.x${i + 1}", s"a.a${i + 1}", lo, hi) }
      .mkString("\n    * ")
    val scMu = fs.zipWithIndex
      .map { case ((_, lo, hi), i) => muAt(s"g.x${i + 1}", s"r.a${i + 1}", lo, hi) }
      .mkString("\n        * ")
    val wt =
      s"""CAST(ROUND(
         |      (CASE WHEN t.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)
         |    * $wtMu,
         |    12) AS DECIMAL(38,12))""".stripMargin
    s"""SELECT * FROM (
       |WITH base AS (
       |  SELECT $featSel, $cls AS cls
       |  FROM lineitem WHERE l_orderkey % 7 = 0),
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
       |ants AS (SELECT DISTINCT ${as.mkString(", ")}, cls FROM lab),
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
       |    ROUND($scMu * r.rw, 12) AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ${xs.mkString(", ")}, actual
       |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
       |win AS (SELECT actual, m,
       |               CASE WHEN score > 0 THEN rule_cls
       |                    ELSE (SELECT cls FROM maj) END AS pred
       |        FROM best WHERE rn=1),
       |nrc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rules FROM final_rb),
       |cm AS (
       |  SELECT SUM(CASE WHEN actual=1 AND pred=1 THEN m ELSE 0 END) AS tp,
       |         SUM(CASE WHEN actual=0 AND pred=0 THEN m ELSE 0 END) AS tn,
       |         SUM(CASE WHEN actual=0 AND pred=1 THEN m ELSE 0 END) AS fp,
       |         SUM(CASE WHEN actual=1 AND pred=0 THEN m ELSE 0 END) AS fn
       |  FROM win)
       |SELECT CAST($n AS BIGINT) AS n_features, nrc.n_rules,
       |       ROUND((tp+tn)*1.0/(tp+tn+fp+fn), 6) AS accuracy,
       |       ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))), 6) AS gm
       |FROM cm CROSS JOIN nrc
       |)""".stripMargin
  }

  /** x218 oracle, GENERATED from the same per-bit coefficient list the
    * engine votes with (LlmExt2.simhashCoeffs) — hand-spelling 32 vote
    * sums would drift from the engine on the next coefficient change. */
  private def x218Sql: String = {
    import graft.queries.LlmExt2.{simhashBits, simhashCoeffs, simhashP}
    val votes = simhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"SUM(CASE WHEN ((c*$a + $b) % $simhashP) % 2 = 1 THEN 1 ELSE -1 END) AS v$i"
    }.mkString(",\n         ")
    val fp = (0 until simhashBits)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id,
       |  [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t FROM documents),
       |toks AS (
       |  SELECT doc_id, t[gs.i] AS tok
       |  FROM d, generate_series(1, 256) AS gs(i) WHERE gs.i <= len(t)),
       |coded AS (
       |  SELECT doc_id, CAST(ascii(substr(tok,1,1))*4096 + ascii(substr(tok,2,1))*64
       |                      + length(tok) AS BIGINT) AS c FROM toks),
       |votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM coded GROUP BY doc_id),
       |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes)
       |SELECT simhash, MIN(doc_id) AS rep, COUNT(*) AS n_docs
       |FROM fps GROUP BY simhash ORDER BY rep""".stripMargin
  }

  val round10: Map[String, String] = Map(
    "x215_chi_wide_ablation" ->
      (Seq(2, 4, 6).map(chainAt).mkString("\nUNION ALL\n") + "\nORDER BY n_features"),

    // x216: on the single-batch replay every user's MapState snapshot is
    // emitted exactly once, so the lifetime (user, type) map equals the
    // plain batch count.
    "x216_mapstate_type_counts" ->
      """SELECT user_id, event_type, COUNT(*) AS n_events
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    // x217 theorem form: both rewrite stages must conserve the source
    // table's row count and exact cents total (DuckDB recomputes them from
    // orders); the file-count evidence (64 before, ceil(bytes/target) < 64
    // after) is engine-computed into audit_ok, stated TRUE.
    "x217_compaction_audit" ->
      """SELECT 'compacted' AS stage, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents,
        |       TRUE AS audit_ok
        |FROM orders
        |UNION ALL
        |SELECT 'fragmented', COUNT(*),
        |       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT),
        |       TRUE
        |FROM orders
        |ORDER BY stage""".stripMargin,

    "x218_simhash_portable" -> x218Sql
  )
}
