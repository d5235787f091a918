package graft

/** DuckDB oracle SQL, round-8 batch d: the label-granularity ablation.
  *
  * The chain is GENERATED per L instead of hand-spelled (the L=3 chain in
  * OracleSqlMl is the hand-written instance): centers and half-widths are
  * emitted as the SAME IEEE arithmetic the engine computes
  * (`lo + k*((hi-lo)/(L-1))`), never as pre-evaluated decimal literals —
  * a literal like `0.075` parses to a double that need not equal the
  * engine's `3*(0.1/4)`, and one ULP there flips argmax ties. Both engines
  * fold the expression with binary64 ops, so the grids match bit-for-bit.
  */
object OracleSqlRound8d {

  /** μ_k(x) under the L-label partition of [lo, hi] — operation-for-operation
    * the engine's `GREATEST(0, 1 − |x−c|/w)`. */
  private def mu(x: String, lo: String, hi: String, l: Int, k: Int): String = {
    val w = s"(($hi - $lo) / ${l - 1})"
    s"GREATEST(0, 1 - ABS($x - ($lo + $k * $w)) / $w)"
  }

  /** argmax label, ties → lowest index: label k wins iff μ_k ≥ μ_j ∀ j > k
    * (ChiCore.argmaxLabel's ≥-chain, generated for any L). */
  private def argmax(x: String, lo: String, hi: String, l: Int): String = {
    val cases = (0 until l - 1).map { k =>
      val conds = (k + 1 until l)
        .map(j => s"${mu(x, lo, hi, l, k)} >= ${mu(x, lo, hi, l, j)}")
        .mkString(" AND ")
      s"WHEN $conds THEN $k"
    }.mkString(" ")
    s"CASE $cases ELSE ${l - 1} END"
  }

  /** μ of x against a DYNAMIC label column (rule antecedent). */
  private def muAt(x: String, label: String, lo: String, hi: String, l: Int): String = {
    val w = s"(($hi - $lo) / ${l - 1})"
    val c = (0 until l - 1).map(k => s"WHEN $k THEN ($lo + $k * $w)").mkString(" ")
    s"GREATEST(0, 1 - ABS($x - (CASE $label $c ELSE ($lo + ${l - 1} * $w) END)) / $w)"
  }

  /** One (num_labels, n_rules, accuracy, gm) block of the full Chi-CS chain
    * at granularity L — q41+q42 generalized, plus the estimator's
    * no-match-⇒-majority-class policy (irrelevant at L=3 where every example
    * fires a rule, load-bearing at finer grids where a cell's rule can be
    * conflict-dropped). */
  private def chainAt(l: Int): String = {
    val (lo1, hi1, lo2, hi2) = ("1.0", "50.0", "0.0", "0.1")
    val wt =
      s"""CAST(ROUND(
         |      (CASE WHEN t.cls=1 THEN (SELECT c1 FROM costs) ELSE (SELECT c0 FROM costs) END)
         |    * ${muAt("t.x1", "a.a1", lo1, hi1, l)}
         |    * ${muAt("t.x2", "a.a2", lo2, hi2, l)},
         |    12) AS DECIMAL(38,12))""".stripMargin
    s"""SELECT * FROM (
       |WITH base AS (
       |  SELECT l_quantity AS x1, l_discount AS x2,
       |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls
       |  FROM lineitem),
       |lab AS (
       |  SELECT *, ${argmax("x1", lo1, hi1, l)} AS a1,
       |            ${argmax("x2", lo2, hi2, l)} AS a2
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
       |  FROM ants a CROSS JOIN lab t GROUP BY 1,2,3),
       |rw AS (SELECT a1, a2, rule_cls,
       |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
       |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
       |       FROM m WHERE w_all > 0),
       |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
       |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
       |final_rb AS (SELECT a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
       |gex AS (SELECT x1, x2, cls, COUNT(*) AS m FROM lab GROUP BY 1,2,3),
       |scored AS (
       |  SELECT g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
       |    ROUND(${muAt("g.x1", "r.a1", lo1, hi1, l)}
       |        * ${muAt("g.x2", "r.a2", lo2, hi2, l)} * r.rw, 12) AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
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
       |SELECT CAST($l AS BIGINT) AS num_labels, nrc.n_rules,
       |       ROUND((tp+tn)*1.0/(tp+tn+fp+fn), 6) AS accuracy,
       |       ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))), 6) AS gm
       |FROM cm CROSS JOIN nrc
       |)""".stripMargin
  }

  /** Fully general chain: any class expression (any |C|), any L, and lo/hi
    * given as SQL EXPRESSIONS — a literal for declared ranges or a scalar
    * subquery for the R11 auto-descriptor path (both engines then compute
    * the identical min/max before the identical grid arithmetic). The cost
    * vector generalizes to per-class rows joined into the weight term (the
    * binary chain's c1/c0 scalar pair can't express ≥3 classes). Emits the
    * (actual, predicted, n) confusion — the estimator's majority fallback
    * included. */
  private def confusionChain(clsExpr: String, l: Int,
                             lo1: String, hi1: String,
                             lo2: String, hi2: String): String = {
    val wt =
      s"""CAST(ROUND(
         |      c.cost
         |    * ${muAt("t.x1", "a.a1", lo1, hi1, l)}
         |    * ${muAt("t.x2", "a.a2", lo2, hi2, l)},
         |    12) AS DECIMAL(38,12))""".stripMargin
    s"""WITH base AS (
       |  SELECT l_quantity AS x1, l_discount AS x2, $clsExpr AS cls
       |  FROM lineitem),
       |lab AS (
       |  SELECT *, ${argmax("x1", lo1, hi1, l)} AS a1,
       |            ${argmax("x2", lo2, hi2, l)} AS a2
       |  FROM base),
       |cnts AS (SELECT cls, COUNT(*) AS n FROM lab GROUP BY cls),
       |costs AS (
       |  SELECT cls, CASE WHEN n = (SELECT MIN(n) FROM cnts)
       |                    AND (SELECT MIN(n) FROM cnts) <> (SELECT MAX(n) FROM cnts)
       |                   THEN (SELECT MAX(n) FROM cnts) * 1.0 / n
       |                   ELSE 1.0 END AS cost
       |  FROM cnts),
       |maj AS (SELECT cls FROM cnts ORDER BY n DESC, cls LIMIT 1),
       |ants AS (SELECT DISTINCT a1, a2, cls FROM lab),
       |m AS (
       |  SELECT a.a1, a.a2, a.cls AS rule_cls,
       |    COALESCE(SUM(CASE WHEN t.cls = a.cls THEN $wt END), 0) AS w_match,
       |    SUM($wt) AS w_all
       |  FROM ants a CROSS JOIN lab t JOIN costs c ON c.cls = t.cls
       |  GROUP BY 1,2,3),
       |rw AS (SELECT a1, a2, rule_cls,
       |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
       |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
       |       FROM m WHERE w_all > 0),
       |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a1, a2
       |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
       |final_rb AS (SELECT a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
       |gex AS (SELECT x1, x2, cls, COUNT(*) AS m FROM lab GROUP BY 1,2,3),
       |scored AS (
       |  SELECT g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
       |    ROUND(${muAt("g.x1", "r.a1", lo1, hi1, l)}
       |        * ${muAt("g.x2", "r.a2", lo2, hi2, l)} * r.rw, 12) AS score
       |  FROM gex g CROSS JOIN final_rb r),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x1, x2, actual
       |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
       |win AS (SELECT actual, m,
       |               CASE WHEN score > 0 THEN rule_cls
       |                    ELSE (SELECT cls FROM maj) END AS pred
       |        FROM best WHERE rn=1)
       |SELECT CAST(actual AS BIGINT) AS actual, CAST(pred AS BIGINT) AS predicted,
       |       CAST(SUM(m) AS BIGINT) AS n
       |FROM win GROUP BY actual, pred ORDER BY actual, predicted""".stripMargin
  }

  val round8d: Map[String, String] = Map(
    "x206_label_granularity" ->
      (chainAt(3) + "\nUNION ALL\n" + chainAt(5) + "\nORDER BY num_labels"),

    // x207: three classes (quantity bands; top band the up-weighted
    // minority); declared ranges as literal expressions.
    "x207_chi_multiclass" ->
      confusionChain(
        "CASE WHEN l_quantity > 42 THEN 2 WHEN l_quantity > 18 THEN 1 ELSE 0 END",
        3, "1.0", "50.0", "0.0", "0.1"),

    // x208: the R11 AUTO-DESCRIPTOR path — lo/hi are scalar subqueries over
    // the data itself; both engines compute identical min/max doubles, then
    // the identical grid arithmetic on top of them.
    "x208_chi_auto_ranges" ->
      confusionChain(
        "CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END",
        3,
        "(SELECT MIN(l_quantity) FROM lineitem)",
        "(SELECT MAX(l_quantity) FROM lineitem)",
        "(SELECT MIN(l_discount) FROM lineitem)",
        "(SELECT MAX(l_discount) FROM lineitem)")
  )
}
