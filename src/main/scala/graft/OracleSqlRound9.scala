package graft

/** DuckDB oracle statements for the round-9 additions (prototyped against
  * sf0.01 before the Spark side, per the §7 workflow). */
object OracleSqlRound9 {

  val round9: Map[String, String] = Map(

    // x210: exact integer k-anonymity sweep; the only double op is the
    // single risk-share division over exact BIGINTs, rounded 6 dp —
    // identical arithmetic on both engines (the x202 device).
    "x210_k_anonymity" ->
      """WITH qi AS (SELECT c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band FROM customer),
        |cls AS (SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS sz
        |        FROM qi GROUP BY 1, 2, 3),
        |hist AS (SELECT sz, COUNT(*) AS n_cls FROM cls GROUP BY 1),
        |tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
        |               COUNT(*) AS n_classes FROM cls),
        |ks AS (SELECT UNNEST([2, 5, 10, 25]) AS k)
        |SELECT CAST(k AS BIGINT) AS k,
        |       (SELECT n_classes FROM tot) AS n_classes,
        |       CAST(COALESCE(SUM(CASE WHEN sz < k THEN n_cls END), 0)
        |            AS BIGINT) AS risky_classes,
        |       CAST(COALESCE(SUM(CASE WHEN sz < k THEN sz * n_cls END), 0)
        |            AS BIGINT) AS risky_rows,
        |       CAST(ROUND(COALESCE(SUM(CASE WHEN sz < k THEN sz * n_cls END), 0)
        |                  * 1.0 / (SELECT n_rows FROM tot), 6) AS DOUBLE)
        |         AS risk_share
        |FROM ks, hist GROUP BY k ORDER BY k""".stripMargin,

    // x211: the homogeneity-attack check — distinct sensitive values per
    // QI class; classes below each l expose their members/orders.
    "x211_l_diversity" ->
      """WITH qi AS (SELECT c_custkey, c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band FROM customer),
        |sens AS (SELECT q.c_nationkey, q.c_mktsegment, q.bal_band,
        |                COUNT(DISTINCT o.o_orderpriority) AS n_sens,
        |                COUNT(DISTINCT q.c_custkey) AS n_members,
        |                COUNT(*) AS n_orders
        |         FROM qi q JOIN orders o ON o.o_custkey = q.c_custkey
        |         GROUP BY 1, 2, 3),
        |ls AS (SELECT UNNEST([2, 3, 5]) AS l)
        |SELECT CAST(l AS BIGINT) AS l,
        |       CAST(COUNT(*) AS BIGINT) AS n_classes,
        |       CAST(COUNT(*) FILTER (WHERE n_sens < l) AS BIGINT)
        |         AS weak_classes,
        |       CAST(COALESCE(SUM(n_members) FILTER (WHERE n_sens < l), 0)
        |            AS BIGINT) AS exposed_members,
        |       CAST(COALESCE(SUM(n_orders) FILTER (WHERE n_sens < l), 0)
        |            AS BIGINT) AS exposed_orders
        |FROM ls, sens GROUP BY l ORDER BY l""".stripMargin,

    // x212: x210 enforced — one suppression step (risky bands -> NULL) and
    // a re-audit of the released table; NULL bands group together on both
    // engines, so the merged-class arithmetic is identical.
    "x212_suppression_release" ->
      """WITH qi AS (SELECT c_custkey, c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band FROM customer),
        |cls AS (SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS sz
        |        FROM qi GROUP BY 1, 2, 3),
        |rel AS (SELECT q.c_custkey, q.c_nationkey, q.c_mktsegment,
        |               CASE WHEN c.sz >= 5 THEN q.bal_band END AS bal_band
        |        FROM qi q JOIN cls c USING (c_nationkey, c_mktsegment, bal_band)),
        |cls2 AS (SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS sz
        |         FROM rel GROUP BY 1, 2, 3)
        |SELECT 'raw' AS stage, COUNT(*) AS n_classes,
        |       CAST(COUNT(*) FILTER (WHERE sz < 5) AS BIGINT) AS risky_classes,
        |       CAST(COALESCE(SUM(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
        |         AS risky_rows,
        |       CAST(MIN(sz) AS BIGINT) AS min_class_size FROM cls
        |UNION ALL
        |SELECT 'suppressed', COUNT(*),
        |       CAST(COUNT(*) FILTER (WHERE sz < 5) AS BIGINT),
        |       CAST(COALESCE(SUM(sz) FILTER (WHERE sz < 5), 0) AS BIGINT),
        |       CAST(MIN(sz) AS BIGINT) FROM cls2
        |ORDER BY stage""".stripMargin,

    // x213: packing-efficiency audit of x32's pack-then-chop. DuckDB //
    // is floor division and Spark div truncates, but every operand here
    // is non-negative (zero-char docs guarded), so they agree.
    "x213_packing_efficiency" ->
      """WITH c AS (
        |  SELECT doc_id, doc_id % 8 AS shard, n_chars,
        |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(MAX(CASE WHEN n_chars > 0
        |                THEN (start_off + n_chars - 1) // 16384 END) + 1
        |       AS BIGINT) AS n_windows,
        |  CAST((SUM(n_chars) + 16383) // 16384 AS BIGINT) AS lb_windows,
        |  CAST(COALESCE(SUM(CASE WHEN n_chars > 0 AND
        |    start_off // 16384 <> (start_off + n_chars - 1) // 16384
        |    THEN 1 END), 0) AS BIGINT) AS straddled_docs,
        |  CAST(ROUND(COALESCE(SUM(CASE WHEN n_chars > 0 AND
        |    start_off // 16384 <> (start_off + n_chars - 1) // 16384
        |    THEN 1 END), 0) * 1.0 / COUNT(*), 6) AS DOUBLE) AS straddle_share,
        |  CAST(MAX(CASE WHEN n_chars > 0
        |           THEN (start_off + n_chars - 1) // 16384 END) * 16384
        |       + 16384 - SUM(n_chars) AS BIGINT) AS tail_pad
        |FROM c GROUP BY shard ORDER BY shard""".stripMargin,

    // x214: per-key histogram product is EXACTLY the equi-join size; the
    // 64-bucket coarsening is an upper bound; uniform = System-R formula.
    "x214_join_size_estimate" ->
      """WITH ho AS (SELECT o_custkey % 64 AS b, COUNT(*) AS c FROM orders GROUP BY 1),
        |hc AS (SELECT c_custkey % 64 AS b, COUNT(*) AS c FROM customer GROUP BY 1),
        |pko AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |pkc AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
        |ex AS (SELECT COUNT(*) AS exact_rows
        |       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |sides AS (SELECT (SELECT COUNT(*) FROM orders) AS n_o,
        |                 (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS ndv_o,
        |                 (SELECT COUNT(*) FROM customer) AS n_c,
        |                 (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS ndv_c)
        |SELECT (SELECT exact_rows FROM ex) AS exact_rows,
        |       (SELECT CAST(SUM(pko.c * pkc.c) AS BIGINT)
        |        FROM pko JOIN pkc USING (k)) AS perkey_est,
        |       (SELECT CAST(SUM(ho.c * hc.c) AS BIGINT)
        |        FROM ho JOIN hc USING (b)) AS bucket_est,
        |       CAST(ROUND((SELECT CAST(n_o AS DOUBLE) * n_c FROM sides) /
        |                  (SELECT GREATEST(ndv_o, ndv_c) FROM sides), 6)
        |            AS DOUBLE) AS uniform_est,
        |       CAST(ROUND((SELECT CAST(SUM(ho.c * hc.c) AS BIGINT)
        |                   FROM ho JOIN hc USING (b)) * 1.0 /
        |                  (SELECT exact_rows FROM ex), 6) AS DOUBLE)
        |         AS bucket_inflation""".stripMargin
  )
}
