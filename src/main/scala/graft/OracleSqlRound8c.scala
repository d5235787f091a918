package graft

/** DuckDB oracle statements for x183–x191 (prototyped against sf0.01 per
  * FIXTURES §4 before the Spark side was written). Determinism per SURVEY
  * §7.4: counts/cents are BIGINT end-to-end; every double division happens
  * once, in the same operand order as the Spark expression, then
  * ROUND(…, 6); day arithmetic is epoch-day BIGINTs (non-negative, so
  * trunc-vs-floor division agree); Benford expectations are pinned 6-dp
  * literals on both engines rather than live log10 calls.
  */
object OracleSqlRound8c {

  /** x181's edge CTE verbatim — the shared support-≥2 co-purchase graph. */
  private val EDGES =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
      |       FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
      |                          AND a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0)""".stripMargin

  val round8c: Map[String, String] = Map(
    "x183_benford_digit" ->
      """WITH c AS (SELECT CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders
        |           WHERE CAST(ROUND(o_totalprice*100,0) AS BIGINT) > 0),
        |d AS (SELECT CAST(SUBSTR(CAST(cents AS VARCHAR),1,1) AS BIGINT)
        |               AS digit,
        |             COUNT(*) AS n FROM c GROUP BY 1),
        |t AS (SELECT digit, n, SUM(n) OVER () AS total FROM d)
        |SELECT digit, CAST(n AS BIGINT) AS n_orders,
        |  ROUND(CAST(n AS DOUBLE)/total, 6) AS share,
        |  CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |       WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
        |       WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
        |       WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |       ELSE 0.045757 END AS DOUBLE) AS benford,
        |  ROUND(CAST(n AS DOUBLE)/total -
        |        CAST(CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |             WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
        |             WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
        |             WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |             ELSE 0.045757 END AS DOUBLE), 6) AS excess
        |FROM t ORDER BY digit""".stripMargin,

    "x184_dow_seasonality" ->
      """WITH g AS (SELECT o_orderpriority AS priority,
        |                  CAST(isodow(o_orderdate) AS BIGINT) AS dow,
        |                  COUNT(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |w AS (SELECT priority, dow, n,
        |             SUM(n) OVER (PARTITION BY priority) AS np,
        |             SUM(n) OVER (PARTITION BY dow) AS nd,
        |             SUM(n) OVER () AS nt FROM g)
        |SELECT priority, dow, CAST(n AS BIGINT) AS n_orders,
        |       ROUND(CAST(n*nt AS DOUBLE)/CAST(np*nd AS DOUBLE), 6)
        |         AS seasonal_idx
        |FROM w ORDER BY priority, dow""".stripMargin,

    "x185_autocorr_daily" ->
      """WITH daily AS (SELECT epoch_us(o_orderdate)//86400000000 AS d,
        |                      COUNT(*) AS x
        |               FROM orders GROUP BY 1),
        |lags AS (SELECT UNNEST([1,2,3,4,5,6,7]) AS lag_days),
        |p AS (SELECT lag_days, a.x AS xa, b.x AS xb
        |      FROM daily a CROSS JOIN lags
        |      JOIN daily b ON b.d = a.d + lags.lag_days)
        |SELECT CAST(lag_days AS BIGINT) AS lag_days, COUNT(*) AS n_pairs,
        |  ROUND(CAST(COUNT(*)*SUM(xa*xb) - SUM(xa)*SUM(xb) AS DOUBLE) /
        |        (SQRT(CAST(COUNT(*)*SUM(xa*xa) - SUM(xa)*SUM(xa) AS DOUBLE)) *
        |         SQRT(CAST(COUNT(*)*SUM(xb*xb) - SUM(xb)*SUM(xb) AS DOUBLE))),
        |        6) AS acorr
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "x186_ewma_daily" ->
      """WITH daily AS (SELECT epoch_us(o_orderdate)//86400000000 AS d,
        |                      CAST(SUM(CAST(ROUND(o_totalprice*100,0)
        |                                    AS BIGINT)) AS BIGINT) AS rc
        |               FROM orders GROUP BY 1),
        |l AS (SELECT d, rc,
        |        LAG(rc,1) OVER w AS r1, LAG(rc,2) OVER w AS r2,
        |        LAG(rc,3) OVER w AS r3, LAG(rc,4) OVER w AS r4,
        |        LAG(rc,5) OVER w AS r5, LAG(rc,6) OVER w AS r6,
        |        LAG(rc,7) OVER w AS r7
        |      FROM daily WINDOW w AS (ORDER BY d)),
        |e AS (SELECT d, rc,
        |        16384*rc + 12288*COALESCE(r1,0) + 9216*COALESCE(r2,0)
        |        + 6912*COALESCE(r3,0) + 5184*COALESCE(r4,0)
        |        + 3888*COALESCE(r5,0) + 2916*COALESCE(r6,0)
        |        + 2187*COALESCE(r7,0) AS num,
        |        16384 + CASE WHEN r1 IS NULL THEN 0 ELSE 12288 END
        |              + CASE WHEN r2 IS NULL THEN 0 ELSE 9216 END
        |              + CASE WHEN r3 IS NULL THEN 0 ELSE 6912 END
        |              + CASE WHEN r4 IS NULL THEN 0 ELSE 5184 END
        |              + CASE WHEN r5 IS NULL THEN 0 ELSE 3888 END
        |              + CASE WHEN r6 IS NULL THEN 0 ELSE 2916 END
        |              + CASE WHEN r7 IS NULL THEN 0 ELSE 2187 END AS den
        |      FROM l)
        |SELECT d AS day, rc AS revenue_cents,
        |       CAST((num * 20000 + den) // (den * 2) AS DOUBLE) / 1000000.0
        |         AS ewma
        |FROM e ORDER BY day""".stripMargin,

    "x187_interp_gapfill" ->
      """WITH o AS (SELECT r_regionkey AS rk,
        |                  epoch_us(o_orderdate)//86400000000 AS d,
        |                  CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders JOIN customer ON o_custkey = c_custkey
        |           JOIN nation ON c_nationkey = n_nationkey
        |           JOIN region ON n_regionkey = r_regionkey),
        |daily AS (SELECT rk, d, CAST(SUM(cents) AS BIGINT) AS rc
        |          FROM o GROUP BY 1, 2),
        |b AS (SELECT rk, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1),
        |s AS (SELECT rk, UNNEST(generate_series(lo, hi)) AS d FROM b),
        |j AS (SELECT s.rk, s.d, daily.rc
        |      FROM s LEFT JOIN daily ON s.rk = daily.rk AND s.d = daily.d),
        |f AS (SELECT rk, d, rc,
        |        LAST_VALUE(rc IGNORE NULLS) OVER
        |          (PARTITION BY rk ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
        |        LAST_VALUE(CASE WHEN rc IS NOT NULL THEN d END IGNORE NULLS)
        |          OVER (PARTITION BY rk ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |        FIRST_VALUE(rc IGNORE NULLS) OVER
        |          (PARTITION BY rk ORDER BY d
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
        |        FIRST_VALUE(CASE WHEN rc IS NOT NULL THEN d END IGNORE NULLS)
        |          OVER (PARTITION BY rk ORDER BY d
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |      FROM j)
        |SELECT CAST(rk AS BIGINT) AS regionkey, d AS day,
        |  CAST(CASE WHEN rc IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_interp,
        |  ROUND(CASE WHEN rc IS NOT NULL THEN CAST(rc AS DOUBLE)/100.0
        |        ELSE (CAST(pc AS DOUBLE)
        |              + CAST((nc-pc)*(d-pd) AS DOUBLE)/CAST(nd-pd AS DOUBLE))
        |             /100.0
        |        END, 6) AS revenue_interp
        |FROM f ORDER BY regionkey, day""".stripMargin,

    "x188_graph_bfs_hops" ->
      s"""WITH $EDGES,
        |nodes AS (SELECT DISTINCT u AS node FROM und),
        |h0 AS (SELECT node FROM nodes WHERE node % 97 = 0),
        |h1 AS (SELECT DISTINCT und.u AS node FROM und
        |       JOIN h0 ON und.v = h0.node
        |       WHERE und.u NOT IN (SELECT node FROM h0)),
        |h2 AS (SELECT DISTINCT und.u AS node FROM und
        |       JOIN h1 ON und.v = h1.node
        |       WHERE und.u NOT IN (SELECT node FROM h0)
        |         AND und.u NOT IN (SELECT node FROM h1)),
        |h3 AS (SELECT DISTINCT und.u AS node FROM und
        |       JOIN h2 ON und.v = h2.node
        |       WHERE und.u NOT IN (SELECT node FROM h0)
        |         AND und.u NOT IN (SELECT node FROM h1)
        |         AND und.u NOT IN (SELECT node FROM h2)),
        |hist AS (
        |  SELECT CAST(0 AS BIGINT) AS hop, COUNT(*) AS n_nodes FROM h0
        |  UNION ALL SELECT 1, COUNT(*) FROM h1
        |  UNION ALL SELECT 2, COUNT(*) FROM h2
        |  UNION ALL SELECT 3, COUNT(*) FROM h3
        |  UNION ALL SELECT -1, (SELECT COUNT(*) FROM nodes)
        |    - (SELECT COUNT(*) FROM h0) - (SELECT COUNT(*) FROM h1)
        |    - (SELECT COUNT(*) FROM h2) - (SELECT COUNT(*) FROM h3))
        |SELECT hop, CAST(n_nodes AS BIGINT) AS n_nodes
        |FROM hist ORDER BY hop""".stripMargin,

    "x189_kcore_peel" ->
      s"""WITH $EDGES,
        |k1 AS (SELECT u FROM und GROUP BY u HAVING COUNT(*) >= 2),
        |e1 AS (SELECT und.u, und.v FROM und
        |       WHERE u IN (SELECT u FROM k1) AND v IN (SELECT u FROM k1)),
        |k2 AS (SELECT u FROM e1 GROUP BY u HAVING COUNT(*) >= 2),
        |e2 AS (SELECT e1.u, e1.v FROM e1
        |       WHERE u IN (SELECT u FROM k2) AND v IN (SELECT u FROM k2)),
        |k3 AS (SELECT u FROM e2 GROUP BY u HAVING COUNT(*) >= 2),
        |e3 AS (SELECT e2.u, e2.v FROM e2
        |       WHERE u IN (SELECT u FROM k3) AND v IN (SELECT u FROM k3)),
        |r AS (SELECT CAST(1 AS BIGINT) AS round,
        |             (SELECT COUNT(DISTINCT u) FROM e1) AS n_nodes,
        |             (SELECT COUNT(*)//2 FROM e1) AS n_edges
        |      UNION ALL SELECT 2, (SELECT COUNT(DISTINCT u) FROM e2),
        |                          (SELECT COUNT(*)//2 FROM e2)
        |      UNION ALL SELECT 3, (SELECT COUNT(DISTINCT u) FROM e3),
        |                          (SELECT COUNT(*)//2 FROM e3))
        |SELECT round, CAST(n_nodes AS BIGINT) AS n_nodes,
        |       CAST(n_edges AS BIGINT) AS n_edges FROM r
        |ORDER BY round""".stripMargin,

    // x190: the boundary CTEs restate Quantiles' semantics directly —
    // boundary_d = MIN value whose ascending cumulative count reaches
    // ⌈d·n/5⌉ — and the banding is 1 + #{boundaries strictly below}.
    "x190_rfm_segments" ->
      """WITH maxd AS (SELECT MAX(epoch_us(o_orderdate)//86400000000) AS md
        |              FROM orders),
        |cust AS (SELECT o_custkey,
        |           (SELECT md FROM maxd)
        |             - MAX(epoch_us(o_orderdate)//86400000000) AS r_days,
        |           COUNT(*) AS f_n,
        |           CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT))
        |                AS BIGINT) AS m_cents
        |         FROM orders GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM cust),
        |ds AS (SELECT UNNEST([1,2,3,4]) AS d),
        |rb AS (SELECT d, MIN(v) AS b FROM
        |        (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM
        |          (SELECT r_days AS v, COUNT(*) AS c FROM cust GROUP BY 1))
        |          cumv
        |        CROSS JOIN ds CROSS JOIN nn
        |       WHERE cum >= (d*nn.n+4)//5 GROUP BY d),
        |fb AS (SELECT d, MIN(v) AS b FROM
        |        (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM
        |          (SELECT f_n AS v, COUNT(*) AS c FROM cust GROUP BY 1))
        |          cumv
        |        CROSS JOIN ds CROSS JOIN nn
        |       WHERE cum >= (d*nn.n+4)//5 GROUP BY d),
        |mb AS (SELECT d, MIN(v) AS b FROM
        |        (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM
        |          (SELECT m_cents AS v, COUNT(*) AS c FROM cust GROUP BY 1))
        |          cumv
        |        CROSS JOIN ds CROSS JOIN nn
        |       WHERE cum >= (d*nn.n+4)//5 GROUP BY d),
        |a AS (SELECT
        |        1 + (SELECT COUNT(*) FROM rb WHERE cust.r_days > rb.b) AS r_q,
        |        1 + (SELECT COUNT(*) FROM fb WHERE cust.f_n > fb.b) AS f_q,
        |        1 + (SELECT COUNT(*) FROM mb WHERE cust.m_cents > mb.b) AS m_q,
        |        m_cents
        |      FROM cust)
        |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |       CAST(m_q AS BIGINT) AS m_q, COUNT(*) AS n_customers,
        |       CAST(SUM(m_cents) AS BIGINT) AS sum_m_cents
        |FROM a GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // x195: weekday from pure epoch-day arithmetic (day 0 = Thursday →
    // ((d+3)%7)+1), and the detrended value carried as the exact integer
    // (x·c7−s7)·(420//c7) — 420 = lcm(4..7), the only centered-window
    // sizes — so the seasonal mean aggregates BIGINTs.
    "x195_seasonal_decompose" ->
      """WITH daily AS (SELECT epoch_us(o_orderdate)//86400000000 AS d,
        |                      COUNT(*) AS x
        |               FROM orders GROUP BY 1),
        |w7 AS (SELECT d, x,
        |         SUM(x) OVER (ORDER BY d
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
        |         COUNT(*) OVER (ORDER BY d
        |           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
        |       FROM daily),
        |det AS (SELECT d, x, s7, c7, ((d + 3) % 7) + 1 AS dow,
        |          (x*c7 - s7) * (420 // c7) AS det420
        |        FROM w7),
        |s AS (SELECT dow, CAST(SUM(det420) AS BIGINT) AS sd, COUNT(*) AS nd
        |      FROM det GROUP BY 1)
        |SELECT det.d AS day, CAST(x AS BIGINT) AS n_orders,
        |  ROUND(CAST(s7 AS DOUBLE)/c7, 6) AS trend,
        |  ROUND(CAST(sd AS DOUBLE)/(420*nd), 6) AS seasonal,
        |  ROUND(x - CAST(s7 AS DOUBLE)/c7 - CAST(sd AS DOUBLE)/(420*nd), 6)
        |    AS residual
        |FROM det JOIN s USING (dow) ORDER BY day""".stripMargin,

    // x196: candidate pairs = x194's e0 CTE; tf vectors from the SAME
    // full-token list `t` the fp prelude builds (LlmExt2.tokens is its
    // Spark twin — lowercased, space-split, empties dropped, uncapped).
    "x196_token_cosine_pairs" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" +
        OracleSqlMl.fpsDistinctCte + ",\n" +
        """fpk AS (SELECT f.doc_id, f.fp FROM fps f
          |        JOIN (SELECT fp FROM fps GROUP BY 1
          |              HAVING COUNT(*) <= 64) k USING (fp)),
          |e0 AS (SELECT a.doc_id AS u, b.doc_id AS v
          |       FROM fpk a JOIN fpk b ON a.fp = b.fp
          |                            AND a.doc_id < b.doc_id
          |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
          |tok AS (SELECT doc_id, x AS tok FROM d, UNNEST(t) AS u(x)),
          |cnts AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
          |norms AS (SELECT doc_id, CAST(SUM(c*c) AS BIGINT) AS nrm
          |          FROM cnts GROUP BY 1),
          |num AS (SELECT e0.u, e0.v, CAST(SUM(ca.c * cb.c) AS BIGINT) AS dot
          |        FROM e0 JOIN cnts ca ON ca.doc_id = e0.u
          |                JOIN cnts cb ON cb.doc_id = e0.v
          |                            AND cb.tok = ca.tok
          |        GROUP BY 1, 2)
          |SELECT num.u AS doc_a, num.v AS doc_b, num.dot AS dot,
          |  ROUND(CAST(num.dot AS DOUBLE) /
          |        (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))),
          |        6) AS cosine
          |FROM num JOIN norms na ON na.doc_id = num.u
          |         JOIN norms nb ON nb.doc_id = num.v
          |ORDER BY doc_a, doc_b""".stripMargin),

    "x192_reorder_intervals" ->
      """WITH o AS (SELECT o_custkey, epoch_us(o_orderdate)//86400000000 AS d,
        |                  o_orderkey FROM orders),
        |g AS (SELECT o_custkey,
        |             d - LAG(d) OVER (PARTITION BY o_custkey
        |                              ORDER BY d, o_orderkey) AS gap
        |      FROM o),
        |gaps AS (SELECT gap AS v FROM g WHERE gap IS NOT NULL),
        |n AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s FROM gaps),
        |cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM
        |         (SELECT v, COUNT(*) AS c FROM gaps GROUP BY 1)),
        |p50 AS (SELECT MIN(v) AS b FROM cum, n WHERE cum >= (5*n.n+9)//10),
        |p90 AS (SELECT MIN(v) AS b FROM cum, n WHERE cum >= (9*n.n+9)//10)
        |SELECT n.n AS n_gaps, CAST(p50.b AS BIGINT) AS p50_gap_days,
        |       CAST(p90.b AS BIGINT) AS p90_gap_days,
        |       ROUND(CAST(n.s AS DOUBLE)/n.n, 6) AS mean_gap_days
        |FROM n, p50, p90""".stripMargin,

    "x193_skipping_compare" ->
      s"""WITH m AS (SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs,
        |                  MAX(l_orderkey) AS maxo FROM lineitem),
        |q AS (
        |  SELECT CAST((l_partkey * 256) // (maxp + 1) AS BIGINT) AS px,
        |         CAST((l_suppkey * 256) // (maxs + 1) AS BIGINT) AS py,
        |         CAST((l_orderkey * 256) // (maxo + 1) AS BIGINT) AS ta
        |  FROM lineitem CROSS JOIN m),
        |z AS (SELECT px, py, ta,
        |        (${graft.engine.ZOrder.zExpr("px", "py", "//")}) // 256 AS tz
        |      FROM q),
        |tiles AS (
        |  SELECT 'zorder' AS layout, tz AS tile, COUNT(*) AS n,
        |         MIN(px) AS minpx, MAX(px) AS maxpx,
        |         MIN(py) AS minpy, MAX(py) AS maxpy
        |  FROM z GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'px_sort', px, COUNT(*), MIN(px), MAX(px), MIN(py), MAX(py)
        |  FROM z GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'arrival', ta, COUNT(*), MIN(px), MAX(px), MIN(py), MAX(py)
        |  FROM z GROUP BY 1, 2),
        |flags AS (
        |  SELECT layout, 'box' AS query, n,
        |         CASE WHEN maxpx < 64 OR minpx >= 96
        |                   OR maxpy < 64 OR minpy >= 96
        |              THEN 1 ELSE 0 END AS skip
        |  FROM tiles
        |  UNION ALL
        |  SELECT layout, 'py_only', n,
        |         CASE WHEN maxpy < 64 OR minpy >= 96 THEN 1 ELSE 0 END
        |  FROM tiles)
        |SELECT layout, query, COUNT(*) AS n_tiles,
        |       CAST(SUM(skip) AS BIGINT) AS n_skip_tiles,
        |       CAST(SUM(CASE WHEN skip = 1 THEN n ELSE 0 END) AS BIGINT)
        |         AS rows_skipped,
        |       CAST(SUM(n) AS BIGINT) AS rows_total,
        |       CAST(SUM(CASE WHEN skip = 1 THEN n ELSE 0 END) * 1000000
        |            // SUM(n) AS BIGINT) AS skip_ppm
        |FROM flags GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // x194: fp CTEs shared with x120 (OracleSqlMl.fpCodedCtes +
    // fpsDistinctCte); hot-fp cap (df <= 64, Graphs.HotFpCap) mirrored
    // before the pair join; 3 unrolled min-label rounds, each the min
    // over self ∪ neighbors.
    "x194_neardup_clusters" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" +
        OracleSqlMl.fpsDistinctCte + ",\n" +
        """fpk AS (SELECT f.doc_id, f.fp FROM fps f
          |        JOIN (SELECT fp FROM fps GROUP BY 1
          |              HAVING COUNT(*) <= 64) k USING (fp)),
          |e0 AS (SELECT a.doc_id AS u, b.doc_id AS v
          |       FROM fpk a JOIN fpk b ON a.fp = b.fp
          |                            AND a.doc_id < b.doc_id
          |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
          |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
          |l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
          |l1 AS (SELECT u AS node, MIN(lbl) AS label FROM (
          |         SELECT und.u, l0.label AS lbl FROM und
          |         JOIN l0 ON und.v = l0.node
          |         UNION ALL SELECT node, label FROM l0) GROUP BY 1),
          |l2 AS (SELECT u AS node, MIN(lbl) AS label FROM (
          |         SELECT und.u, l1.label AS lbl FROM und
          |         JOIN l1 ON und.v = l1.node
          |         UNION ALL SELECT node, label FROM l1) GROUP BY 1),
          |l3 AS (SELECT u AS node, MIN(lbl) AS label FROM (
          |         SELECT und.u, l2.label AS lbl FROM und
          |         JOIN l2 ON und.v = l2.node
          |         UNION ALL SELECT node, label FROM l2) GROUP BY 1)
          |SELECT label AS cluster_id, COUNT(*) AS n_docs
          |FROM l3 GROUP BY 1 ORDER BY n_docs DESC, cluster_id""".stripMargin),

    // x197: the oracle states the SEMANTICS (years surviving the dim
    // filter), not the mechanism — partition layout and runtime pruning
    // change where bytes are read, never what the rows are.
    "x197_dynamic_partition_pruning" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM orders
        |WHERE EXTRACT(year FROM o_orderdate) IN
        |      (SELECT DISTINCT EXTRACT(year FROM o_orderdate) FROM orders
        |       WHERE o_orderdate < TIMESTAMP '1996-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x209: the oracle states the post-backfill STATE — base data with the
    // 1995-only correction applied (the same IEEE (p+0.01)*100 arithmetic
    // the engine stores). If dynamic partition overwrite regressed to
    // STATIC, every non-1995 year would vanish from the engine's table and
    // the rollup would collapse to one row.
    "x209_partition_backfill" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(ROUND(
        |         CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
        |              THEN (o_totalprice + 0.01) * 100
        |              ELSE o_totalprice * 100 END, 0) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "x191_auc_rank" ->
      """WITH p AS (SELECT CAST(p_size AS BIGINT) AS s,
        |                  CASE WHEN CAST(ROUND(p_retailprice*100,0) AS BIGINT)
        |                            >= 91000
        |                       THEN 1 ELSE 0 END AS pos
        |           FROM part),
        |g AS (SELECT s, CAST(SUM(pos) AS BIGINT) AS np,
        |             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nn_neg
        |      FROM p GROUP BY 1),
        |c AS (SELECT s, np, nn_neg,
        |             COALESCE(SUM(nn_neg) OVER (ORDER BY s
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |               AS cnl
        |      FROM g)
        |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |       CAST(SUM(nn_neg) AS BIGINT) AS n_neg,
        |       CAST(SUM(np*(2*cnl+nn_neg)) AS BIGINT) AS auc_num,
        |       CAST(2*SUM(np)*SUM(nn_neg) AS BIGINT) AS auc_den,
        |       ROUND(CAST(SUM(np*(2*cnl+nn_neg)) AS DOUBLE)
        |             / CAST(2*SUM(np)*SUM(nn_neg) AS DOUBLE), 6) AS auc
        |FROM c""".stripMargin,

    // x198: the full per-model restatement of OracleSqlMl's q41+q42 chain
    // with `model` threaded through every CTE — fold hash must be the exact
    // integer device the engine uses (reduce mod 1e8, Fibonacci multiply,
    // mod PRIME 1000000007, mod 5; the prime step breaks the linearity a
    // power-of-ten modulus would leave, since 5 | 10^j).
    "x198_chi_crossval" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity AS x1, l_discount AS x2,
        |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls,
        |         ((((l_orderkey % 100000000) * 8 + l_linenumber)
        |           * 2654435761) % 1000000007) % 5 AS fold
        |  FROM lineitem),
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
        |models AS (SELECT CAST(range AS INTEGER) AS model FROM range(5)),
        |train AS (SELECT m.model, l.x1, l.x2, l.a1, l.a2, l.cls
        |          FROM models m JOIN lab l ON l.fold <> m.model),
        |costs AS (
        |  SELECT model, MAX(CASE WHEN cls=1 THEN c END) AS c1,
        |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
        |    SELECT model, cls,
        |           CASE WHEN n = MIN(n) OVER (PARTITION BY model)
        |                THEN MAX(n) OVER (PARTITION BY model) * 1.0 / n
        |                ELSE 1.0 END AS c
        |    FROM (SELECT model, cls, COUNT(*) AS n FROM train GROUP BY 1,2))
        |  GROUP BY model),
        |ants AS (SELECT DISTINCT model, a1, a2, cls FROM train),
        |m AS (
        |  SELECT a.model, a.a1, a.a2, a.cls AS rule_cls,
        |    SUM(CASE WHEN l.cls = a.cls THEN CAST(ROUND(
        |      (CASE WHEN l.cls=1 THEN c.c1 ELSE c.c0 END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12)) END) AS w_match,
        |    SUM(CAST(ROUND(
        |      (CASE WHEN l.cls=1 THEN c.c1 ELSE c.c0 END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12))) AS w_all
        |  FROM ants a
        |  JOIN train l ON l.model = a.model
        |  JOIN costs c ON c.model = a.model
        |  GROUP BY 1,2,3,4),
        |rw AS (SELECT model, a1, a2, rule_cls,
        |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
        |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
        |       FROM m WHERE w_all > 0),
        |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY model, a1, a2
        |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
        |final_rb AS (SELECT model, a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
        |gex AS (SELECT CAST(fold AS INTEGER) AS model, x1, x2, cls, COUNT(*) AS m
        |        FROM lab GROUP BY 1,2,3,4),
        |scored AS (
        |  SELECT g.model, g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
        |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
        |        * r.rw, 12) AS score
        |  FROM gex g JOIN final_rb r ON r.model = g.model),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY model, x1, x2, actual
        |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
        |win AS (SELECT model, actual, rule_cls, m FROM best WHERE rn=1),
        |cm AS (
        |  SELECT model,
        |    CAST(SUM(CASE WHEN actual=1 AND rule_cls=1 THEN m ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN actual=0 AND rule_cls=0 THEN m ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(SUM(CASE WHEN actual=0 AND rule_cls=1 THEN m ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN actual=1 AND rule_cls=0 THEN m ELSE 0 END) AS BIGINT) AS fn
        |  FROM win GROUP BY model)
        |SELECT CAST(model AS BIGINT) AS fold,
        |       tp+tn+fp+fn AS n_test, tp, tn, fp, fn,
        |       ROUND((tp+tn)*1.0/(tp+tn+fp+fn), 6) AS accuracy,
        |       ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))), 6) AS gm
        |FROM cm ORDER BY fold""".stripMargin,

    // x200: x198's per-model restatement with NESTED training sets — tier t
    // trains on folds 1..t, every tier tests on fold 0.
    "x200_chi_learning_curve" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity AS x1, l_discount AS x2,
        |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls,
        |         ((((l_orderkey % 100000000) * 8 + l_linenumber)
        |           * 2654435761) % 1000000007) % 5 AS fold
        |  FROM lineitem),
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
        |models AS (SELECT CAST(range AS INTEGER) AS model FROM range(1,5)),
        |train AS (SELECT m.model, l.x1, l.x2, l.a1, l.a2, l.cls
        |          FROM models m JOIN lab l ON l.fold >= 1 AND l.fold <= m.model),
        |costs AS (
        |  SELECT model, MAX(CASE WHEN cls=1 THEN c END) AS c1,
        |         MAX(CASE WHEN cls=0 THEN c END) AS c0,
        |         CAST(SUM(n) AS BIGINT) AS n_train FROM (
        |    SELECT model, cls, n,
        |           CASE WHEN n = MIN(n) OVER (PARTITION BY model)
        |                THEN MAX(n) OVER (PARTITION BY model) * 1.0 / n
        |                ELSE 1.0 END AS c
        |    FROM (SELECT model, cls, COUNT(*) AS n FROM train GROUP BY 1,2))
        |  GROUP BY model),
        |ants AS (SELECT DISTINCT model, a1, a2, cls FROM train),
        |m AS (
        |  SELECT a.model, a.a1, a.a2, a.cls AS rule_cls,
        |    SUM(CASE WHEN l.cls = a.cls THEN CAST(ROUND(
        |      (CASE WHEN l.cls=1 THEN c.c1 ELSE c.c0 END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12)) END) AS w_match,
        |    SUM(CAST(ROUND(
        |      (CASE WHEN l.cls=1 THEN c.c1 ELSE c.c0 END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12))) AS w_all
        |  FROM ants a
        |  JOIN train l ON l.model = a.model
        |  JOIN costs c ON c.model = a.model
        |  GROUP BY 1,2,3,4),
        |rw AS (SELECT model, a1, a2, rule_cls,
        |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
        |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
        |       FROM m WHERE w_all > 0),
        |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY model, a1, a2
        |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
        |final_rb AS (SELECT model, a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
        |gex AS (SELECT m.model, l.x1, l.x2, l.cls, COUNT(*) AS m
        |        FROM lab l CROSS JOIN models m WHERE l.fold = 0
        |        GROUP BY 1,2,3,4),
        |scored AS (
        |  SELECT g.model, g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
        |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
        |        * r.rw, 12) AS score
        |  FROM gex g JOIN final_rb r ON r.model = g.model),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY model, x1, x2, actual
        |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
        |win AS (SELECT model, actual, rule_cls, m FROM best WHERE rn=1),
        |cm AS (
        |  SELECT model,
        |    CAST(SUM(CASE WHEN actual=1 AND rule_cls=1 THEN m ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN actual=0 AND rule_cls=0 THEN m ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(SUM(CASE WHEN actual=0 AND rule_cls=1 THEN m ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN actual=1 AND rule_cls=0 THEN m ELSE 0 END) AS BIGINT) AS fn
        |  FROM win GROUP BY model)
        |SELECT CAST(cm.model AS BIGINT) AS tier, c.n_train,
        |       tp+tn+fp+fn AS n_test, tp, tn, fp, fn,
        |       ROUND((tp+tn)*1.0/(tp+tn+fp+fn), 6) AS accuracy,
        |       ROUND(SQRT((tp*1.0/(tp+fn)) * (tn*1.0/(tn+fp))), 6) AS gm
        |FROM cm JOIN costs c ON c.model = cm.model ORDER BY tier""".stripMargin,

    // x199: the CS and base chains threaded through ONE set of CTEs with a
    // variant flag v (v=1 applies the cost vector, v=0 forces 1.0), then the
    // two per-vector verdicts pair on the classification grain (x1,x2,cls).
    "x199_mcnemar_cs_vs_base" ->
      """WITH base0 AS (
        |  SELECT l_quantity AS x1, l_discount AS x2,
        |         CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS cls
        |  FROM lineitem),
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
        |  FROM base0),
        |costs AS (
        |  SELECT MAX(CASE WHEN cls=1 THEN c END) AS c1,
        |         MAX(CASE WHEN cls=0 THEN c END) AS c0 FROM (
        |    SELECT cls, CASE WHEN n = MIN(n) OVER () THEN MAX(n) OVER () * 1.0 / n
        |                     ELSE 1.0 END AS c
        |    FROM (SELECT cls, COUNT(*) AS n FROM lab GROUP BY cls))),
        |variants AS (SELECT 1 AS v UNION ALL SELECT 0),
        |ants AS (SELECT DISTINCT v, a1, a2, cls FROM lab CROSS JOIN variants),
        |m AS (
        |  SELECT a.v, a.a1, a.a2, a.cls AS rule_cls,
        |    SUM(CASE WHEN l.cls = a.cls THEN CAST(ROUND(
        |      (CASE WHEN a.v=0 THEN 1.0
        |            WHEN l.cls=1 THEN (SELECT c1 FROM costs)
        |            ELSE (SELECT c0 FROM costs) END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12)) END) AS w_match,
        |    SUM(CAST(ROUND(
        |      (CASE WHEN a.v=0 THEN 1.0
        |            WHEN l.cls=1 THEN (SELECT c1 FROM costs)
        |            ELSE (SELECT c0 FROM costs) END)
        |    * GREATEST(0,1-ABS(l.x1 - (CASE a.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |    * GREATEST(0,1-ABS(l.x2 - (CASE a.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05),
        |    12) AS DECIMAL(38,12))) AS w_all
        |  FROM ants a CROSS JOIN lab l GROUP BY 1,2,3,4),
        |rw AS (SELECT v, a1, a2, rule_cls,
        |              CAST(ROUND(2*w_match - w_all, 6) AS DOUBLE)
        |                / CAST(ROUND(w_all, 6) AS DOUBLE) AS rw
        |       FROM m WHERE w_all > 0),
        |rb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY v, a1, a2
        |                                    ORDER BY rw DESC, rule_cls) AS rn FROM rw),
        |final_rb AS (SELECT v, a1, a2, rule_cls, rw FROM rb WHERE rn=1 AND rw > 0),
        |gex AS (SELECT x1, x2, cls, COUNT(*) AS m FROM lab GROUP BY 1,2,3),
        |scored AS (
        |  SELECT r.v, g.x1, g.x2, g.cls AS actual, g.m, r.rule_cls,
        |    ROUND(GREATEST(0,1-ABS(g.x1 - (CASE r.a1 WHEN 0 THEN 1.0 WHEN 1 THEN 25.5 ELSE 50.0 END))/24.5)
        |        * GREATEST(0,1-ABS(g.x2 - (CASE r.a2 WHEN 0 THEN 0.0 WHEN 1 THEN 0.05 ELSE 0.1 END))/0.05)
        |        * r.rw, 12) AS score
        |  FROM gex g CROSS JOIN final_rb r),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY v, x1, x2, actual
        |                                      ORDER BY score DESC, rule_cls) AS rn FROM scored),
        |win AS (SELECT v, x1, x2, actual, rule_cls, m FROM best WHERE rn=1),
        |pair AS (
        |  SELECT a.actual, a.m,
        |         CASE WHEN a.rule_cls = a.actual THEN 1 ELSE 0 END AS cs_ok,
        |         CASE WHEN b.rule_cls = b.actual THEN 1 ELSE 0 END AS base_ok
        |  FROM win a JOIN win b
        |    ON a.v=1 AND b.v=0 AND a.x1=b.x1 AND a.x2=b.x2 AND a.actual=b.actual),
        |cm AS (
        |  SELECT CAST(SUM(CASE WHEN cs_ok=1 AND base_ok=1 THEN m ELSE 0 END) AS BIGINT) AS n11,
        |         CAST(SUM(CASE WHEN cs_ok=1 AND base_ok=0 THEN m ELSE 0 END) AS BIGINT) AS n10,
        |         CAST(SUM(CASE WHEN cs_ok=0 AND base_ok=1 THEN m ELSE 0 END) AS BIGINT) AS n01,
        |         CAST(SUM(CASE WHEN cs_ok=0 AND base_ok=0 THEN m ELSE 0 END) AS BIGINT) AS n00
        |  FROM pair)
        |SELECT n11, n10, n01, n00,
        |       CASE WHEN n10+n01 > 0 THEN
        |         ROUND((ABS(n10-n01)-1)*(ABS(n10-n01)-1)*1.0/(n10+n01), 6)
        |       END AS chi2_stat,
        |       CASE WHEN n10+n01 > 0 THEN
        |         (ABS(n10-n01)-1)*(ABS(n10-n01)-1)*1.0/(n10+n01) > 3.841
        |       END AS significant_95
        |FROM cm""".stripMargin
  )
}
