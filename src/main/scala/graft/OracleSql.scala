package graft

/** DuckDB oracle SQL for every declared query (SparkEntry.oracleSql).
  *
  * Bare table names — the driver registers views over the same sf parquet.
  * Each statement mirrors its Spark twin under the determinism protocol of
  * SURVEY.md §7.4 (total ORDER BY, exact decimal sums, BIGINT counts,
  * epoch-µs timestamps, explicit tiebreaks). Prototypes validated on
  * DuckDB 1.0.0 (FIXTURES.md §5); q23/q36 are restated on exact epoch-µs
  * arithmetic because `epoch(ts)` is fractional for this dataset.
  */
object OracleSql {
  val relational: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,

    "q03_filter_complex" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH') OR o_totalprice BETWEEN 50000 AND 100000)
        |  AND NOT (o_orderstatus LIKE 'P%')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q04_join_inner" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q05_join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q06_join_left_histogram" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey)
        |SELECT n_orders, COUNT(*) AS n_customers FROM per_cust
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,

    "q07_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q08_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q09_join_range_pairs" ->
      """SELECT a.user_id, COUNT(*) AS pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "q10_join_multiway_tpch_q5" ->
      """SELECT n_name,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q11_join_asof_prior" ->
      """SELECT p.event_id, MAX(epoch_us(c.ts)) AS prior_click_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id AND c.ts < p.ts AND c.event_type = 'click'
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,

    "q12_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc,
        |       CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q13_agg_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS dcust, COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q14_agg_rollup" ->
      """SELECT COALESCE(r_name,'ALL') AS region, COALESCE(n_name,'ALL') AS nation,
        |       COUNT(c_custkey) AS n_cust,
        |       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,

    "q15_agg_cube" ->
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |       COUNT(*) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,

    "q16_agg_grouping_sets" ->
      """SELECT COALESCE(c_mktsegment,'ALL') AS seg,
        |       CAST(COALESCE(c_nationkey,-1) AS BIGINT) AS nat, COUNT(*) AS cnt
        |FROM customer GROUP BY GROUPING SETS ((c_mktsegment),(c_nationkey),())
        |ORDER BY seg, nat""".stripMargin,

    "q17_agg_having" ->
      """SELECT p_type, COUNT(*) AS cnt FROM part
        |GROUP BY p_type HAVING COUNT(*) >= 20 ORDER BY p_type""".stripMargin,

    "q18_agg_stats" ->
      """SELECT c_mktsegment,
        |       ROUND(CAST(MIN(c_acctbal) AS DOUBLE),4) AS mn,
        |       ROUND(CAST(MAX(c_acctbal) AS DOUBLE),4) AS mx,
        |       ROUND(CAST(AVG(c_acctbal) AS DOUBLE),4) AS av,
        |       ROUND(CAST(STDDEV_SAMP(c_acctbal) AS DOUBLE),4) AS sd
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q19_window_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |       RANK()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |       DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk
        |FROM orders ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,

    "q20_window_topk_group" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q21_window_lag_delta" ->
      """SELECT event_id, user_id,
        |       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q22_window_moving_rows" ->
      """SELECT event_id, user_id,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS mov
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "q23_window_range_interval" ->
      """SELECT event_id, user_id,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS cnt_1h
        |FROM events ORDER BY user_id, epoch_us(ts), event_id""".stripMargin,

    "q24_topk_global" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q25_set_union_all" ->
      """SELECT 'c' AS src, c_custkey AS k, c_name AS name, c_acctbal AS bal FROM customer
        |UNION ALL
        |SELECT 's', s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY src, k""".stripMargin,

    "q26_set_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier ORDER BY nk""".stripMargin,

    "q27_set_except" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier WHERE s_suppkey < 20
        |ORDER BY nk""".stripMargin,

    "q28_string_funcs" ->
      """SELECT p_partkey, UPPER(p_brand) AS ub, LOWER(p_type) AS lt,
        |       SUBSTRING(p_name,1,8) AS sub, CAST(LENGTH(p_name) AS BIGINT) AS ln,
        |       TRIM(CONCAT(p_brand,' ',p_type)) AS cc, REPLACE(p_type,' ','_') AS rep,
        |       LPAD(CAST(p_partkey AS VARCHAR),8,'0') AS pad,
        |       regexp_extract(p_name,'^([a-z]+)',1) AS rx
        |FROM part WHERE p_name LIKE '%bolt%' ORDER BY p_partkey""".stripMargin,

    "q29_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m, CAST(day(o_orderdate) AS BIGINT) AS d,
        |       epoch_us(date_trunc('month', o_orderdate)) AS mon_us,
        |       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS dsince,
        |       epoch_us(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS plus30_us
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q30_math_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, ROUND(ABS(l_discount - 0.05),6) AS a,
        |       CAST(CEIL(l_quantity) AS BIGINT) AS c, CAST(FLOOR(l_quantity) AS BIGINT) AS f,
        |       ROUND(SQRT(l_extendedprice),6) AS sq, ROUND(LN(l_extendedprice),6) AS lg,
        |       ROUND(POW(l_tax + 1, 2),6) AS pw,
        |       CAST(CAST(l_orderkey AS BIGINT) % 7 AS BIGINT) AS md
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, a, c, f, sq, lg, pw, md""".stripMargin,

    "q31_conditional_funcs" ->
      """SELECT c_custkey,
        |       CASE WHEN o_orderkey IS NULL THEN 'none'
        |            WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
        |       COALESCE(o_totalprice, 0.0) AS tp, NULLIF(c_mktsegment,'BUILDING') AS seg,
        |       LEAST(c_acctbal, COALESCE(o_totalprice, 1e18)) AS lo,
        |       GREATEST(c_acctbal, COALESCE(o_totalprice, -1e18)) AS hi
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |ORDER BY c_custkey, COALESCE(o_orderkey,-1)""".stripMargin,

    "q32_json_extract" ->
      """SELECT CAST(CAST(json_extract_string(props,'$.k') AS INTEGER) % 10 AS BIGINT) AS kmod,
        |       COUNT(*) AS cnt
        |FROM events GROUP BY kmod ORDER BY kmod""".stripMargin,

    "q33_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS sz,
        |       ROUND(CAST(embedding[1] AS DOUBLE),6) AS first,
        |       ROUND(CAST(embedding[2] AS DOUBLE),6) AS h2,
        |       ROUND(CAST(embedding[3] AS DOUBLE),6) AS h3,
        |       ROUND(CAST(embedding[4] AS DOUBLE),6) AS h4
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q34_explode_posexplode" ->
      """SELECT vec_id, CAST(gs.i AS BIGINT) AS pos,
        |       ROUND(CAST(embedding[gs.i] AS DOUBLE),6) AS val
        |FROM embeddings, generate_series(1,64) AS gs(i)
        |WHERE vec_id < 10 ORDER BY vec_id, pos""".stripMargin,

    "q35_window_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
        |       COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sv
        |FROM events GROUP BY bucket_us, event_type ORDER BY bucket_us, event_type""".stripMargin,

    "q36_window_sliding" ->
      """WITH s AS (
        |  SELECT ts, ((epoch_us(ts) // 900000000) - gs.i) * 900000000 AS win_start_us
        |  FROM events e, generate_series(0,3) AS gs(i))
        |SELECT win_start_us, COUNT(*) AS cnt
        |FROM s WHERE epoch_us(ts) >= win_start_us AND epoch_us(ts) < win_start_us + 3600000000
        |GROUP BY win_start_us ORDER BY win_start_us""".stripMargin,

    "q37_sessionize_gap" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
        |                   OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n_events,
        |       MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin
  )

  def all: Map[String, String] =
    relational ++ OracleSqlMl.all ++ OracleSqlWrangle.wrangle ++
      OracleSqlFeatures.features ++ OracleSqlRound8.round8 ++
      OracleSqlRound8b.round8b ++ OracleSqlRound8c.round8c ++ OracleSqlRound8d.round8d ++
      OracleSqlRound9.round9 ++ OracleSqlRound10.round10 ++
      OracleSqlRound10b.round10b ++ OracleSqlRound10c.round10c ++
      OracleSqlRound10d.round10d ++ OracleSqlRound11.round11 ++
      OracleSqlRound12.round12 ++ OracleSqlRound13.round13 ++
      OracleSqlRound14.round14 ++ OracleSqlRound15.round15
}
