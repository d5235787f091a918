package graft

/** DuckDB oracle statements for x143–x151 (round 8) — TPC-H correlation
  * shapes, interval/frame operators, and the chained stateful streaming
  * windows. Same determinism discipline as the rest of the registry
  * (SURVEY §7.4): integer qty/cents everywhere a threshold is compared,
  * CAST(SUM(...) AS BIGINT) to collapse DuckDB's HUGEINT, explicit ORDER
  * BY irrelevant to the driver's canonical sort but kept for readability.
  */
object OracleSqlRound8 {
  val round8: Map[String, String] = Map(
    // x143: `2·q·n < Σq` restates `q < avg/2` with no division — the
    // boundary is exact integer arithmetic on both engines.
    "x143_tpch_q17_small_qty" ->
      """WITH bl AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13'),
        |s AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |             COUNT(*) AS n_li
        |      FROM bl GROUP BY 1)
        |SELECT COUNT(*) AS n_small,
        |       CAST(SUM(price_cents) AS BIGINT) AS revenue_cents
        |FROM bl JOIN s USING (l_partkey)
        |WHERE qty * 2 * n_li < sum_qty""".stripMargin,

    // x144: `qty·n > Σqty` ⇔ `qty > avg` in BIGINTs; the scalar aggregate
    // is a 1-row CROSS JOIN stitch.
    "x144_tpch_q20_excess_supply" ->
      """WITH shipped AS (
        |  SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(qty) AS BIGINT) AS tot_qty, COUNT(*) AS n_supp
        |      FROM shipped)
        |SELECT s_suppkey, s_name, qty
        |FROM shipped CROSS JOIN t
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty * n_supp > tot_qty
        |ORDER BY s_suppkey""".stripMargin,

    // x145: both engines quantize to cents FIRST, so the positive-balance
    // population and the `bal·n > Σbal` boundary are identical by
    // construction.
    "x145_tpch_q22_idle_balance" ->
      """WITH cust AS (
        |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        |  FROM customer),
        |p AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_pos,
        |             COUNT(*) AS n_pos
        |      FROM cust WHERE bal_cents > 0)
        |SELECT c_nationkey, COUNT(*) AS n_cust,
        |       CAST(SUM(bal_cents) AS BIGINT) AS bal_cents
        |FROM cust CROSS JOIN p
        |WHERE bal_cents * n_pos > sum_pos
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // x146: trailing-7-row exact median; QUANTILE_CONT over the bounded
    // frame interpolates (a+b)/2 on even counts — exact for cent-scale
    // BIGINTs in doubles, same value as the Spark sort-and-middle form.
    "x146_sliding_median" ->
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority,
        |         epoch_us(DATE_TRUNC('day', o_orderdate)) AS day_us,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT priority, day_us, rev_cents,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_frame,
        |       ROUND(QUANTILE_CONT(rev_cents, 0.5) OVER w, 1) AS med_cents
        |FROM daily
        |WINDOW w AS (PARTITION BY priority ORDER BY day_us
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY priority, day_us""".stripMargin,

    // x147: canonical a<b pairs; overlap length in integer days between
    // midnight-aligned bounds.
    "x147_interval_overlap_pairs" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust, o_orderkey AS okey,
        |         o_orderdate AS ivl_start,
        |         o_orderdate + INTERVAL 30 DAY AS ivl_end
        |  FROM orders)
        |SELECT a.cust AS c_custkey, COUNT(*) AS n_pairs,
        |       CAST(SUM(DATE_DIFF('day',
        |                GREATEST(a.ivl_start, b.ivl_start),
        |                LEAST(a.ivl_end, b.ivl_end))) AS BIGINT)
        |         AS overlap_days
        |FROM o a JOIN o b
        |  ON a.cust = b.cust AND a.okey < b.okey
        | AND a.ivl_start < b.ivl_end AND b.ivl_start < a.ivl_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x148: the x65 interval construction consumed — containment
    // `valid_from <= t < valid_to` with NULL valid_to = current version;
    // zero-length tie intervals contain nothing, so each probe matches
    // exactly one version.
    "x148_pit_priority_lookup" ->
      """WITH v AS (
        |  SELECT o_custkey AS v_cust, o_orderkey AS version_key,
        |         o_orderpriority AS version_priority,
        |         o_orderdate AS valid_from,
        |         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders),
        |p AS (
        |  SELECT o_custkey AS p_cust, o_orderkey AS probe_key,
        |         o_orderdate + INTERVAL 45 DAY AS t
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 29 = 0)
        |SELECT probe_key, version_key, version_priority
        |FROM p JOIN v ON p_cust = v_cust
        | AND valid_from <= t AND (valid_to IS NULL OR t < valid_to)
        |ORDER BY probe_key""".stripMargin,

    // x149: append-mode chained windows — both grains filtered by the SAME
    // final watermark (max event-time ms − 10 min, Spark tracks event time
    // in ms), exactly the windows the no-data batch flushes through the
    // two stateful operators.
    "x149_stream_chained_windows" ->
      """WITH ev AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        |wm AS (SELECT (MAX(us) // 1000 - 600000) * 1000 AS wm_us FROM ev),
        |b10 AS (
        |  SELECT (us // 600000000) * 600000000 AS b_us, event_type,
        |         COUNT(*) AS n10
        |  FROM ev GROUP BY 1, 2),
        |closed AS (
        |  SELECT b_us, event_type, n10, wm_us FROM b10 CROSS JOIN wm
        |  WHERE b_us + 600000000 <= wm_us)
        |SELECT (b_us // 3600000000) * 3600000000 AS hour_us, event_type,
        |       CAST(MAX(n10) AS BIGINT) AS max_10min,
        |       CAST(SUM(n10) AS BIGINT) AS n_events
        |FROM closed
        |WHERE (b_us // 3600000000) * 3600000000 + 3600000000 <= wm_us
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // x150: the identical Morton arithmetic (ZOrder.zExpr renders `//` for
    // DuckDB, `DIV` for Spark) over the same 8-bit quantization.
    "x150_zorder_layout" ->
      s"""WITH m AS (SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs
        |           FROM lineitem),
        |q AS (
        |  SELECT CAST((l_partkey * 256) // (maxp + 1) AS INT) AS px,
        |         CAST((l_suppkey * 256) // (maxs + 1) AS INT) AS py
        |  FROM lineitem CROSS JOIN m),
        |z AS (SELECT px, py, ${graft.engine.ZOrder.zExpr("px", "py", "//")} AS z
        |      FROM q)
        |SELECT CAST(z // 256 AS BIGINT) AS tile, COUNT(*) AS n_rows,
        |       CAST(MIN(px) AS BIGINT) AS min_px,
        |       CAST(MAX(px) AS BIGINT) AS max_px,
        |       CAST(MIN(py) AS BIGINT) AS min_py,
        |       CAST(MAX(py) AS BIGINT) AS max_py
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    // x151: row_number under (h ASC, id ASC) — the same total order
    // topk_pairs keeps under (−h DESC, id ASC).
    "x151_group_hash_sample" ->
      """WITH h AS (
        |  SELECT event_type, event_id,
        |         ((event_id % 100000000) * 2654435761) % 2147483647 AS h
        |  FROM events),
        |r AS (SELECT event_type, event_id, h,
        |             ROW_NUMBER() OVER (PARTITION BY event_type
        |                                ORDER BY h, event_id) AS rank
        |      FROM h)
        |SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id, h
        |FROM r WHERE rank <= 5 ORDER BY 1, 2""".stripMargin,

    // x152: correlated MIN decorrelated — arg_min is stated as the
    // row_number twin so the (cost, suppkey) tie order is explicit.
    "x152_tpch_q2_min_supplier" ->
      """WITH costs AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS cost_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15
        |  GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
        |                ORDER BY cost_cents, l_suppkey) AS rn
        |      FROM costs)
        |SELECT l_partkey, l_suppkey, s_name, cost_cents
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1 ORDER BY l_partkey""".stripMargin,

    // x153: powers of two <= 2^20 are exact in doubles, the BIGINT cast
    // exact on both engines — integer-deterministic time decay.
    "x153_decay_engagement" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT MAX(us) AS max_us FROM ev)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(POWER(2.0, 20 - LEAST((max_us - us) // 604800000000,
        |                                           20)) AS BIGINT)) AS BIGINT)
        |         AS decay_score
        |FROM ev CROSS JOIN m
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x154: the anchor-date islands device — day − row_number() is
    // constant exactly within a consecutive-day run.
    "x154_activity_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |runs AS (
        |  SELECT user_id,
        |         day - ROW_NUMBER() OVER (PARTITION BY user_id
        |                                  ORDER BY day) AS anchor
        |  FROM days),
        |islands AS (
        |  SELECT user_id, anchor, COUNT(*) AS len
        |  FROM runs GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |       CAST(MAX(len) AS BIGINT) AS longest_streak
        |FROM islands GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
