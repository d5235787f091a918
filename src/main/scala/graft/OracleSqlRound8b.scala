package graft

/** DuckDB oracle statements for x155–x164 — the remaining TPC-H query
  * shapes (Q3/Q7/Q8/Q9/Q14/Q15/Q16/Q19/Q4/Q11 adapted to the harness
  * schema). Determinism discipline per SURVEY §7.4: revenue is the exact
  * BIGINT `price_cents · (100 − disc_pct)` (10⁻⁴-dollar units) on both
  * engines; the only divisions are final reported shares, computed as the
  * same two exact BIGINTs divided in doubles then ROUND(…, 6) — identical
  * IEEE quotient bits, so the 6-dp value cannot disagree.
  */
object OracleSqlRound8b {
  private val REV =
    "CAST(ROUND(l_extendedprice*100,0) AS BIGINT) * " +
      "(100 - CAST(ROUND(l_discount*100,0) AS BIGINT))"

  val round8b: Map[String, String] = Map(
    // x155: the LIMIT rides a tie-free total order (orderkey unique), so
    // the top-10 set is deterministic on both engines.
    "x155_tpch_q3_shipping_priority" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us,
        |       o_orderpriority, CAST(SUM($REV) AS BIGINT) AS revenue_u
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_u DESC, odate_us, l_orderkey LIMIT 10""".stripMargin,

    "x156_tpch_q7_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        |       COUNT(*) AS n_li, CAST(SUM($REV) AS BIGINT) AS revenue_u
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_12' AND cn.n_name = 'NATION_10') OR
        |       (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_12'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // x157: numerator and denominator are exact BIGINTs from ONE
    // conditional aggregate; only the reported share divides.
    "x157_tpch_q8_market_share" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
        |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_12' THEN $REV ELSE 0 END)
        |       AS BIGINT) AS nation_u,
        |  CAST(SUM($REV) AS BIGINT) AS total_u,
        |  ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_12' THEN $REV
        |                      ELSE 0 END) AS DOUBLE)
        |        / CAST(SUM($REV) AS BIGINT), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE p_type = 'PROMO'
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation
        |                      JOIN region ON n_regionkey = r_regionkey
        |                      WHERE r_name = 'ASIA')
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x158: pseudo supply cost = retail price per unit (no partsupp in
    // the harness schema); profits may be negative — that is the shape.
    "x158_tpch_q9_product_profit" ->
      s"""SELECT n_name AS supp_nation,
        |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        |       COUNT(*) AS n_li,
        |       CAST(SUM($REV - CAST(l_quantity AS BIGINT)
        |                * CAST(ROUND(p_retailprice*100,0) AS BIGINT) * 100)
        |            AS BIGINT) AS profit_u
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x159_tpch_q14_promo_share" ->
      s"""SELECT epoch_us(DATE_TRUNC('month', l_shipdate)) AS month_us,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $REV ELSE 0 END)
        |       AS BIGINT) AS promo_u,
        |  CAST(SUM($REV) AS BIGINT) AS total_u,
        |  ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $REV ELSE 0 END)
        |             AS DOUBLE) / CAST(SUM($REV) AS BIGINT), 6)
        |    AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "x160_tpch_q16_supplier_counts" ->
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size IN (1, 5, 9, 13) AND p_brand <> 'Brand#13'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 1000)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "x161_tpch_q19_disjunctive" ->
      s"""SELECT COUNT(*) AS n_li, CAST(SUM($REV) AS BIGINT) AS revenue_u
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    // x162: everyone EQUAL to the scalar max (ties all surface) — exact
    // BIGINT equality, so the winner set is deterministic.
    "x162_tpch_q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, CAST(SUM($REV) AS BIGINT) AS total_u
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT l_suppkey, s_name, total_u
        |FROM rev CROSS JOIN (SELECT MAX(total_u) AS max_u FROM rev) t
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_u = max_u ORDER BY l_suppkey""".stripMargin,

    // x163: EXISTS with a cross-table non-equi residual (shipped >60 days
    // after the order date).
    "x163_tpch_q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= TIMESTAMP '1996-08-30'
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x164: mean-relative threshold `value·n_parts > 2·total` — Q11's
    // fraction form is scale-dependent (the spec shrinks it by 1/SF);
    // this stays non-vacuous at every SF with the same exact-BIGINT
    // comparison.
    "x164_tpch_q11_important_stock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)
        |                  * CAST(ROUND(l_extendedprice*100,0) AS BIGINT))
        |              AS BIGINT) AS value_u
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_name = 'NATION_3')
        |  GROUP BY 1)
        |SELECT l_partkey, value_u
        |FROM v CROSS JOIN (SELECT CAST(SUM(value_u) AS BIGINT) AS total_u,
        |                          COUNT(*) AS n_parts FROM v) t
        |WHERE value_u * n_parts > total_u * 2
        |ORDER BY value_u DESC, l_partkey""".stripMargin,

    // x165: Hamilton largest-remainder apportionment — quotas, remainders
    // and ranks all exact BIGINTs; Σalloc == 1 000 000 by construction.
    "x165_token_budget_apportion" ->
      """WITH m AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM m),
        |b AS (SELECT source, mass,
        |             CAST(mass * 1000000 // total AS BIGINT) AS base,
        |             CAST((mass * 1000000) % total AS BIGINT) AS rem
        |      FROM m CROSS JOIN t),
        |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
        |             CAST(1000000 - SUM(base) OVER () AS BIGINT) AS leftover
        |      FROM b)
        |SELECT source, mass,
        |       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |            AS BIGINT) AS alloc
        |FROM r ORDER BY source""".stripMargin,

    // x166: the oracle states the SEMANTICS with the plain source join;
    // the engine's (source, length-bucket) join is pinned exhaustive by
    // Round8cSpec (|Δ| ≤ 25 < 128-char bucket width).
    "x166_parallel_pair_candidates" ->
      """SELECT a.source, a.doc_id AS en_doc, b.doc_id AS other_doc,
        |       b.lang AS other_lang, CAST(a.n_chars AS BIGINT) AS en_chars,
        |       CAST(b.n_chars AS BIGINT) AS other_chars
        |FROM documents a JOIN documents b ON a.source = b.source
        |WHERE a.lang = 'en' AND b.lang <> 'en'
        |  AND ABS(a.n_chars - b.n_chars) <= 25
        |ORDER BY a.source, en_doc, other_doc""".stripMargin,

    "x167_table_profile" ->
      """WITH o AS (SELECT o_custkey,
        |                  CAST(ROUND(o_totalprice*100,0) AS BIGINT)
        |                    AS total_cents,
        |                  epoch_us(o_orderdate) AS odate_us FROM orders),
        |s AS (SELECT
        |  COUNT(o_custkey) AS c1, COUNT(DISTINCT o_custkey) AS d1,
        |  MIN(o_custkey) AS mn1, MAX(o_custkey) AS mx1,
        |  COUNT(total_cents) AS c2, COUNT(DISTINCT total_cents) AS d2,
        |  MIN(total_cents) AS mn2, MAX(total_cents) AS mx2,
        |  COUNT(odate_us) AS c3, COUNT(DISTINCT odate_us) AS d3,
        |  MIN(odate_us) AS mn3, MAX(odate_us) AS mx3 FROM o)
        |SELECT col_name, metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'o_custkey' AS col_name, 'n_nonnull' AS metric, c1 AS value FROM s
        |  UNION ALL SELECT 'o_custkey', 'n_distinct', d1 FROM s
        |  UNION ALL SELECT 'o_custkey', 'min', mn1 FROM s
        |  UNION ALL SELECT 'o_custkey', 'max', mx1 FROM s
        |  UNION ALL SELECT 'total_cents', 'n_nonnull', c2 FROM s
        |  UNION ALL SELECT 'total_cents', 'n_distinct', d2 FROM s
        |  UNION ALL SELECT 'total_cents', 'min', mn2 FROM s
        |  UNION ALL SELECT 'total_cents', 'max', mx2 FROM s
        |  UNION ALL SELECT 'odate_us', 'n_nonnull', c3 FROM s
        |  UNION ALL SELECT 'odate_us', 'n_distinct', d3 FROM s
        |  UNION ALL SELECT 'odate_us', 'min', mn3 FROM s
        |  UNION ALL SELECT 'odate_us', 'max', mx3 FROM s)
        |ORDER BY col_name, metric""".stripMargin,

    // x168: row_number rn=1 under (n_orders DESC, partner ASC) — the same
    // total order as the engine's max_by(struct(n_orders, −partner)).
    "x168_copurchase_top1" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pc AS (SELECT a.l_partkey AS part, b.l_partkey AS partner,
        |              COUNT(*) AS n_orders
        |       FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |                          AND a.l_partkey <> b.l_partkey
        |       GROUP BY 1, 2),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY part
        |                 ORDER BY n_orders DESC, partner) AS rn FROM pc)
        |SELECT part, partner, CAST(n_orders AS BIGINT) AS n_orders
        |FROM rk WHERE rn = 1 ORDER BY part""".stripMargin,

    // x169: `cnt·n_days − total` clears the mean of division — the CUSUM
    // and its peak are exact BIGINTs; peak ties break on earliest day.
    "x169_event_cusum" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(DATE_TRUNC('day', ts)) // 86400000000 AS day,
        |         COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |              CAST(SUM(cnt) AS BIGINT) AS total
        |       FROM daily GROUP BY 1),
        |dev AS (SELECT d.event_type, day,
        |               CAST(cnt*n_days - total AS BIGINT) AS dev
        |        FROM daily d JOIN st USING (event_type)),
        |cs AS (SELECT event_type, day,
        |              CAST(SUM(dev) OVER (PARTITION BY event_type
        |                                  ORDER BY day) AS BIGINT) AS cusum
        |       FROM dev)
        |SELECT event_type, CAST(MAX(ABS(cusum)) AS BIGINT) AS max_abs_cusum,
        |       CAST(MIN(CASE WHEN rnk = 1 THEN day END) AS BIGINT)
        |         AS argmax_day
        |FROM (SELECT *, RANK() OVER (PARTITION BY event_type
        |                             ORDER BY ABS(cusum) DESC, day) AS rnk
        |      FROM cs)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x170: the oracle states skip-gram semantics with the positional
    // self-join; the engine builds pairs map-side from the token array
    // (PlanSpec pins the join-free shape).
    "x170_skipgram_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, t.tok, t.pos
        |  FROM documents,
        |       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok,
        |                generate_subscripts(string_split(text, ' '), 1)
        |                  AS pos) t),
        |pairs AS (
        |  SELECT a.tok AS w1, b.tok AS w2
        |  FROM toks a JOIN toks b
        |    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 2)
        |SELECT w1, w2, COUNT(*) AS n_pairs
        |FROM pairs GROUP BY 1, 2
        |ORDER BY n_pairs DESC, w1, w2 LIMIT 20""".stripMargin,

    // x171: med2 = the SUM of the two middle order statistics (median =
    // med2/2, exact BIGINT; for odd n both ranks coincide and med2 = 2·v).
    // The oracle full-sorts with row_number; the engine's two-phase
    // histogram never sorts rows.
    "x171_exact_median_histogram" ->
      """WITH c AS (SELECT CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |n AS (SELECT COUNT(*) AS n FROM c),
        |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk FROM c)
        |SELECT (SELECT n FROM n) AS n_rows,
        |       CAST(SUM(CASE WHEN rk IN ((SELECT (n+1)//2 FROM n),
        |                                 (SELECT n//2+1 FROM n))
        |                     THEN cents ELSE 0 END)
        |            * CASE WHEN (SELECT n FROM n) % 2 = 1 THEN 2 ELSE 1 END
        |            AS BIGINT) AS med2_cents
        |FROM r""".stripMargin,

    // x172: ≤1000 mod-2⁵³ terms per range keep every sum below 2⁶³ on
    // both engines; the checksum is a commutative sum, so partial
    // aggregation is exact and partition-order-free.
    "x172_range_checksums" ->
      """SELECT o_orderkey // 1000 AS key_range, COUNT(*) AS n_rows,
        |       CAST(SUM((o_orderkey % 100000000 * 2654435761 + o_custkey * 40503
        |                 + CAST(ROUND(o_totalprice*100,0) AS BIGINT))
        |                % 9007199254740881) AS BIGINT) AS checksum
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // x173: the oracle is the ONE-PASS aggregate; the engine merges two
    // partial states — equality is the incremental-maintenance theorem
    // for decomposable aggregates.
    "x173_incremental_agg_merge" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(MIN(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(MAX(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
        |    AS max_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // x174: both engines derive snapshot B with the same +1-cent drift
    // and report each checksum-flagged range with its changed-row count.
    "x174_snapshot_range_diff" ->
      """WITH a AS (SELECT o_orderkey, o_custkey,
        |                  CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |b AS (SELECT o_orderkey, o_custkey,
        |             cents + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END
        |               AS cents FROM a),
        |ca AS (SELECT o_orderkey // 1000 AS key_range,
        |              CAST(SUM((o_orderkey%100000000*2654435761 + o_custkey*40503
        |                        + cents) % 9007199254740881) AS BIGINT) AS cs
        |       FROM a GROUP BY 1),
        |cb AS (SELECT o_orderkey // 1000 AS key_range,
        |              CAST(SUM((o_orderkey%100000000*2654435761 + o_custkey*40503
        |                        + cents) % 9007199254740881) AS BIGINT) AS cs
        |       FROM b GROUP BY 1),
        |flagged AS (SELECT ca.key_range FROM ca JOIN cb USING (key_range)
        |            WHERE ca.cs <> cb.cs)
        |SELECT x.o_orderkey // 1000 AS key_range, COUNT(*) AS n_changed
        |FROM a x JOIN b y USING (o_orderkey)
        |WHERE x.cents <> y.cents
        |  AND x.o_orderkey // 1000 IN (SELECT key_range FROM flagged)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x175: lower weighted median — smallest value whose doubled running
    // weight reaches the group total; the oracle window-sorts per group,
    // the engine's two-phase histogram never sorts rows.
    "x175_weighted_median_grouped" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |                  CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
        |                    AS cents,
        |                  CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |g AS (SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
        |      FROM v GROUP BY 1, 2),
        |c AS (SELECT flag, cents, w,
        |             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY cents)
        |                  AS BIGINT) AS cw,
        |             CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
        |      FROM g)
        |SELECT flag, tw AS total_weight,
        |       CAST(MIN(CASE WHEN 2*cw >= tw THEN cents END) AS BIGINT)
        |         AS wmed_cents
        |FROM c GROUP BY flag, tw ORDER BY flag""".stripMargin,

    // x176: value-based deciles — boundary_d = min value whose cumulative
    // count reaches ceil(d·n/10); the oracle sorts, the engine's
    // histogram never does.
    "x176_decile_boundaries" ->
      """WITH c AS (SELECT CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |n AS (SELECT COUNT(*) AS n FROM c),
        |g AS (SELECT cents, COUNT(*) AS cnt FROM c GROUP BY 1),
        |cw AS (SELECT cents,
        |              CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
        |       FROM g),
        |t AS (SELECT d, CAST((d * (SELECT n FROM n) + 9) // 10 AS BIGINT)
        |               AS target
        |      FROM (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS d))
        |SELECT CAST(d AS BIGINT) AS d,
        |       CAST(MIN(cents) AS BIGINT) AS boundary_cents,
        |       CAST(MIN(cum) AS BIGINT) AS n_at_or_below
        |FROM t JOIN cw ON cum >= target
        |GROUP BY d ORDER BY d""".stripMargin,

    // x177: Σi·xᵢ is invariant under permutations of tied values, so
    // row_number's arbitrary tie order cannot change the output.
    "x177_customer_gini" ->
      """WITH c AS (SELECT o_custkey,
        |                  CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |r AS (SELECT o_custkey, cents,
        |             ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                ORDER BY cents) AS i FROM c)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |       CAST(2*SUM(i*cents) - (COUNT(*)+1)*SUM(cents) AS BIGINT)
        |         AS gini_num,
        |       CAST(COUNT(*)*SUM(cents) AS BIGINT) AS gini_den
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "x178_tpch_q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name, COUNT(*) AS n_li,
        |       CAST(SUM($REV) AS BIGINT) AS lost_u
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY lost_u DESC, c_custkey LIMIT 20""".stripMargin,

    "x179_tpch_q12_priority_classes" ->
      """SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // x180: decile of a row = smallest d whose boundary covers it (10 if
    // none) — identical to the engine's "1 + boundaries strictly below"
    // on monotone boundaries, tie-consistent.
    "x180_decile_assign" ->
      """WITH c AS (SELECT CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS cents
        |           FROM orders),
        |n AS (SELECT COUNT(*) AS n FROM c),
        |g AS (SELECT cents, COUNT(*) AS cnt FROM c GROUP BY 1),
        |cw AS (SELECT cents,
        |              CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum
        |       FROM g),
        |t AS (SELECT d, CAST((d * (SELECT n FROM n) + 9) // 10 AS BIGINT)
        |               AS target
        |      FROM (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS d)),
        |b AS (SELECT d, CAST(MIN(cents) AS BIGINT) AS boundary
        |      FROM t JOIN cw ON cum >= target GROUP BY d)
        |SELECT COALESCE((SELECT CAST(MIN(d) AS BIGINT) FROM b
        |                 WHERE c.cents <= b.boundary), 10) AS decile,
        |       COUNT(*) AS n_orders, CAST(SUM(c.cents) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // x181: 3 unrolled sync-LPA rounds; row_number under (c DESC, label)
    // is the same argmax the engine's max_by(struct(c, −label)) takes.
    "x181_label_propagation" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
        |       FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |                          AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
        |r1 AS (SELECT n.u AS node, l.label, COUNT(*) AS c
        |       FROM und n JOIN l0 l ON n.v = l.node GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |         SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |                ORDER BY c DESC, label) AS rn FROM r1) WHERE rn = 1),
        |r2 AS (SELECT n.u AS node, l.label, COUNT(*) AS c
        |       FROM und n JOIN l1 l ON n.v = l.node GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |         SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |                ORDER BY c DESC, label) AS rn FROM r2) WHERE rn = 1),
        |r3 AS (SELECT n.u AS node, l.label, COUNT(*) AS c
        |       FROM und n JOIN l2 l ON n.v = l.node GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (
        |         SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
        |                ORDER BY c DESC, label) AS rn FROM r3) WHERE rn = 1)
        |SELECT label, COUNT(*) AS n_nodes FROM l3 GROUP BY 1
        |ORDER BY n_nodes DESC, label""".stripMargin,

    // x182: subspace distances round at 6 dp then scale to integer
    // micros, so the 4-lookup ADC sum is an exact BIGINT on both engines
    // and the (adc, vec_id) top-10 is total-ordered.
    "x182_pq_adc_topk" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS ce
        |            FROM embeddings WHERE vec_id < 8),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT UNNEST(range(0, 4)) AS sub),
        |lut AS (SELECT s.sub, cb.code,
        |          CAST(ROUND(ROUND(list_sum([
        |            (CAST(cb.ce[s.sub * 16 + i] AS DOUBLE)
        |               - CAST(q.qe[s.sub * 16 + i] AS DOUBLE))
        |          * (CAST(cb.ce[s.sub * 16 + i] AS DOUBLE)
        |               - CAST(q.qe[s.sub * 16 + i] AS DOUBLE))
        |              FOR i IN generate_series(1, 16)]), 6) * 1000000, 0)
        |            AS BIGINT) AS lm
        |        FROM cb, q, s),
        |d AS (SELECT e.vec_id, s.sub, cb.code,
        |        ROUND(list_sum([
        |          (CAST(cb.ce[s.sub * 16 + i] AS DOUBLE)
        |             - CAST(e.embedding[s.sub * 16 + i] AS DOUBLE))
        |        * (CAST(cb.ce[s.sub * 16 + i] AS DOUBLE)
        |             - CAST(e.embedding[s.sub * 16 + i] AS DOUBLE))
        |            FOR i IN generate_series(1, 16)]), 6) AS d2
        |      FROM embeddings e, s, cb),
        |codes AS (SELECT vec_id, sub, code FROM (
        |            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
        |                                         ORDER BY d2, code) AS rn
        |            FROM d) WHERE rn = 1)
        |SELECT vec_id, CAST(SUM(lm) AS BIGINT) AS adc_micros
        |FROM codes JOIN lut USING (sub, code)
        |GROUP BY 1 ORDER BY adc_micros, vec_id LIMIT 10""".stripMargin
  )
}
