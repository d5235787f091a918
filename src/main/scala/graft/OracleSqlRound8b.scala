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
        |ORDER BY value_u DESC, l_partkey""".stripMargin
  )
}
