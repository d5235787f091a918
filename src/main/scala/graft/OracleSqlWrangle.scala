package graft

/** DuckDB oracle statements for the round-5 wrangling operators
  * ([[graft.queries.Wrangle]] x57–x60). Same repr protocol as the rest
  * (SURVEY.md §7.4): BIGINT / ROUND(…, k) DOUBLE / VARCHAR outputs only,
  * every column aliased identically to the Spark side. */
object OracleSqlWrangle {

  val wrangle: Map[String, String] = Map(
    // x57: range(0, n_chars, 150) is exclusive-stop — exactly Spark's
    // sequence(0, n_chars-1, 150) inclusive-stop generation; substr is
    // 1-based on both engines and the corpus is ASCII (char = byte).
    "x57_doc_chunk" ->
      """SELECT doc_id, CAST(u.i // 150 AS BIGINT) AS chunk_idx,
        |       CAST(u.i AS BIGINT) AS start_off,
        |       CAST(LEAST(200, n_chars - u.i) AS BIGINT) AS chunk_len,
        |       substr(text, CAST(u.i + 1 AS INTEGER), 8) AS prefix
        |FROM documents, UNNEST(range(0, n_chars, 150)) AS u(i)
        |WHERE n_chars > 0
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // x58: the cents conversion rounds each double ONCE per row (identical
    // IEEE value both engines) before the exact BIGINT sum — no
    // float-summation-order hazard.
    "x58_upsert_latest" ->
      """WITH r AS (
        |  SELECT event_type, value, ts,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_keys,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS value_cents,
        |       MAX(epoch_us(ts)) AS max_ts_us
        |FROM r WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x59: every count is exact BIGINT; each pmi is one integer-ratio
    // division + one ln — bit-identical doubles before the 6-digit round.
    "x59_bigram_pmi" ->
      """WITH d AS (
        |  SELECT [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |uni AS (
        |  SELECT x AS tok, COUNT(*) AS u
        |  FROM d, UNNEST(t) AS s(x) GROUP BY 1),
        |pr AS (
        |  SELECT x AS bg, COUNT(*) AS b FROM d,
        |    UNNEST([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS s(x)
        |  GROUP BY 1),
        |tot AS (SELECT (SELECT SUM(u) FROM uni) AS n_tokens,
        |               (SELECT SUM(b) FROM pr) AS m)
        |SELECT string_split(bg, ' ')[1] AS tok_a,
        |       string_split(bg, ' ')[2] AS tok_b,
        |       CAST(b AS BIGINT) AS n_pair,
        |       ROUND(LN(CAST(b * n_tokens * n_tokens AS DOUBLE)
        |                / CAST(m * ua.u * ub.u AS DOUBLE)), 6) AS pmi
        |FROM pr, tot
        |JOIN uni ua ON ua.tok = string_split(bg, ' ')[1]
        |JOIN uni ub ON ub.tok = string_split(bg, ' ')[2]
        |WHERE b >= 5
        |ORDER BY tok_a, tok_b""".stripMargin,

    // x60: each term's ratio is one exact-BIGINT division + one ln; only the
    // final per-source sum is a float accumulation, rounded to 6 (x44's
    // tolerance class — the term count is vocab-bounded).
    "x60_source_kl" ->
      """WITH t AS (
        |  SELECT source, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text), ' ') IF x <> ''])
        |      AS s(x)),
        |st AS (SELECT source, tok, COUNT(*) AS c_st FROM t GROUP BY 1, 2),
        |tt AS (SELECT tok, SUM(c_st) AS c_t FROM st GROUP BY 1),
        |srt AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1),
        |tot AS (SELECT SUM(c_t) AS n_corpus FROM tt)
        |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
        |       COUNT(*) AS n_distinct,
        |       ROUND(SUM(c_st * LN(CAST(c_st * n_corpus AS DOUBLE)
        |                           / CAST(n_s * c_t AS DOUBLE)))
        |             / MAX(n_s), 6) AS kl
        |FROM st JOIN tt USING (tok) JOIN srt USING (source), tot
        |GROUP BY source ORDER BY source""".stripMargin,

    // x61: the Bloom pre-filter is an engine-internal pruning step — false
    // positives are removed by the exact semi join, so the oracle is the
    // plain EXISTS; cents-exact sum per x58's per-row rounding rule.
    "x61_bloom_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        |       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS acctbal_cents
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // x62: the sketch pass is engine-internal candidate pruning (survivor
    // guarantee: any token with count > N/65) — the exact recount makes the
    // output the plain top-20, which is what the oracle states. The
    // (cnt DESC, tok) order is total, so LIMIT is deterministic.
    "x62_heavy_hitters" ->
      """SELECT x AS tok, COUNT(*) AS cnt
        |FROM documents,
        |  UNNEST([t FOR t IN string_split(LOWER(text), ' ') IF t <> ''])
        |    AS s(x)
        |GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 20""".stripMargin,

    // x63: the hash order is exact BIGINT arithmetic on both engines
    // (products stay < 2^63), ties broken by doc_id — a total order, so the
    // per-stratum rank is engine-identical.
    "x63_stratified_sample" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 100000000) * 1540483477) % 1000000, doc_id)
        |      AS rn
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN rn <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN rn <= 30 THEN n_chars ELSE 0 END) AS BIGINT)
        |    AS chars_kept
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    // x64: five independent violation counts; all-zero on the synthetic
    // data is expected and still hash-compared.
    "x64_integrity_audit" ->
      """SELECT 'customer_dup_key' AS check, COUNT(*) AS n_bad FROM (
        |  SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'lineitem_nonpositive_price', COUNT(*) FROM lineitem
        |  WHERE l_extendedprice <= 0
        |UNION ALL
        |SELECT 'lineitem_orphan', COUNT(*) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'order_dup_key', COUNT(*) FROM (
        |  SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'order_no_customer', COUNT(*) FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |ORDER BY "check"""".stripMargin,

    // x65: µs-exact interval arithmetic under a total per-user order.
    "x65_scd2_intervals" ->
      """WITH iv AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS next_us
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_intervals,
        |  CAST(SUM(CASE WHEN next_us IS NOT NULL THEN next_us - us
        |                ELSE 0 END) AS BIGINT) AS closed_dur_us,
        |  CAST(SUM(CASE WHEN next_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_open
        |FROM iv GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x66: each surprisal term is one exact-BIGINT ratio + one ln; the
    // per-doc AVG is a float sum in x44's tolerance class (round 6). Docs
    // with <2 tokens yield no bigrams and are absent on both engines.
    "x66_bigram_surprisal" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS tok_a, t[i+1] AS tok_b
        |  FROM d, UNNEST(range(1, len(t))) AS u(i)),
        |pc AS (SELECT tok_a, tok_b, COUNT(*) AS b FROM bg GROUP BY 1, 2),
        |hc AS (SELECT tok_a, SUM(b) AS h FROM pc GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       ROUND(AVG(LN(CAST(h AS DOUBLE) / CAST(b AS DOUBLE))), 6)
        |         AS surprisal
        |FROM bg JOIN pc USING (tok_a, tok_b) JOIN hc USING (tok_a)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x67: the same five power iterations, unrolled as CTEs (recursive CTEs
    // cannot aggregate in the recursive term). All constants are CAST to
    // DOUBLE so no DECIMAL literal arithmetic sneaks in; contribution sums
    // are x44-class float adds, rounded 6 only at the end.
    "x67_token_pagerank" ->
      """WITH d AS (
        |  SELECT [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |bg AS (SELECT t[i] AS a, t[i+1] AS b
        |       FROM d, UNNEST(range(1, len(t))) AS u(i)),
        |pc AS (SELECT a, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |e AS (SELECT src, dst, SUM(c) AS w FROM (
        |        SELECT a AS src, b AS dst, c FROM pc
        |        UNION ALL SELECT b, a, c FROM pc) GROUP BY 1, 2),
        |s AS (SELECT src, SUM(w) AS strength FROM e GROUP BY 1),
        |oe AS (SELECT e.src, e.dst,
        |              CAST(w AS DOUBLE) / CAST(strength AS DOUBLE) AS frac
        |       FROM e JOIN s USING (src)),
        |v AS (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM e),
        |p0 AS (SELECT DISTINCT src AS tok, CAST(1.0 AS DOUBLE) / (SELECT n FROM v) AS p FROM e),
        |p1 AS (SELECT oe.dst AS tok, CAST(0.15 AS DOUBLE) / (SELECT n FROM v)
        |              + CAST(0.85 AS DOUBLE) * SUM(p0.p * oe.frac) AS p
        |       FROM oe JOIN p0 ON p0.tok = oe.src GROUP BY oe.dst),
        |p2 AS (SELECT oe.dst AS tok, CAST(0.15 AS DOUBLE) / (SELECT n FROM v)
        |              + CAST(0.85 AS DOUBLE) * SUM(p1.p * oe.frac) AS p
        |       FROM oe JOIN p1 ON p1.tok = oe.src GROUP BY oe.dst),
        |p3 AS (SELECT oe.dst AS tok, CAST(0.15 AS DOUBLE) / (SELECT n FROM v)
        |              + CAST(0.85 AS DOUBLE) * SUM(p2.p * oe.frac) AS p
        |       FROM oe JOIN p2 ON p2.tok = oe.src GROUP BY oe.dst),
        |p4 AS (SELECT oe.dst AS tok, CAST(0.15 AS DOUBLE) / (SELECT n FROM v)
        |              + CAST(0.85 AS DOUBLE) * SUM(p3.p * oe.frac) AS p
        |       FROM oe JOIN p3 ON p3.tok = oe.src GROUP BY oe.dst),
        |p5 AS (SELECT oe.dst AS tok, CAST(0.15 AS DOUBLE) / (SELECT n FROM v)
        |              + CAST(0.85 AS DOUBLE) * SUM(p4.p * oe.frac) AS p
        |       FROM oe JOIN p4 ON p4.tok = oe.src GROUP BY oe.dst)
        |SELECT tok, ROUND(p, 6) AS pr FROM p5 ORDER BY tok""".stripMargin,

    // x68: the fill is a running last_value IGNORE NULLS under the same
    // total order on both engines; cents sums are per-row-rounded (x58).
    "x68_forward_fill" ->
      """WITH f AS (
        |  SELECT event_type,
        |         CASE WHEN event_type <> 'error' THEN value END AS v,
        |         LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
        |                    IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS filled
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN v IS NULL AND filled IS NOT NULL
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN filled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unfilled,
        |  CAST(SUM(CAST(ROUND(COALESCE(filled, 0.0) * 100, 0) AS BIGINT))
        |       AS BIGINT) AS filled_cents
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x69: generate_series over dates yields timestamps — cast back to DATE;
    // the VARCHAR day matches Spark's date-to-string 'YYYY-MM-DD'.
    "x69_date_spine" ->
      """WITH b AS (
        |  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
        |         MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |s AS (SELECT CAST(u.d AS DATE) AS day
        |      FROM b, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS u(d)),
        |p AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
        |             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |                  AS BIGINT) AS revenue_cents
        |      FROM orders GROUP BY 1)
        |SELECT CAST(s.day AS VARCHAR) AS day,
        |       CAST(CASE WHEN dayofweek(s.day) IN (0, 6) THEN 1 ELSE 0 END
        |            AS BIGINT) AS is_weekend,
        |       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(revenue_cents, 0) AS BIGINT) AS revenue_cents
        |FROM s LEFT JOIN p USING (day) ORDER BY day""".stripMargin,

    // x115: identical FULL OUTER statement — USING coalesces the key on
    // both engines; counts are BIGINT on both sides.
    "x115_join_full_outer" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n_clicks
        |           FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT user_id, COUNT(*) AS n_purchases
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT user_id,
        |       COALESCE(n_clicks, 0) AS n_clicks,
        |       COALESCE(n_purchases, 0) AS n_purchases,
        |       CASE WHEN COALESCE(n_clicks, 0) = 0 THEN 'purchase_only'
        |            WHEN COALESCE(n_purchases, 0) = 0 THEN 'click_only'
        |            ELSE 'both' END AS status
        |FROM c FULL OUTER JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // x117: DuckDB runs the same multiset operators natively.
    "x117_set_ops_all" ->
      """WITH i AS (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase'),
        |x AS (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase'),
        |ic AS (SELECT user_id, COUNT(*) AS n_matched FROM i GROUP BY 1),
        |xc AS (SELECT user_id, COUNT(*) AS n_excess FROM x GROUP BY 1)
        |SELECT user_id,
        |       COALESCE(n_matched, 0) AS n_matched,
        |       COALESCE(n_excess, 0) AS n_excess
        |FROM ic FULL OUTER JOIN xc USING (user_id)
        |ORDER BY user_id""".stripMargin
  )
}
