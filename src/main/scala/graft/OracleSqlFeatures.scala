package graft

/** DuckDB oracle statements for the round-5 feature-engineering operators
  * ([[graft.queries.Features]] x70–x77). Same repr protocol as the rest
  * (SURVEY.md §7.4): BIGINT / ROUND(…, k) DOUBLE / VARCHAR outputs only,
  * every column aliased identically to the Spark side. DuckDB's SUM(BIGINT)
  * is HUGEINT — every summed output is CAST back to BIGINT (the q49/x20
  * rule). */
object OracleSqlFeatures {

  val features: Map[String, String] = Map(
    // x70: the windowed top-k the native aggregate must reproduce exactly —
    // same total order (score DESC, tag ASC).
    "x70_topk_native" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, o_orderkey,
        |       ROUND(o_totalprice, 2) AS total_price
        |FROM r WHERE rn <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,

    // x71: ntile is the SQL-standard equal-frequency binning on both
    // engines (first n mod k buckets one element larger); the bucket
    // assignment is deterministic under the (acctbal, custkey) total order.
    "x71_quartile_buckets" ->
      """WITH b AS (
        |  SELECT c_mktsegment, c_acctbal,
        |         NTILE(4) OVER (PARTITION BY c_mktsegment
        |                        ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
        |       COUNT(*) AS n,
        |       ROUND(MIN(c_acctbal), 2) AS min_bal,
        |       ROUND(MAX(c_acctbal), 2) AS max_bal,
        |       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS bal_cents
        |FROM b GROUP BY c_mktsegment, quartile
        |ORDER BY c_mktsegment, quartile""".stripMargin,

    // x72: all features are exact integer arithmetic over epoch-µs BIGINTs
    // and per-row cent rounding — no float accumulation anywhere.
    "x72_user_features" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |       COUNT(DISTINCT event_type) AS n_types,
        |       CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS BIGINT)
        |         AS span_s,
        |       CAST(CASE WHEN COUNT(*) > 1
        |            THEN ((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000)
        |                 // (COUNT(*) - 1)
        |            ELSE 0 END AS BIGINT) AS mean_gap_ms,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x73: per-user order is total via (ts, event_id) — same lag frame as
    // the Spark window.
    "x73_markov_context2" ->
      """WITH g AS (
        |  SELECT event_type,
        |         LAG(event_type, 1) OVER w AS prev1,
        |         LAG(event_type, 2) OVER w AS prev2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT prev2 || '>' || prev1 AS context, event_type AS next_type,
        |       COUNT(*) AS cnt
        |FROM g WHERE prev2 IS NOT NULL
        |GROUP BY context, next_type
        |HAVING COUNT(*) >= 3
        |ORDER BY context, next_type""".stripMargin,

    // x74: quantile_cont == Spark percentile (type-7 linear interpolation,
    // the x28-proven pairing); top1_ppm is exact integer division.
    "x74_key_skew_report" ->
      """WITH k AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |       COUNT(*) AS n_keys,
        |       MAX(c) AS max_c,
        |       MIN(c) AS min_c,
        |       CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top1_ppm,
        |       ROUND(quantile_cont(c, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(c, 0.95), 6) AS p95,
        |       ROUND(quantile_cont(c, 0.99), 6) AS p99
        |FROM k""".stripMargin,

    // x75: the midpoint is exact integer µs arithmetic; each share is one
    // BIGINT-ratio division and each PSI term a fixed 4-op double chain.
    "x75_drift_psi" ->
      """WITH m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
        |           FROM events),
        |cells AS (
        |  SELECT event_type,
        |         CAST(SUM(CASE WHEN epoch_us(ts) < mid THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_early,
        |         CAST(SUM(CASE WHEN epoch_us(ts) >= mid THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_late
        |  FROM events, m GROUP BY event_type)
        |SELECT event_type, n_early, n_late,
        |       ROUND((n_early * 1.0 / (SELECT SUM(n_early) FROM cells)
        |              - n_late * 1.0 / (SELECT SUM(n_late) FROM cells))
        |             * LN((n_early * 1.0 / (SELECT SUM(n_early) FROM cells))
        |                  / (n_late * 1.0 / (SELECT SUM(n_late) FROM cells))), 6)
        |         AS psi
        |FROM cells ORDER BY event_type""".stripMargin,

    // x76: generate_series is inclusive-stop — exactly Spark's
    // sequence(1, n_chars-2); substr is 1-based on both engines and the
    // corpus is ASCII (char = byte, MultimodalSpec guard).
    "x76_char_trigrams" ->
      """WITH pos AS (
        |  SELECT lang, LOWER(text) AS t,
        |         UNNEST(generate_series(1, n_chars - 2)) AS i
        |  FROM documents WHERE n_chars >= 3),
        |cnt AS (
        |  SELECT lang, substr(t, CAST(i AS INTEGER), 3) AS tri, COUNT(*) AS cnt
        |  FROM pos GROUP BY lang, tri),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |                               ORDER BY cnt DESC, tri) AS rank
        |  FROM cnt)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, tri, cnt
        |FROM r WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

    // x78: day deltas are exact integer date arithmetic on both engines;
    // the mean is one integer-ratio division.
    "x78_ship_delay_stats" ->
      """WITH d AS (
        |  SELECT l_returnflag,
        |         date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) AS delay_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT l_returnflag, COUNT(*) AS n_lines,
        |       MIN(delay_d) AS min_delay, MAX(delay_d) AS max_delay,
        |       CAST(SUM(delay_d) AS BIGINT) AS sum_delay,
        |       ROUND(SUM(delay_d) * 1.0 / COUNT(*), 6) AS mean_delay
        |FROM d GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // x79: reuses x13's portable rolling-hash fingerprint CTEs; "shared"
    // is a fp-keyed distinct-doc count, never a pair enumeration.
    "x79_dup_rate_by_source" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """shared AS (
          |  SELECT fp FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) > 1),
          |dup AS (SELECT DISTINCT doc_id FROM fps JOIN shared USING (fp))
          |SELECT source, COUNT(*) AS n_docs,
          |       CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_dup,
          |       CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
          |            * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
          |FROM documents LEFT JOIN dup ON documents.doc_id = dup.doc_id
          |GROUP BY source ORDER BY source""".stripMargin),

    // x80: overlap on DISTINCT (source, fp); the self-join fan-out is
    // |sources(fp)|² per fingerprint — bounded by the fixed source count.
    "x80_source_overlap" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """sf AS (
          |  SELECT DISTINCT dd.source, fps.fp
          |  FROM fps JOIN documents dd ON fps.doc_id = dd.doc_id),
          |sz AS (SELECT source, COUNT(*) AS sz FROM sf GROUP BY source),
          |pair AS (
          |  SELECT a.source AS source_a, b.source AS source_b,
          |         COUNT(*) AS n_common
          |  FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
          |  GROUP BY 1, 2)
          |SELECT source_a, source_b, n_common,
          |       CAST(sa.sz + sb.sz - n_common AS BIGINT) AS n_union,
          |       CAST(n_common * 1000000 // (sa.sz + sb.sz - n_common)
          |            AS BIGINT) AS jaccard_ppm
          |FROM pair
          |JOIN sz sa ON sa.source = pair.source_a
          |JOIN sz sb ON sb.source = pair.source_b
          |ORDER BY source_a, source_b""".stripMargin),

    // x81: same session rule (and exact-gap >= boundary) as the q37/x03
    // oracles — a session histogram over those sessions.
    "x81_session_histogram" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
        |                   OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (SELECT user_id, sid, COUNT(*) AS n_events FROM s GROUP BY 1, 2)
        |SELECT n_events, COUNT(*) AS n_sessions
        |FROM sess GROUP BY n_events ORDER BY n_events""".stripMargin,

    // x82: per-cell χ² contributions only — each value is one fixed
    // arithmetic chain over BIGINT marginals; no cross-engine float sum.
    "x82_length_chi2" ->
      """WITH cells AS (
        |  SELECT lang, LEAST(n_chars // 200, 4) AS band, COUNT(*) AS observed
        |  FROM documents GROUP BY lang, band),
        |m AS (
        |  SELECT lang, band, observed,
        |         SUM(observed) OVER (PARTITION BY lang) AS row_tot,
        |         SUM(observed) OVER (PARTITION BY band) AS col_tot,
        |         SUM(observed) OVER () AS n
        |  FROM cells)
        |SELECT lang, CAST(band AS BIGINT) AS band,
        |       CAST(observed AS BIGINT) AS observed,
        |       ROUND(row_tot * col_tot * 1.0 / n, 6) AS expected,
        |       ROUND((observed - row_tot * col_tot * 1.0 / n)
        |             * (observed - row_tot * col_tot * 1.0 / n)
        |             / (row_tot * col_tot * 1.0 / n), 6) AS chi2_contrib
        |FROM m ORDER BY lang, band""".stripMargin,

    // x83: quantities are whole-valued doubles so the int cast agrees
    // across engines; each Gini is one exact integer-ratio chain.
    "x83_split_gain" ->
      """WITH d AS (
        |  SELECT CASE WHEN l_extendedprice > 95000 THEN 1 ELSE 0 END AS pos,
        |         (CAST(l_quantity AS INTEGER) - 1) // 10 AS band
        |  FROM lineitem),
        |g AS (
        |  SELECT CAST(band AS BIGINT) AS band, COUNT(*) AS n,
        |         CAST(SUM(pos) AS BIGINT) AS n_pos
        |  FROM d GROUP BY band
        |  UNION ALL
        |  SELECT -1, COUNT(*), CAST(SUM(pos) AS BIGINT) FROM d)
        |SELECT band, n, n_pos,
        |       ROUND(1.0 - (n_pos * n_pos + (n - n_pos) * (n - n_pos))
        |                   * 1.0 / (n * n), 6) AS gini
        |FROM g ORDER BY band""".stripMargin,

    // x84: exact rolling distinct via a ≤7-day band join on the (day, user)
    // grid — both engines truncate the UTC timestamp to a date.
    "x84_rolling_active_users" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du),
        |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
        |wau AS (
        |  SELECT d.day, COUNT(DISTINCT a.user_id) AS wau
        |  FROM days d JOIN du a ON a.day BETWEEN d.day - 6 AND d.day
        |  GROUP BY d.day)
        |SELECT CAST(dau.day AS VARCHAR) AS day, dau, wau
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY day""".stripMargin,

    // x85: strictly-prior as-of semantics (q11's c.ts < p.ts rule) then a
    // 24-cell attribution aggregate; cents are rounded per row before the
    // BIGINT sum.
    "x85_attribution_asof" ->
      """WITH attr AS (
        |  SELECT p.event_id, p.value,
        |         MAX(c.ts) AS click_ts
        |  FROM events p JOIN events c
        |    ON p.user_id = c.user_id AND c.ts < p.ts AND c.event_type = 'click'
        |  WHERE p.event_type = 'purchase'
        |  GROUP BY p.event_id, p.value)
        |SELECT CAST(hour(click_ts) AS BIGINT) AS click_hour,
        |       COUNT(*) AS n_purchases,
        |       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM attr GROUP BY click_hour ORDER BY click_hour""".stripMargin,

    // x86: every stage is exact BIGINT modular arithmetic over x13's
    // portable fingerprints; the 0.5 threshold is the integer test
    // 2·common >= union, so no float boundary exists anywhere.
    "x86_minhash_oracle_lsh" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """hs AS (SELECT * FROM (VALUES
          |  (0, 1540483477, 11), (1, 1103515245, 12345), (2, 69069, 7),
          |  (3, 1664525, 1013904223), (4, 22695477, 1), (5, 134775813, 1),
          |  (6, 214013, 2531011), (7, 1597334677, 3)) AS v(j, a, b)),
          |sig AS (
          |  SELECT doc_id, j, MIN((a * fp + b) % 2147483647) AS mh
          |  FROM fps, hs GROUP BY doc_id, j),
          |banded AS (
          |  SELECT doc_id, j // 2 AS band,
          |         STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY j) AS key
          |  FROM sig GROUP BY doc_id, j // 2),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
          |sz AS (SELECT doc_id, COUNT(*) AS s FROM fps GROUP BY doc_id),
          |cm AS (
          |  SELECT doc_a, doc_b, COUNT(*) AS c
          |  FROM cand
          |  JOIN fps fa ON fa.doc_id = cand.doc_a
          |  JOIN fps fb ON fb.doc_id = cand.doc_b AND fb.fp = fa.fp
          |  GROUP BY doc_a, doc_b)
          |SELECT doc_a, doc_b,
          |       ROUND(c * 1.0 / (sa.s + sb.s - c), 6) AS jaccard
          |FROM cm
          |JOIN sz sa ON sa.doc_id = cm.doc_a
          |JOIN sz sb ON sb.doc_id = cm.doc_b
          |WHERE 2 * c >= sa.s + sb.s - c
          |ORDER BY doc_a, doc_b""".stripMargin),

    // x87: ln values quantized once per row to 1e-3 integer units, moments
    // as exact BIGINT sums, statistics as fixed double chains — the
    // regression is bit-portable (regr_slope-style float aggregation is
    // not).
    "x87_zipf_slope" ->
      """WITH toks AS (
        |  SELECT unnest([x FOR x IN string_split(LOWER(text), ' ') IF x <> ''])
        |           AS tok
        |  FROM documents),
        |freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
        |ranked AS (
        |  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS r FROM freq),
        |q AS (
        |  SELECT CAST(ROUND(LN(CAST(r AS DOUBLE)) * 1e3, 0) AS BIGINT) AS x,
        |         CAST(ROUND(LN(CAST(f AS DOUBLE)) * 1e3, 0) AS BIGINT) AS y
        |  FROM ranked),
        |s AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |         CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(y * y) AS BIGINT) AS syy,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM q)
        |SELECT n AS n_vocab,
        |       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
        |       ROUND((sy * 1.0 - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
        |             / n / 1e3, 6) AS intercept,
        |       ROUND((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy)
        |             / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)), 6) AS r2
        |FROM s""".stripMargin,

    // x88: counts exact; z is ONE fixed double chain mirrored
    // op-for-op (and the 1.96 cut reads the unrounded z on both sides).
    "x88_ab_conversion_ztest" ->
      """WITH f AS (
        |  SELECT user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events),
        |pu AS (
        |  SELECT user_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        |  FROM f WHERE rn = 1),
        |arms AS (
        |  SELECT user_id % 2 AS arm, COUNT(*) AS n,
        |         CAST(SUM(conv) AS BIGINT) AS c
        |  FROM pu GROUP BY arm),
        |ab AS (
        |  SELECT CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
        |         CAST(MAX(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS c0,
        |         CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
        |         CAST(MAX(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS c1
        |  FROM arms),
        |zc AS (
        |  SELECT n0, c0, n1, c1,
        |         (c1 * 1.0 / n1 - c0 * 1.0 / n0)
        |           / SQRT((c0 + c1) * 1.0 / (n0 + n1)
        |                  * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
        |                  * (1.0 / n0 + 1.0 / n1)) AS z
        |  FROM ab)
        |SELECT n0, c0, n1, c1, ROUND(z, 6) AS z,
        |       CAST(CASE WHEN ABS(z) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
        |         AS significant
        |FROM zc""".stripMargin,

    // x89: the KS numerator is an exact BIGINT max at every observed value;
    // one division per source at the end.
    "x89_ks_drift" ->
      """WITH d AS (SELECT source, n_chars AS v FROM documents),
        |cnt AS (SELECT source, v, COUNT(*) AS c FROM d GROUP BY source, v),
        |grid AS (
        |  SELECT s.source, sp.v, COALESCE(cnt.c, 0) AS c
        |  FROM (SELECT DISTINCT v FROM d) sp
        |  CROSS JOIN (SELECT DISTINCT source FROM d) s
        |  LEFT JOIN cnt ON cnt.source = s.source AND cnt.v = sp.v),
        |cums AS (
        |  SELECT source, v,
        |         SUM(c) OVER (PARTITION BY source ORDER BY v
        |                      ROWS UNBOUNDED PRECEDING) AS cum_s
        |  FROM grid),
        |ac AS (
        |  SELECT v, SUM(COUNT(*)) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |           AS cum_all
        |  FROM d GROUP BY v),
        |sz AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
        |tt AS (SELECT COUNT(*) AS n FROM d)
        |SELECT cums.source, CAST(MAX(n_s) AS BIGINT) AS n_s,
        |       ROUND(MAX(ABS(cum_s * (n - n_s) - (cum_all - cum_s) * n_s))
        |             * 1.0 / (MAX(n_s) * (MAX(n) - MAX(n_s))), 6) AS ks_d
        |FROM cums
        |JOIN ac ON ac.v = cums.v
        |JOIN sz ON sz.source = cums.source
        |CROSS JOIN tt
        |GROUP BY cums.source ORDER BY cums.source""".stripMargin,

    // x90: the power is spelled exp(0.7*ln x) on both engines; per-source
    // terms quantized once to 1e-9 units, the normalizer an exact BIGINT
    // sum, each weight one division.
    "x90_temperature_mix" ->
      """WITH s AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         COUNT(*) * 1.0 / SUM(COUNT(*)) OVER () AS share
        |  FROM documents GROUP BY source),
        |t AS (
        |  SELECT source, n_docs, share,
        |         CAST(ROUND(EXP(0.7 * LN(share)) * 1e9, 0) AS BIGINT) AS tq
        |  FROM s)
        |SELECT source, n_docs, ROUND(share, 6) AS share,
        |       ROUND(tq * 1.0 / (SELECT CAST(SUM(tq) AS BIGINT) FROM t), 6)
        |         AS weight
        |FROM t ORDER BY source""".stripMargin,

    // x92: same q37 session rule; hour-coverage is exact integer ceil
    // arithmetic, so no interval join exists on either engine.
    "x92_concurrent_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
        |                   OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, us,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sid, MIN(us) AS s_us, MAX(us) + 1800000000 AS e_us
        |  FROM s GROUP BY user_id, sid),
        |hrs AS (
        |  SELECT UNNEST(generate_series((s_us + 3599999999) // 3600000000,
        |                                (e_us + 3599999999) // 3600000000 - 1))
        |           AS hour_idx
        |  FROM sess
        |  WHERE (e_us + 3599999999) // 3600000000 - 1
        |        >= (s_us + 3599999999) // 3600000000)
        |SELECT CAST(hour_idx * 3600000000 AS BIGINT) AS hour_us,
        |       COUNT(*) AS n_open_sessions
        |FROM hrs GROUP BY hour_idx ORDER BY hour_us""".stripMargin,

    // x93: durations are exact integer seconds; quantile_cont == Spark
    // percentile (type-7), the x28-proven pairing.
    "x93_time_to_convert" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(s1.t1) AS t1
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1
        |  GROUP BY e.user_id),
        |d AS (SELECT (t2 - t1) // 1000000 AS secs FROM conv)
        |SELECT COUNT(*) AS n_converted,
        |       ROUND(quantile_cont(secs, 0.25), 6) AS p25,
        |       ROUND(quantile_cont(secs, 0.5), 6) AS p50,
        |       ROUND(quantile_cont(secs, 0.75), 6) AS p75,
        |       ROUND(quantile_cont(secs, 0.95), 6) AS p95
        |FROM d""".stripMargin,

    // x94: the payloads are the UTF-8 text bytes (ASCII-guarded corpus, so
    // ascii(char) == byte) and the stub stats are exact integers — the
    // window offset/overlap/clip arithmetic verifies byte-for-byte.
    "x94_audio_windows" ->
      """WITH b AS (
        |  SELECT doc_id, length(text) AS len, text FROM documents
        |  WHERE doc_id % 4 = 2 AND length(text) > 0),
        |pos AS (
        |  SELECT doc_id, u.i AS p,
        |         ascii(substr(text, CAST(u.i AS INTEGER), 1)) AS v
        |  FROM b, UNNEST(range(1, len + 1)) AS u(i)),
        |w AS (SELECT doc_id, len, UNNEST(range(0, len, 512)) AS s FROM b),
        |ws AS (
        |  SELECT w.doc_id, w.s, COUNT(*) AS w_len, CAST(SUM(pos.v) AS BIGINT)
        |           AS w_sum
        |  FROM w JOIN pos ON pos.doc_id = w.doc_id
        |                 AND pos.p > w.s AND pos.p <= w.s + 1024
        |  GROUP BY w.doc_id, w.s)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |       CAST(SUM(w_len) AS BIGINT) AS covered_bytes,
        |       CAST(SUM(w_sum) AS BIGINT) AS window_mass,
        |       ROUND(SUM(w_sum) * 1.0 / SUM(w_len), 6) AS mean_level
        |FROM ws GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x95: the RRF score is one add of two single-division terms — a fixed
    // chain, not a variable-order float sum; ranks have explicit tiebreaks.
    "x95_rrf_fusion" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars,
        |         CAST(len(list_distinct(
        |           [x FOR x IN string_split(LOWER(text), ' ') IF x <> '']))
        |           AS BIGINT) AS n_distinct
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r_len,
        |         ROW_NUMBER() OVER (ORDER BY n_distinct DESC, doc_id) AS r_div
        |  FROM base)
        |SELECT doc_id, CAST(r_len AS BIGINT) AS r_len,
        |       CAST(r_div AS BIGINT) AS r_div,
        |       ROUND(1.0 / (r_len + 60) + 1.0 / (r_div + 60), 6) AS rrf
        |FROM ranked ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // x96: same edge rule as x43 (distinct within-doc token pairs);
    // degrees and the histogram are exact integers.
    "x96_degree_distribution" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id, x AS tok
        |  FROM documents,
        |       UNNEST([x FOR x IN string_split(LOWER(text), ' ') IF x <> ''])
        |         AS s(x)),
        |edges AS (
        |  SELECT DISTINCT a.tok AS ta, b.tok AS tb
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok),
        |deg AS (
        |  SELECT tok, COUNT(*) AS degree FROM (
        |    SELECT ta AS tok FROM edges UNION ALL SELECT tb FROM edges)
        |  GROUP BY tok)
        |SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_tokens
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,

    // x97: the same first-signup→first-later-purchase rule as x93, emitted
    // per user — mutually verifying with the declarative formulation.
    "x97_cogroup_convert" ->
      """WITH s1 AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(s1.t1) AS t1
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t1
        |  GROUP BY e.user_id)
        |SELECT user_id, CAST((t2 - t1) // 1000000 AS BIGINT) AS lag_secs
        |FROM c ORDER BY user_id""".stripMargin,

    // x98: weights in exact integer milliseconds, values exact cents; the
    // TWA is one final division.
    "x98_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
        |         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS next_us
        |  FROM events),
        |iv AS (
        |  SELECT user_id, cents, (next_us - us) // 1000 AS dur_ms
        |  FROM e WHERE next_us IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |       CAST(SUM(dur_ms) AS BIGINT) AS held_ms,
        |       CAST(SUM(cents * dur_ms) AS BIGINT) AS mass,
        |       ROUND(SUM(cents * dur_ms) * 1.0 / SUM(dur_ms), 6) AS twa_cents
        |FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x99: deciles by integer rank formula; shares exact ppm division.
    "x99_revenue_pareto" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT cents,
        |         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rank,
        |         COUNT(*) OVER () AS n
        |  FROM spend),
        |d AS (
        |  SELECT (rank - 1) * 10 // n AS decile, COUNT(*) AS n_cust,
        |         CAST(SUM(cents) AS BIGINT) AS decile_cents
        |  FROM r GROUP BY decile)
        |SELECT CAST(decile AS BIGINT) AS decile, n_cust, decile_cents,
        |       CAST(decile_cents * 1000000 // (SELECT SUM(decile_cents) FROM d)
        |            AS BIGINT) AS share_ppm
        |FROM d ORDER BY decile""".stripMargin,

    // x100: the whole curation DAG assembled from the proven fragments —
    // x47's gate, q44's dedup key, x86's LSH pair chain, x21's benchmark
    // rule — so stage ORDER and survivor tie-breaks verify end to end.
    "x100_curation_pipeline" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """hs AS (SELECT * FROM (VALUES
          |  (0, 1540483477, 11), (1, 1103515245, 12345), (2, 69069, 7),
          |  (3, 1664525, 1013904223), (4, 22695477, 1), (5, 134775813, 1),
          |  (6, 214013, 2531011), (7, 1597334677, 3)) AS v(j, a, b)),
          |sig AS (
          |  SELECT doc_id, j, MIN((a * fp + b) % 2147483647) AS mh
          |  FROM fps, hs GROUP BY doc_id, j),
          |banded AS (
          |  SELECT doc_id, j // 2 AS band,
          |         STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY j) AS key
          |  FROM sig GROUP BY doc_id, j // 2),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
          |szf AS (SELECT doc_id, COUNT(*) AS s FROM fps GROUP BY doc_id),
          |cm AS (
          |  SELECT doc_a, doc_b, COUNT(*) AS c
          |  FROM cand
          |  JOIN fps fa ON fa.doc_id = cand.doc_a
          |  JOIN fps fb ON fb.doc_id = cand.doc_b AND fb.fp = fa.fp
          |  GROUP BY doc_a, doc_b),
          |losers AS (
          |  SELECT DISTINCT cm.doc_b AS doc_id
          |  FROM cm JOIN szf sa ON sa.doc_id = cm.doc_a
          |          JOIN szf sb ON sb.doc_id = cm.doc_b
          |  WHERE 2 * c >= sa.s + sb.s - c),
          |tok AS (
          |  SELECT doc_id, x AS tok FROM documents,
          |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
          |rep AS (
          |  SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_tok FROM (
          |    SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
          |  GROUP BY doc_id),
          |gated AS (
          |  SELECT dd.doc_id, dd.source, dd.n_chars, lower(dd.text) AS norm
          |  FROM documents dd JOIN rep ON rep.doc_id = dd.doc_id
          |  WHERE dd.n_chars BETWEEN 100 AND 500
          |    AND rep.max_c * 5 < rep.n_tok
          |    AND (list_contains([x FOR x IN string_split(LOWER(dd.text),' ')
          |                        IF x <> ''], 'the')
          |         OR list_contains([x FOR x IN string_split(LOWER(dd.text),' ')
          |                           IF x <> ''], 'a'))),
          |deduped AS (
          |  SELECT * FROM (
          |    SELECT *, ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id)
          |             AS rn
          |    FROM gated) WHERE rn = 1),
          |surv AS (
          |  SELECT d.source, d.n_chars FROM deduped d
          |  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)
          |    AND NOT EXISTS (SELECT 1 FROM documents b
          |                    WHERE b.doc_id % 97 = 0
          |                      AND lower(b.text) = d.norm))
          |SELECT source, COUNT(*) AS n_docs,
          |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
          |FROM surv GROUP BY source ORDER BY source""".stripMargin),

    // x101: the same rolling-hash stream as x13 with POSITIONS kept; the
    // boundary rule and gaps are exact integers. Spark's posexplode is
    // 0-based and the oracle's pos is 1-based — gaps are differences, so
    // the offset cancels.
    "x101_cdc_boundaries" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" +
        """fpos AS (
          |  SELECT doc_id, pos,
          |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
          |      % 1000000007 * 131 + c0) % 1000000007 AS fp
          |  FROM coded WHERE c4 IS NOT NULL),
          |b AS (SELECT doc_id, pos FROM fpos WHERE fp % 64 = 0),
          |g AS (
          |  SELECT doc_id,
          |         pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
          |  FROM b)
          |SELECT CAST(gap AS BIGINT) AS gap, COUNT(*) AS n_chunks
          |FROM g WHERE gap IS NOT NULL
          |GROUP BY gap ORDER BY gap""".stripMargin),

    // x102: x86's candidate chain with the asymmetric cut 5·common ≥
    // 4·|side| — integer-exact on both engines.
    "x102_containment_pairs" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """hs AS (SELECT * FROM (VALUES
          |  (0, 1540483477, 11), (1, 1103515245, 12345), (2, 69069, 7),
          |  (3, 1664525, 1013904223), (4, 22695477, 1), (5, 134775813, 1),
          |  (6, 214013, 2531011), (7, 1597334677, 3)) AS v(j, a, b)),
          |sig AS (
          |  SELECT doc_id, j, MIN((a * fp + b) % 2147483647) AS mh
          |  FROM fps, hs GROUP BY doc_id, j),
          |banded AS (
          |  SELECT doc_id, j // 2 AS band,
          |         STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY j) AS key
          |  FROM sig GROUP BY doc_id, j // 2),
          |cand AS (
          |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |  FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
          |sz AS (SELECT doc_id, COUNT(*) AS s FROM fps GROUP BY doc_id),
          |cm AS (
          |  SELECT doc_a, doc_b, COUNT(*) AS c
          |  FROM cand
          |  JOIN fps fa ON fa.doc_id = cand.doc_a
          |  JOIN fps fb ON fb.doc_id = cand.doc_b AND fb.fp = fa.fp
          |  GROUP BY doc_a, doc_b)
          |SELECT doc_a, doc_b,
          |       ROUND(c * 1.0 / sa.s, 6) AS contain_a,
          |       ROUND(c * 1.0 / sb.s, 6) AS contain_b
          |FROM cm
          |JOIN sz sa ON sa.doc_id = cm.doc_a
          |JOIN sz sb ON sb.doc_id = cm.doc_b
          |WHERE 5 * c >= 4 * sa.s OR 5 * c >= 4 * sb.s
          |ORDER BY doc_a, doc_b""".stripMargin),

    // x109: the oracle is the EXHAUSTIVE inverted-index all-pairs
    // containment (ground truth) — matching it hash-for-hash is the proof
    // that the Spark side's prefix-filter candidate rule misses nothing.
    "x109_containment_prefix" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """sz AS (SELECT doc_id, COUNT(*) AS s FROM fps GROUP BY doc_id),
          |cm AS (
          |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id, COUNT(*) AS c
          |  FROM fps a JOIN fps b ON b.fp = a.fp AND b.doc_id <> a.doc_id
          |  GROUP BY 1, 2)
          |SELECT contained_id, container_id,
          |       ROUND(c * 1.0 / sa.s, 6) AS containment
          |FROM cm JOIN sz sa ON sa.doc_id = cm.contained_id
          |WHERE 5 * c >= 4 * sa.s
          |ORDER BY contained_id, container_id""".stripMargin),

    // x110–x112: accuracy matrices for the hash-seeded/sketch operators.
    // The oracle states the THEOREM side: planted exact twins must all be
    // found (recall 100% — identical inputs collide deterministically in
    // every chain), and every sketch-accuracy flag must be 1. The Spark
    // side computes `found`/`ok` by actually running the engine chains, so
    // any banding/vote/assignment/sketch regression breaks the hash match.
    "x110_neardup_recall_matrix" ->
      """WITH slice AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |tok AS (SELECT doc_id,
        |  len([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS nt FROM slice)
        |SELECT * FROM (VALUES
        |  ('x01_minhash_lsh',
        |   (SELECT COUNT(*) FROM slice), (SELECT COUNT(*) FROM slice)),
        |  ('x07_simhash',
        |   (SELECT COUNT(*) FROM tok WHERE nt >= 1),
        |   (SELECT COUNT(*) FROM tok WHERE nt >= 1)),
        |  ('x08_ngram_jaccard',
        |   (SELECT COUNT(*) FROM slice), (SELECT COUNT(*) FROM slice))
        |) AS m(method, found_pairs, planted_pairs) ORDER BY method""".stripMargin,

    "x111_ann_recall_matrix" ->
      """WITH slice AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
        |nz AS (SELECT COUNT(*) AS c FROM slice
        |       WHERE list_dot_product(embedding, embedding) > 0)
        |SELECT * FROM (VALUES
        |  ('x09_hyperplane_lsh', (SELECT c FROM nz), (SELECT c FROM nz)),
        |  ('x18_ivf_same_cell',
        |   (SELECT COUNT(*) FROM slice), (SELECT COUNT(*) FROM slice)),
        |  ('x18_nprobe1_twin_top1', (SELECT c FROM nz), (SELECT c FROM nz)),
        |  ('x18_nprobe2_twin_top1', (SELECT c FROM nz), (SELECT c FROM nz)),
        |  ('x18_nprobe4_twin_top1', (SELECT c FROM nz), (SELECT c FROM nz)),
        |  ('x18_probe_cost_monotone', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('x18_cluster_recall20', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('x310_cluster_recall20', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('x310_pq_same_code',
        |   (SELECT COUNT(*) FROM slice), (SELECT COUNT(*) FROM slice))
        |) AS m(method, found_pairs, planted_pairs) ORDER BY method""".stripMargin,

    "x112_sketch_error_matrix" ->
      """WITH ex AS (SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS e
        |            FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(e) AS BIGINT) AS v FROM ex)
        |SELECT * FROM (VALUES
        |  ('x108_tiled_near_direct', (SELECT v FROM t), CAST(1 AS BIGINT)),
        |  ('x108_within_5pct',     (SELECT v FROM t), CAST(1 AS BIGINT)),
        |  ('x15_hll_within_5pct',  (SELECT v FROM t), CAST(1 AS BIGINT)),
        |  ('x15_p50_rank_ok',      (SELECT v FROM t), CAST(1 AS BIGINT))
        |) AS m(metric, exact_value, ok) ORDER BY metric""".stripMargin,

    // x103: every card value is an exact BIGINT over one corpus scan
    // family.
    "x103_dataset_card" ->
      """WITH toks AS (
        |  SELECT doc_id, x AS tok FROM documents,
        |    UNNEST([x FOR x IN string_split(LOWER(text),' ') IF x <> '']) AS u(x)),
        |card AS (
        |  SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
        |  UNION ALL SELECT 'n_langs', COUNT(DISTINCT lang) FROM documents
        |  UNION ALL SELECT 'n_sources', COUNT(DISTINCT source) FROM documents
        |  UNION ALL SELECT 'n_empty',
        |    CAST(SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM documents
        |  UNION ALL SELECT 'n_tokens', COUNT(*) FROM toks
        |  UNION ALL SELECT 'vocab', COUNT(DISTINCT tok) FROM toks
        |  UNION ALL SELECT 'n_exact_dups',
        |    CAST(SUM(n - 1) AS BIGINT) FROM (
        |      SELECT COUNT(*) AS n FROM documents GROUP BY lower(text)))
        |SELECT metric, CAST(value AS BIGINT) AS value
        |FROM card ORDER BY metric""".stripMargin,

    // x77: the z-test is evaluated in exact integer arithmetic on BOTH
    // sides — (c·n − S)²·(n−1) > 4·n·(SS·n − S²) — so the flag count is
    // float-free (DuckDB runs it in HUGEINT, Spark in BIGINT; equal values,
    // Features.scala documents the BIGINT headroom).
    "x77_anomaly_zscore" ->
      """WITH cu AS (
        |  SELECT event_type, user_id, COUNT(*) AS c
        |  FROM events GROUP BY event_type, user_id),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS ss
        |  FROM cu GROUP BY event_type)
        |SELECT cu.event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(SUM(CASE WHEN (c * n - s) * (c * n - s) * (n - 1)
        |                          > 4 * n * (ss * n - s * s)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |       MAX(c) AS max_c
        |FROM cu JOIN st ON cu.event_type = st.event_type
        |GROUP BY cu.event_type ORDER BY cu.event_type""".stripMargin,

    // x113: bucketing is a LAYOUT property — the join's rows are identical
    // to the plain shuffled join, so the oracle is the ordinary SQL join.
    // The co-location claim itself (no Exchange on either side) is a
    // physical-plan fact DuckDB cannot witness; PlanSpec pins it.
    "x113_colocated_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |       CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // x118: the Q18 shape as the IN-free formulation both planners prefer —
    // aggregate first, HAVING on the exact DECIMAL sum, then join detail.
    "x118_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // x119: ground truth is the naive a<b canonical-edge three-way self-join;
    // the engine's degree-oriented count must equal it exactly — orientation
    // changes the join sizes, never the triangle total.
    "x119_triangle_count" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |nodes AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT CAST(COUNT(*) AS BIGINT)
        |        FROM e e1 JOIN e e2 ON e2.u = e1.v
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""".stripMargin,

    // x120: x13's fingerprint CTEs kept as a per-window MULTISET (no
    // DISTINCT — repeated spans inside one doc count every occurrence);
    // shared fps are those seen in >1 distinct doc.
    "x120_span_dup_stats" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" +
        """wins AS (
          |  SELECT doc_id,
          |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
          |      % 1000000007 * 131 + c0) % 1000000007 AS fp
          |  FROM coded WHERE c4 IS NOT NULL),
          |shared AS (SELECT fp FROM wins GROUP BY fp
          |           HAVING COUNT(DISTINCT doc_id) > 1)
          |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
          |       CAST(COUNT(*) FILTER (WHERE s.fp IS NOT NULL) AS BIGINT) AS n_dup,
          |       CAST(COUNT(*) FILTER (WHERE s.fp IS NOT NULL) * 1000000
          |            // COUNT(*) AS BIGINT) AS dup_ppm
          |FROM wins w LEFT JOIN shared s USING (fp)
          |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin),

    // x122: the oracle states the exactness THEOREM, not the mechanism —
    // tile-popcount sums must equal plain COUNT(DISTINCT) per day and per
    // type (n_users_tiles == n_users_direct by construction on the oracle
    // side; the hash match proves the engine's bit_or/bit_count tiles
    // reproduce exact distincts). DuckDB cannot run the mechanism verbatim:
    // its << raises on shift-by-63 rather than wrapping to the sign bit.
    "x122_bitmap_distinct" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         COUNT(DISTINCT user_id) AS d
        |  FROM events GROUP BY event_type, day),
        |dagg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(d) AS BIGINT) AS sum_daily
        |  FROM daily GROUP BY event_type),
        |direct AS (
        |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n_days, sum_daily,
        |       n AS n_users_tiles, n AS n_users_direct
        |FROM dagg JOIN direct USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // x123: one conditional-aggregate row per declared rule; the FK rule is
    // the NOT-EXISTS count. Pass flags restated as 0/1 BIGINTs.
    "x123_expectation_checks" ->
      """WITH o AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS v1,
        |    SUM(CASE WHEN NOT (o_totalprice <= 400000) THEN 1 ELSE 0 END) AS v2,
        |    SUM(CASE WHEN NOT (o_orderstatus IN ('F','O','P')) THEN 1 ELSE 0 END) AS v3,
        |    SUM(CASE WHEN NOT (o_orderdate < TIMESTAMP '2001-01-01') THEN 1 ELSE 0 END) AS v4,
        |    SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM customer c
        |                              WHERE c.c_custkey = o_custkey)
        |        THEN 1 ELSE 0 END) AS v5
        |  FROM orders),
        |l AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 45) THEN 1 ELSE 0 END) AS v1,
        |    SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.1) THEN 1 ELSE 0 END) AS v2
        |  FROM lineitem),
        |rows_out(table_name, rule_id, n_rows, n_violations) AS (
        |  SELECT 'orders', 'price_positive', n, v1 FROM o
        |  UNION ALL SELECT 'orders', 'price_under_400k', n, v2 FROM o
        |  UNION ALL SELECT 'orders', 'status_domain', n, v3 FROM o
        |  UNION ALL SELECT 'orders', 'date_before_2001', n, v4 FROM o
        |  UNION ALL SELECT 'orders', 'custkey_in_customer', n, v5 FROM o
        |  UNION ALL SELECT 'lineitem', 'qty_1_to_45', n, v1 FROM l
        |  UNION ALL SELECT 'lineitem', 'discount_0_to_01', n, v2 FROM l)
        |SELECT table_name, rule_id, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM rows_out ORDER BY table_name, rule_id""".stripMargin,

    // x124: DuckDB's ordered STRING_AGG is the direct statement of the
    // sorted-collect + join the engine runs.
    "x124_string_agg_ordered" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ','
        |                  ORDER BY o_orderkey) AS order_keys
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // x125: the literal EXISTS / NOT EXISTS formulation — the oracle keeps
    // the correlated form; the engine must reach the same rows through its
    // decorrelated semi/anti joins.
    "x125_sole_late_supplier" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |         date_diff('day', CAST(o_orderdate AS DATE),
        |                   CAST(l_shipdate AS DATE)) > 80 AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT s_suppkey, s_name, numwait FROM (
        |  SELECT l1.sk, CAST(COUNT(DISTINCT l1.ok) AS BIGINT) AS numwait
        |  FROM li l1
        |  WHERE l1.late
        |    AND EXISTS (SELECT 1 FROM li l2
        |                WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |    AND NOT EXISTS (SELECT 1 FROM li l3
        |                    WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late)
        |  GROUP BY l1.sk) w
        |JOIN supplier ON sk = s_suppkey
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,

    // x126: the budget line restated as the same cross-multiplied integer
    // inequality; DuckDB windows are identical.
    "x126_quality_mass_cap" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n_chars) OVER (PARTITION BY source) AS total
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS mass_total,
        |       CAST(SUM(CASE WHEN 2 * (cum - n_chars) < total
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN 2 * (cum - n_chars) < total
        |                     THEN n_chars ELSE 0 END) AS BIGINT) AS mass_kept
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // x127: every survivorship rule restated from first principles — the
    // overall latest as a window rn=1, the scoped latests as a filtered
    // window / filtered MAX; max_by's struct order must agree with these.
    "x127_golden_record" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
        |         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |lt AS (SELECT user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY us DESC, event_id DESC) AS rn
        |       FROM e),
        |lp AS (SELECT user_id, cents,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY us DESC, event_id DESC) AS rn
        |       FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.n_events, lt.event_type AS last_type,
        |       lp.cents AS last_purchase_cents, le.us AS last_error_us
        |FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        |      FROM e GROUP BY user_id) c
        |LEFT JOIN (SELECT user_id, event_type FROM lt WHERE rn = 1) lt
        |  USING (user_id)
        |LEFT JOIN (SELECT user_id, cents FROM lp WHERE rn = 1) lp
        |  USING (user_id)
        |LEFT JOIN (SELECT user_id, MAX(us) AS us FROM e
        |           WHERE event_type = 'error' GROUP BY user_id) le
        |  USING (user_id)
        |ORDER BY c.user_id""".stripMargin,

    // x128: moments widen to HUGEINT natively (DuckDB) — exactly equal to
    // the engine's DECIMAL(38,0) sums; the r chain is the identical IEEE
    // double expression on both sides.
    "x128_corr_matrix" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(l_quantity * 10, 0) AS BIGINT) AS q,
        |         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c,
        |         CAST(ROUND(l_discount * 1000, 0) AS BIGINT) AS d
        |  FROM lineitem),
        |m AS (
        |  SELECT COUNT(*) AS n, SUM(q) AS sq, SUM(c) AS sc, SUM(d) AS sd,
        |         SUM(q*q) AS sqq, SUM(c*c) AS scc, SUM(d*d) AS sdd,
        |         SUM(q*c) AS sqc, SUM(q*d) AS sqd, SUM(c*d) AS scd
        |  FROM b)
        |SELECT var_x, var_y, CAST(n AS BIGINT) AS n, ROUND(r, 6) AS r FROM (
        |  SELECT 'quantity' AS var_x, 'price' AS var_y, n,
        |    (CAST(n AS DOUBLE)*CAST(sqc AS DOUBLE) - CAST(sq AS DOUBLE)*CAST(sc AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE)*CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE))
        |         * (CAST(n AS DOUBLE)*CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))) AS r
        |  FROM m
        |  UNION ALL
        |  SELECT 'quantity', 'discount', n,
        |    (CAST(n AS DOUBLE)*CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE)*CAST(sd AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE)*CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE))
        |         * (CAST(n AS DOUBLE)*CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE)))
        |  FROM m
        |  UNION ALL
        |  SELECT 'price', 'discount', n,
        |    (CAST(n AS DOUBLE)*CAST(scd AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sd AS DOUBLE))
        |    / SQRT((CAST(n AS DOUBLE)*CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))
        |         * (CAST(n AS DOUBLE)*CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE)))
        |  FROM m) t
        |ORDER BY var_x, var_y""".stripMargin,

    // x129: same pair window + floor-DIV credit; the direct channel is the
    // NOT-EXISTS remainder.
    "x129_multi_touch" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, event_id AS p_id, us AS p_us FROM e
        |      WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_type AS channel, us AS t_us FROM e
        |      WHERE event_type <> 'purchase'),
        |pairs AS (
        |  SELECT p.p_id, t.channel FROM p JOIN t USING (user_id)
        |  WHERE t.t_us >= p.p_us - 3600000000 AND t.t_us < p.p_us),
        |counted AS (
        |  SELECT channel, p_id, COUNT(*) OVER (PARTITION BY p_id) AS n_touches
        |  FROM pairs),
        |credited AS (
        |  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches_total,
        |         CAST(SUM(1000000 // n_touches) AS BIGINT) AS credit_ppm
        |  FROM counted GROUP BY channel),
        |direct AS (
        |  SELECT 'direct' AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches_total,
        |         CAST(COUNT(*) * 1000000 AS BIGINT) AS credit_ppm
        |  FROM p WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.p_id = p.p_id))
        |SELECT * FROM credited UNION ALL SELECT * FROM direct
        |ORDER BY channel""".stripMargin,

    // x130: identical rank/index arithmetic; the pooled rank is a plain
    // window here (DuckDB is single-node — the engine side is what must
    // avoid the single-partition sort).
    "x130_quantile_normalize" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS r,
        |    COUNT(*) OVER (PARTITION BY source) AS n_s,
        |    (SELECT COUNT(*) FROM d) AS n_total
        |  FROM d),
        |pooled AS (
        |  SELECT n_chars AS norm_chars,
        |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS g
        |  FROM d)
        |SELECT r.doc_id, r.source, r.n_chars, pooled.norm_chars
        |FROM (SELECT doc_id, source, n_chars,
        |        CASE WHEN n_s = 1 THEN (n_total + 1) // 2
        |             ELSE 1 + (r - 1) * (n_total - 1) // (n_s - 1) END AS g
        |      FROM r) r
        |JOIN pooled USING (g)
        |ORDER BY r.doc_id""".stripMargin,

    // x131: moments widen to HUGEINT natively; identical double chain.
    "x131_group_trend" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |         (us - MIN(us) OVER (PARTITION BY event_type)) // 1000000 AS x,
        |         cents AS y
        |  FROM e),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x*x) AS sxx, SUM(x*y) AS sxy
        |  FROM b GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6)
        |    AS slope_cents_per_s,
        |  ROUND((CAST(sy AS DOUBLE)
        |         - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
        |              - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |           / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
        |              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |           * CAST(sx AS DOUBLE))
        |        / CAST(n AS DOUBLE), 6) AS intercept_cents
        |FROM m ORDER BY event_type""".stripMargin,

    // x132: entry prefix restated as rn ≤ 3 + ordered string_agg; the
    // same (count desc, path) top-20 total order.
    "x132_top_journeys" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |         string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // x133: identical discrete-index fences and clamp; only the mean
    // divides, as the same double chain.
    "x133_winsorized_stats" ->
      """WITH c AS (
        |  SELECT event_type, event_id,
        |         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY cents, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM c),
        |f AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN cents END) AS lo,
        |    MAX(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN cents END) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       MAX(lo) AS lo_cents, MAX(hi) AS hi_cents,
        |       CAST(SUM(GREATEST(lo, LEAST(hi, cents))) AS BIGINT) AS wsum_cents,
        |       ROUND(CAST(SUM(GREATEST(lo, LEAST(hi, cents))) AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE), 6) AS wmean_cents
        |FROM c JOIN f USING (event_type)
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,

    // x135: identical canonical-pair counts + ppm floor arithmetic; both
    // rule directions from one a<b count.
    "x135_association_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM lineitem),
        |item AS (SELECT l_partkey AS p, COUNT(*) AS c_item FROM li GROUP BY p),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS c_ab
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY pa, pb HAVING COUNT(*) >= 3),
        |dirs AS (
        |  SELECT pa AS ante, pb AS cons, c_ab FROM pairs
        |  UNION ALL SELECT pb AS ante, pa AS cons, c_ab FROM pairs)
        |SELECT ante, cons, c_ab, ia.c_item AS c_a, ib.c_item AS c_b,
        |  CAST(c_ab * 1000000 // ia.c_item AS BIGINT) AS conf_ppm,
        |  CAST(c_ab * n_baskets * 1000000 // (ia.c_item * ib.c_item) AS BIGINT)
        |    AS lift_ppm
        |FROM dirs
        |JOIN item ia ON ia.p = ante
        |JOIN item ib ON ib.p = cons
        |CROSS JOIN nb
        |ORDER BY lift_ppm DESC, ante, cons LIMIT 20""".stripMargin,

    // x136: identical cents rollup; shares restated as window sums with
    // the same floor-DIV ppm.
    "x136_hierarchy_shares" ->
      """WITH rev AS (
        |  SELECT r_name, n_name, COUNT(*) AS n_orders,
        |         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(cents AS BIGINT) AS cents,
        |  CAST(cents * 1000000 // SUM(cents) OVER (PARTITION BY r_name)
        |       AS BIGINT) AS nation_in_region_ppm,
        |  CAST(SUM(cents) OVER (PARTITION BY r_name) * 1000000
        |       // SUM(cents) OVER () AS BIGINT) AS region_in_global_ppm
        |FROM rev ORDER BY r_name, n_name""".stripMargin,

    // x137: the theorem form again (x122's rule): tile-window popcounts
    // must equal COUNT(DISTINCT) over the raw trailing-7-day join.
    "x137_sliding_distinct" ->
      """WITH td AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events),
        |e AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
        |  FROM events)
        |SELECT td.event_type, td.day,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS d7_users
        |FROM td JOIN e ON e.event_type = td.event_type
        |  AND e.day BETWEEN td.day - 6 AND td.day
        |GROUP BY td.event_type, td.day
        |ORDER BY td.event_type, td.day""".stripMargin,

    // x138: same stats via json_extract + TRY_CAST (the NULL-not-error
    // policy the ADVICE r5 note pinned for x106's oracle).
    "x138_variant_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |         TRY_CAST(json_extract_string(props, '$.absent') AS BIGINT) AS miss
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
        |       CAST(COUNT(k) AS BIGINT) AS parsed,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       MAX(k) AS max_k,
        |       CAST(SUM(CASE WHEN miss IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_no_path
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    // x139: identical planted-twin corpus + split hash; pair expansion
    // restated as an explicit ordered self-join over each group's split
    // set.
    "x139_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000003, text FROM documents WHERE doc_id % 7 = 0),
        |s AS (
        |  SELECT LOWER(text) AS norm,
        |    CASE WHEN ((doc_id % 100000000) * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN ((doc_id % 100000000) * 2654435761) % 1000 < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM corpus),
        |g AS (
        |  SELECT norm, COUNT(*) AS n_members FROM s GROUP BY norm),
        |gs AS (
        |  SELECT DISTINCT norm, split FROM s),
        |leaks AS (
        |  SELECT a.norm, a.split AS split_a, b.split AS split_b
        |  FROM gs a JOIN gs b ON a.norm = b.norm AND a.split < b.split)
        |SELECT split_a, split_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_leaking_groups,
        |       CAST(SUM(n_members) AS BIGINT) AS n_leaking_docs
        |FROM leaks JOIN g USING (norm)
        |GROUP BY split_a, split_b
        |ORDER BY split_a, split_b""".stripMargin,

    // x140: the same 2-round Lloyd iteration, restated: distances as the
    // identical left-to-right list_sum fold (bit-identical to Spark's
    // aggregate/zip_with), centroid components ROUNDed at 6 dp after AVG so
    // round-2 inputs match bit for bit, argmin via (d2, cell) row_number.
    "x140_kmeans_cells" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |ev AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
        |              UNNEST(range(1, len(embedding) + 1)) AS pos FROM e),
        |c0 AS (SELECT vec_id AS cell, [CAST(x AS DOUBLE) FOR x IN embedding] AS ce
        |       FROM embeddings WHERE vec_id < 8),
        |d1 AS (SELECT e.vec_id, c.cell,
        |         ROUND(list_sum([(c.ce[i] - CAST(e.embedding[i] AS DOUBLE))
        |                       * (c.ce[i] - CAST(e.embedding[i] AS DOUBLE))
        |                         FOR i IN generate_series(1, 64)]), 6) AS d2
        |       FROM e, c0 c),
        |a1 AS (SELECT vec_id, cell FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |                                      ORDER BY d2, cell) AS rn
        |         FROM d1) WHERE rn = 1),
        |m AS (SELECT a1.cell, ev.pos, ROUND(AVG(ev.v), 6) AS cv
        |      FROM a1 JOIN ev USING (vec_id) GROUP BY a1.cell, ev.pos),
        |c1 AS (SELECT cell, list(cv ORDER BY pos) AS ce FROM m GROUP BY cell),
        |d2s AS (SELECT e.vec_id, c.cell,
        |          ROUND(list_sum([(c.ce[i] - CAST(e.embedding[i] AS DOUBLE))
        |                        * (c.ce[i] - CAST(e.embedding[i] AS DOUBLE))
        |                          FOR i IN generate_series(1, 64)]), 6) AS d2
        |        FROM e, c1 c),
        |a2 AS (SELECT vec_id, cell, d2 FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |                                      ORDER BY d2, cell) AS rn
        |         FROM d2s) WHERE rn = 1)
        |SELECT CAST(cell AS BIGINT) AS cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       ROUND(SUM(CAST(ROUND(d2 * 1e6, 0) AS BIGINT)) * 1.0
        |             / (COUNT(*) * 1e6), 6) AS mean_d2
        |FROM a2 GROUP BY cell ORDER BY cell""".stripMargin,

    // x141: fixed-codebook PQ encode — per (vector, subspace) argmin over
    // the 8 codewords, subvector slices addressed as sub*16+i.
    "x141_pq_encode" ->
      """WITH cb AS (SELECT vec_id AS code, embedding AS ce
        |            FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT UNNEST(range(0, 4)) AS sub),
        |d AS (SELECT e.vec_id, s.sub, cb.code,
        |        ROUND(list_sum([
        |          (CAST(cb.ce[s.sub * 16 + i] AS DOUBLE)
        |             - CAST(e.embedding[s.sub * 16 + i] AS DOUBLE))
        |        * (CAST(cb.ce[s.sub * 16 + i] AS DOUBLE)
        |             - CAST(e.embedding[s.sub * 16 + i] AS DOUBLE))
        |            FOR i IN generate_series(1, 16)]), 6) AS d2
        |      FROM embeddings e, s, cb),
        |a AS (SELECT vec_id, sub, code, d2 FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
        |                                     ORDER BY d2, code) AS rn
        |        FROM d) WHERE rn = 1)
        |SELECT CAST(sub AS BIGINT) AS subspace, code,
        |       CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       ROUND(SUM(CAST(ROUND(d2 * 1e6, 0) AS BIGINT)) * 1.0
        |             / (COUNT(*) * 1e6), 6) AS mean_err
        |FROM a GROUP BY sub, code ORDER BY subspace, code""".stripMargin,

    // x142: BM25 with the +1 idf form (strictly positive), k1=1.2 b=0.75;
    // argmax per doc under (bm25 DESC, tok) — q48's statistics plus
    // document-length normalization.
    "x142_bm25_topterm" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS tok
        |              FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |       WHERE tok <> '' GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks
        |       WHERE tok <> '' GROUP BY doc_id),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |st AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
        |scored AS (SELECT tf.doc_id, tf.tok,
        |             ROUND(LN((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |                   (tf.tf * 2.2) / (tf.tf + 1.2 *
        |                     (0.25 + 0.75 * dl.dl / st.avgdl)), 6) AS bm25
        |           FROM tf JOIN dl USING (doc_id) JOIN df USING (tok)
        |           CROSS JOIN st WHERE tf.doc_id < 50),
        |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                      ORDER BY bm25 DESC, tok) AS rn
        |         FROM scored)
        |SELECT doc_id, tok, bm25 FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // x121: integer cents make every median a multiple of 0.5, every MAD a
    // multiple of 0.25 — exactly representable, so `dev > 3*mad` is
    // float-tolerance-free (Features.scala x121 doc).
    "x121_mad_outliers" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (SELECT o_orderpriority, quantile_cont(cents, 0.5) AS med
        |      FROM c GROUP BY o_orderpriority),
        |d AS (SELECT c.o_orderpriority, ABS(cents - med) AS dev, med
        |      FROM c JOIN m USING (o_orderpriority)),
        |md AS (SELECT o_orderpriority, quantile_cont(dev, 0.5) AS mad
        |       FROM d GROUP BY o_orderpriority)
        |SELECT d.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       MAX(med) AS med_cents, MAX(mad) AS mad_cents,
        |       CAST(SUM(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers
        |FROM d JOIN md USING (o_orderpriority)
        |GROUP BY d.o_orderpriority ORDER BY d.o_orderpriority""".stripMargin
  )
}
