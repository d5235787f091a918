package graft

/** DuckDB oracle SQL, round-10 fourth batch (x242+): the Hilbert-curve
  * layout audit (the SAME 8-level reflect/swap arithmetic the engine
  * chains, rendered as nested SELECTs — [[graft.engine.Hilbert]]), and the
  * statistical-protocol / search keys added alongside it. Everything is
  * exact integer arithmetic end to end.
  */
object OracleSqlRound10d {

  def round10d: Map[String, String] = Map(

    // x242: identical Hilbert arithmetic (Hilbert.nestedSql renders `//`
    // for DuckDB, the engine chains the same steps with `DIV`) over the
    // same 8-bit quantization x150 uses.
    "x242_hilbert_layout" -> {
      val base =
        """SELECT CAST((l_partkey * 256) // (maxp + 1) AS INT) AS px,
          |       CAST((l_suppkey * 256) // (maxs + 1) AS INT) AS py
          |FROM lineitem CROSS JOIN
          |     (SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs
          |      FROM lineitem) m""".stripMargin
      s"""SELECT CAST(hd8 // 256 AS BIGINT) AS tile, COUNT(*) AS n_rows,
        |       CAST(MIN(px) AS BIGINT) AS min_px,
        |       CAST(MAX(px) AS BIGINT) AS max_px,
        |       CAST(MIN(py) AS BIGINT) AS min_py,
        |       CAST(MAX(py) AS BIGINT) AS max_py
        |FROM (${graft.engine.Hilbert.nestedSql(base)})
        |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // x243: positions materialize only in the oracle (unnest + subscripts
    // + self-join); the engine's in-map adjacent-bigram transform computes
    // the same pairs without ever forming a position table.
    "x243_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '')
        |           AS ts
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p
        |  FROM toks),
        |df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY 1),
        |top10 AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 10),
        |pairs AS (
        |  SELECT a.doc_id, a.tok AS t1, b.tok AS t2
        |  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1),
        |succ AS (
        |  SELECT t1, t2, COUNT(*) AS cnt,
        |         ROW_NUMBER() OVER (PARTITION BY t1
        |                            ORDER BY COUNT(*) DESC, t2) AS rn
        |  FROM pairs WHERE t1 IN (SELECT tok FROM top10) GROUP BY 1, 2),
        |phrases AS (
        |  SELECT s.t1, s.t2, s.cnt, t.df AS df1
        |  FROM succ s JOIN top10 t ON t.tok = s.t1 WHERE s.rn = 1),
        |hits AS (
        |  SELECT ph.t1, ph.t2, ph.df1, ph.cnt, p.doc_id
        |  FROM pairs p JOIN phrases ph ON p.t1 = ph.t1 AND p.t2 = ph.t2)
        |SELECT t1 || ' ' || t2 AS phrase, CAST(df1 AS BIGINT) AS df1,
        |       COUNT(DISTINCT doc_id) AS n_docs,
        |       CAST(MIN(cnt) AS BIGINT) AS n_occ,
        |       CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM hits GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // x244: the 16 replicate branches are GENERATED from the same shared
    // thresholds/mixers the engine folds (graft.queries.StatProtocol).
    "x244_poisson_bootstrap" -> {
      import graft.queries.StatProtocol._
      val sels = (0 until bootstrapReps).map { r =>
        val ladder = poissonLadderSql("h")
        s"""SELECT $r AS rep, SUM(w) AS n_eff, SUM(w * cents) AS sum_cents
          |FROM (SELECT $ladder AS w, cents FROM (
          |  SELECT ${poissonHashSql("o_orderkey", r)} AS h,
          |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
          |  FROM orders))""".stripMargin
      }
      s"""SELECT CAST(rep AS BIGINT) AS rep, CAST(n_eff AS BIGINT) AS n_eff,
        |       CAST(sum_cents AS BIGINT) AS sum_cents,
        |       CAST(CAST(sum_cents AS HUGEINT) * 1000000
        |            // CAST(n_eff AS HUGEINT) AS BIGINT) AS mean_micros
        |FROM (${sels.mkString(" UNION ALL ")}) ORDER BY rep""".stripMargin
    },

    // x245: the oracle takes the k-th order statistic by ROW_NUMBER —
    // deliberately the sort-based formulation the engine's two-phase
    // histogram avoids. α grid GENERATED from the shared rationals.
    "x245_conformal_band" -> {
      val vals = graft.queries.StatProtocol.conformalAlphas
        .map { case (p, nu, de) => s"($p, $nu, $de)" }.mkString(", ")
      s"""WITH cents AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |pred AS (
        |  SELECT o_orderpriority,
        |         CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred_cents
        |  FROM cents WHERE o_orderkey % 5 <= 2 GROUP BY 1),
        |cal AS (
        |  SELECT CAST(abs(c.cents - p.pred_cents) AS BIGINT) AS s
        |  FROM cents c JOIN pred p USING (o_orderpriority)
        |  WHERE c.o_orderkey % 5 = 3),
        |n AS (SELECT COUNT(*) AS n_cal FROM cal),
        |alphas(alpha_pct, num, den) AS (VALUES $vals),
        |ks AS (
        |  SELECT alpha_pct, n_cal,
        |         ((n_cal + 1) * num + den - 1) // den AS k
        |  FROM alphas, n),
        |ranked AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM cal),
        |q AS (
        |  SELECT ks.alpha_pct, ks.n_cal, ks.k, r.s AS q_cents
        |  FROM ks JOIN ranked r ON r.rn = ks.k),
        |calcov AS (
        |  SELECT q.alpha_pct, COUNT(*) AS cal_at_or_below
        |  FROM q JOIN cal ON cal.s <= q.q_cents GROUP BY 1),
        |test AS (
        |  SELECT CAST(abs(c.cents - p.pred_cents) AS BIGINT) AS s
        |  FROM cents c JOIN pred p USING (o_orderpriority)
        |  WHERE c.o_orderkey % 5 = 4),
        |tc AS (
        |  SELECT q.alpha_pct, COUNT(*) AS n_test,
        |         CAST(SUM(CASE WHEN test.s <= q.q_cents THEN 1 ELSE 0 END)
        |             AS BIGINT) AS test_covered
        |  FROM q, test GROUP BY 1)
        |SELECT CAST(q.alpha_pct AS BIGINT) AS alpha_pct, q.n_cal,
        |       q.k, q.q_cents, calcov.cal_at_or_below,
        |       tc.n_test, tc.test_covered,
        |       CAST(tc.test_covered * 1000000 // tc.n_test AS BIGINT)
        |         AS coverage_ppm
        |FROM q JOIN calcov USING (alpha_pct) JOIN tc USING (alpha_pct)
        |ORDER BY 1""".stripMargin
    },

    // x246: the noise ladder is GENERATED from the shared exact-rational
    // thresholds (graft.queries.Governance.dpLadderSql) — the oracle
    // replays the exact release, noise and all.
    "x246_dp_counts" -> {
      val ladder = graft.queries.Governance.dpLadderSql("h")
      s"""WITH u AS (
        |  SELECT 1 AS release, o_orderpriority AS group_key,
        |         COUNT(*) AS true_n
        |  FROM orders GROUP BY 2
        |  UNION ALL
        |  SELECT 2, o_orderpriority || '|' || o_orderstatus, COUNT(*)
        |  FROM orders GROUP BY 2),
        |g AS (
        |  SELECT release, group_key, true_n,
        |         CASE WHEN release = 1
        |              THEN CAST(substring(group_key, 1, 1) AS BIGINT)
        |              ELSE CAST(substring(group_key, 1, 1) AS BIGINT) * 256
        |                   + ascii(right(group_key, 1)) END AS gid
        |  FROM u),
        |h AS (
        |  SELECT *, (gid * 2654435761 + release * 97564181) % 2147483647
        |            AS h
        |  FROM g),
        |z AS (SELECT *, $ladder AS noise FROM h)
        |SELECT CAST(release AS BIGINT) AS release, group_key,
        |       CAST(true_n AS BIGINT) AS true_n,
        |       CAST(noise AS BIGINT) AS noise,
        |       CAST(true_n + noise AS BIGINT) AS noisy_n,
        |       CAST(693 AS BIGINT) AS eps_milli,
        |       CAST(1386 AS BIGINT) AS total_eps_milli
        |FROM z ORDER BY 1, 2""".stripMargin
    },

    // x248: policy branches GENERATED from the shared policy list
    // (graft.queries.StatProtocol.ipsPolicies) — identical predicates and
    // integer weights on both engines.
    "x248_ips_offline_eval" -> {
      import graft.queries.StatProtocol.ipsPolicies
      val aggs = ipsPolicies.zipWithIndex.map { case ((_, pred, _), i) =>
        s"""SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS m$i,
          |       SUM(CASE WHEN $pred THEN cents ELSE 0 END) AS s$i""".stripMargin
      }.mkString(",\n       ")
      val sels = ipsPolicies.zipWithIndex.map { case ((nm, _, w), i) =>
        s"""SELECT '$nm' AS policy, CAST(n AS BIGINT) AS n,
          |       CAST(m$i AS BIGINT) AS n_matched,
          |       CAST(CAST($w * s$i AS HUGEINT) * 1000000
          |            // CAST(n AS HUGEINT) AS BIGINT) AS ips_micro,
          |       CAST(CAST(s$i AS HUGEINT) * 1000000
          |            // CAST(m$i AS HUGEINT) AS BIGINT) AS snips_micro
          |FROM a""".stripMargin
      }
      s"""WITH ev AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |a AS (SELECT COUNT(*) AS n,
        |       $aggs
        |      FROM ev)
        |SELECT * FROM (${sels.mkString(" UNION ALL ")}) ORDER BY policy""".stripMargin
    },

    // x249: the bucket ladder is GENERATED from the shared base-2
    // boundaries (graft.queries.StatProtocol.expoBucketSql).
    "x249_expo_histogram" -> {
      val ladder = graft.queries.StatProtocol.expoBucketSql("cents")
      s"""WITH c AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |hist AS (SELECT grp, $ladder AS b, COUNT(*) AS cnt
        |         FROM c GROUP BY 1, 2),
        |merged AS (
        |  SELECT grp, b, cnt FROM hist
        |  UNION ALL
        |  SELECT 'ALL', b, SUM(cnt) FROM hist GROUP BY 2),
        |x AS (
        |  SELECT grp, b, cnt,
        |         SUM(cnt) OVER (PARTITION BY grp) AS n,
        |         SUM(cnt) OVER (PARTITION BY grp ORDER BY b) AS cum
        |  FROM merged)
        |SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
        |       CAST(MIN(b) AS BIGINT) AS p50_bucket,
        |       CAST(power(2, MIN(b)) AS BIGINT) AS p50_lo,
        |       CAST(power(2, MIN(b) + 1) AS BIGINT) AS p50_hi
        |FROM x WHERE cum >= (n + 1) // 2 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // x247: matched purchases emit unconditionally (inner semantics);
    // unmatched purchases emit iff the FINAL global watermark passed p_ts.
    // The watermark is the MIN over both watermark operators' max event
    // time (purchases and clicks share the events clock but not their
    // maxima), floored to Spark's millisecond watermark granularity,
    // minus the 10-minute delay. epoch_us per the events-ts contract.
    "x247_stream_outer_join" ->
      """WITH wm AS (
        |  SELECT ((least(
        |      (SELECT epoch_us(max(ts)) FROM events
        |       WHERE event_type = 'purchase'),
        |      (SELECT epoch_us(max(ts)) FROM events
        |       WHERE event_type = 'click')) // 1000) * 1000)
        |    - 600000000 AS cutoff_us),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_uid, ts AS c_ts FROM events
        |      WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.p_id, p.p_ts, COUNT(c.c_uid) AS n_clicks_10m
        |  FROM p LEFT JOIN c
        |    ON c.c_uid = p.user_id
        |   AND c.c_ts >= p.p_ts - INTERVAL 10 MINUTE AND c.c_ts < p.p_ts
        |  GROUP BY 1, 2)
        |SELECT p_id, n_clicks_10m FROM j, wm
        |WHERE n_clicks_10m > 0 OR epoch_us(p_ts) < cutoff_us
        |ORDER BY p_id""".stripMargin,

    // x250: row_number under (priority ASC, doc_id ASC) — the same total
    // order topk_pairs keeps under (−priority DESC, tag ASC).
    "x250_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, source, least(1 + n_chars // 64, 8) AS wt,
        |         ((doc_id % 100000000) * 2654435761 + 40503) % 2147483647 AS h
        |  FROM documents),
        |pr AS (SELECT source, doc_id, wt, h * (840 // wt) AS priority FROM w),
        |r AS (
        |  SELECT source, doc_id, wt, priority,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |                            ORDER BY priority, doc_id) AS rank
        |  FROM pr)
        |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
        |       CAST(wt AS BIGINT) AS wt, CAST(priority AS BIGINT) AS priority
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    // x251: x13's fp prelude + the x224 capped universe; truth from the
    // exhaustive kept-fp self-join, detectors from two disjoint LSH band
    // families over the x86 minhash seeds.
    "x251_capture_recapture" ->
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        """kept AS (
          |  SELECT doc_id, fp FROM fps
          |  WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64)),
          |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
          |truth AS (
          |  SELECT i.a, i.b FROM (
          |    SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS ix
          |    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
          |    GROUP BY 1, 2) i
          |  JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
          |  WHERE 2 * i.ix >= sa.n + sb.n - i.ix),
          |hs AS (SELECT * FROM (VALUES
          |  (0, 1540483477, 11), (1, 1103515245, 12345), (2, 69069, 7),
          |  (3, 1664525, 1013904223), (4, 22695477, 1), (5, 134775813, 1),
          |  (6, 214013, 2531011), (7, 1597334677, 3)) AS v(j, a, b)),
          |sig AS (
          |  SELECT doc_id, j, MIN((a * fp + b) % 2147483647) AS mh
          |  FROM kept, hs GROUP BY doc_id, j),
          |banded AS (
          |  SELECT doc_id, j // 2 AS band,
          |         STRING_AGG(CAST(mh AS VARCHAR), ':' ORDER BY j) AS key
          |  FROM sig GROUP BY doc_id, j // 2),
          |cand1 AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
          |   AND a.band < 2),
          |cand2 AS (
          |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          |  FROM banded a JOIN banded b
          |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
          |   AND a.band >= 2),
          |d1 AS (SELECT t.a, t.b FROM truth t
          |       JOIN cand1 c ON c.a = t.a AND c.b = t.b),
          |d2 AS (SELECT t.a, t.b FROM truth t
          |       JOIN cand2 c ON c.a = t.a AND c.b = t.b),
          |m AS (SELECT COUNT(*) AS m FROM d1
          |      JOIN d2 ON d1.a = d2.a AND d1.b = d2.b),
          |c AS (SELECT (SELECT COUNT(*) FROM d1) AS n1,
          |             (SELECT COUNT(*) FROM d2) AS n2,
          |             (SELECT m FROM m) AS m,
          |             (SELECT COUNT(*) FROM truth) AS n_true)
          |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          |       CAST(m AS BIGINT) AS m_overlap,
          |       CAST(CASE WHEN m = 0 THEN -1
          |            ELSE n1 * n2 // m END AS BIGINT) AS lp_est,
          |       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT)
          |         AS chapman_est,
          |       CAST(n_true AS BIGINT) AS n_true
          |FROM c""".stripMargin),

    // x252: x19's gap/timeout cutoff arithmetic verbatim (ms-floored
    // watermark, strict <) with per-session bounds for the longest metric.
    "x252_tws_timer_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, us,
        |        CASE WHEN LAG(us) OVER w IS NULL
        |                  OR us - LAG(us) OVER w >= 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, us,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |sess AS (SELECT user_id, sid, MIN(us) AS first_us,
        |                MAX(us) AS last_us, COUNT(*) AS n
        |         FROM s GROUP BY 1, 2),
        |wm AS (SELECT MAX(us) AS mx FROM e),
        |closed AS (
        |  SELECT sess.* FROM sess
        |  WHERE sid < (SELECT MAX(sid) FROM sess s2
        |               WHERE s2.user_id = sess.user_id)
        |     OR (last_us + 1800000000) // 1000
        |        < (SELECT mx FROM wm) // 1000 - 600000)
        |SELECT user_id, COUNT(*) AS n_closed_sessions,
        |       CAST(SUM(n) AS BIGINT) AS n_events,
        |       CAST(MAX(last_us - first_us) AS BIGINT) AS longest_us
        |FROM closed GROUP BY user_id ORDER BY user_id""".stripMargin,

    // x253: the oracle takes each argmax by window ROW_NUMBER over an
    // unnested (key, shard) grid — deliberately not the engine's in-map
    // array argmax; the hash is the shared cubed-mix device.
    "x253_rendezvous_shards" -> {
      val h = graft.queries.Layout2.rdvHashSql("k", "s")
      s"""WITH ks AS (SELECT o_orderkey AS k FROM orders),
        |hs AS (
        |  SELECT k, s, $h AS h
        |  FROM ks, (SELECT unnest(range(17)) AS s)),
        |r16 AS (
        |  SELECT k, s AS s16 FROM (
        |    SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k
        |                                    ORDER BY h DESC, s) AS rn
        |    FROM hs WHERE s < 16) WHERE rn = 1),
        |r17 AS (
        |  SELECT k, s AS s17 FROM (
        |    SELECT k, s, ROW_NUMBER() OVER (PARTITION BY k
        |                                    ORDER BY h DESC, s) AS rn
        |    FROM hs) WHERE rn = 1),
        |j AS (SELECT r16.k, s16, s17 FROM r16 JOIN r17 ON r16.k = r17.k),
        |bal AS (SELECT CAST(MAX(c) AS BIGINT) AS max_load16,
        |               CAST(MIN(c) AS BIGINT) AS min_load16
        |        FROM (SELECT s16, COUNT(*) AS c FROM j GROUP BY 1)),
        |st AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS moved_mod,
        |    CAST(SUM(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS moved_rdv,
        |    CAST(SUM(CASE WHEN s16 <> s17 AND s17 <> 16 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS illegal_moves
        |  FROM j)
        |SELECT n, moved_mod, moved_rdv, illegal_moves,
        |       max_load16, min_load16,
        |       moved_rdv * 1000000 // n AS rdv_moved_ppm
        |FROM st, bal""".stripMargin
    },

    // x254: the same shared ladder/mixers as x244, per arm (key parity).
    "x254_bootstrap_uplift" -> {
      import graft.queries.StatProtocol._
      val sels = (0 until bootstrapReps).map { r =>
        val ladder = poissonLadderSql("h")
        s"""SELECT $r AS rep,
          |  SUM(CASE WHEN arm = 0 THEN w ELSE 0 END) AS n_a,
          |  SUM(CASE WHEN arm = 0 THEN w * cents ELSE 0 END) AS sum_a,
          |  SUM(CASE WHEN arm = 1 THEN w ELSE 0 END) AS n_b,
          |  SUM(CASE WHEN arm = 1 THEN w * cents ELSE 0 END) AS sum_b
          |FROM (SELECT arm, $ladder AS w, cents FROM (
          |  SELECT CAST(o_orderkey % 2 AS INT) AS arm,
          |         ${poissonHashSql("o_orderkey", r)} AS h,
          |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
          |  FROM orders))""".stripMargin
      }
      s"""SELECT CAST(rep AS BIGINT) AS rep,
        |       CAST(n_a AS BIGINT) AS n_a, CAST(sum_a AS BIGINT) AS sum_a,
        |       CAST(n_b AS BIGINT) AS n_b, CAST(sum_b AS BIGINT) AS sum_b,
        |       CAST(CAST(sum_a AS HUGEINT) * 1000000
        |            // CAST(n_a AS HUGEINT) AS BIGINT) AS mean_a_micros,
        |       CAST(CAST(sum_b AS HUGEINT) * 1000000
        |            // CAST(n_b AS HUGEINT) AS BIGINT) AS mean_b_micros,
        |       CAST(CAST(sum_a AS HUGEINT) * 1000000 // CAST(n_a AS HUGEINT)
        |          - CAST(sum_b AS HUGEINT) * 1000000 // CAST(n_b AS HUGEINT)
        |          AS BIGINT) AS uplift_micros
        |FROM (${sels.mkString(" UNION ALL ")}) ORDER BY rep""".stripMargin
    },

    // x255: four relaxation CTEs — the ≤4-edge Bellman–Ford optimum is
    // the DEFINITION, so the recursion structure is shared by contract.
    "x255_weighted_hops" -> {
      val relax = (1 to 4).map { i =>
        s"""d$i AS (
          |  SELECT v, MIN(d) AS d FROM (
          |    SELECT v, d FROM d${i - 1}
          |    UNION ALL
          |    SELECT e.v, p.d + e.w AS d
          |    FROM d${i - 1} p JOIN edges e ON e.u = p.v)
          |  GROUP BY v)""".stripMargin
      }.mkString(",\n")
      s"""WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split(lower(text), ' '), x -> x <> '')
        |           AS ts
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS p
        |  FROM toks),
        |bigr AS (
        |  SELECT a.tok AS a, b.tok AS b, COUNT(*) AS cnt
        |  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |bigf AS (SELECT a, b, cnt FROM bigr WHERE a <> b),
        |edges AS (
        |  SELECT u, v, 1000 + 1000000 // SUM(cnt) AS w FROM (
        |    SELECT a AS u, b AS v, cnt FROM bigf
        |    UNION ALL SELECT b, a, cnt FROM bigf)
        |  GROUP BY 1, 2),
        |df AS (
        |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY 1),
        |d0 AS (
        |  SELECT tok AS v, CAST(0 AS BIGINT) AS d FROM df
        |  ORDER BY df DESC, tok LIMIT 1),
        |$relax,
        |top20 AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 20)
        |SELECT t.tok, t.df, CAST(COALESCE(d4.d, -1) AS BIGINT) AS dist4
        |FROM top20 t LEFT JOIN d4 ON d4.v = t.tok
        |ORDER BY t.tok""".stripMargin
    },

    // x256: the oracle UNFOLDS the greedy scan as a recursive CTE joining
    // the inventory tables directly — the engine inlines the same
    // inventory (same tf weights, same tiebreaks) as IN-list literals.
    "x256_wordpiece_segment" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x <> '')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1),
        |bi AS (
        |  SELECT substr(tok, i, 2) AS g, SUM(tf) AS w
        |  FROM vocab, generate_series(1, 32) AS gs(i)
        |  WHERE i + 1 <= length(tok) GROUP BY 1),
        |tri AS (
        |  SELECT substr(tok, i, 3) AS g, SUM(tf) AS w
        |  FROM vocab, generate_series(1, 32) AS gs(i)
        |  WHERE i + 2 <= length(tok) GROUP BY 1),
        |bi30 AS (SELECT g FROM bi ORDER BY w DESC, g LIMIT 30),
        |tri20 AS (SELECT g FROM tri ORDER BY w DESC, g LIMIT 20),
        |seg AS (
        |  WITH RECURSIVE r(tok, tf, pos, piece) AS (
        |    SELECT tok, tf, 0, CAST(NULL AS VARCHAR) FROM vocab
        |    UNION ALL
        |    SELECT r.tok, r.tf,
        |      r.pos + CASE WHEN t.g IS NOT NULL THEN 3
        |                   WHEN b.g IS NOT NULL THEN 2 ELSE 1 END,
        |      CASE WHEN t.g IS NOT NULL THEN t.g
        |           WHEN b.g IS NOT NULL THEN b.g
        |           ELSE substr(r.tok, r.pos + 1, 1) END
        |    FROM r
        |    LEFT JOIN tri20 t ON t.g = substr(r.tok, r.pos + 1, 3)
        |    LEFT JOIN bi30 b ON b.g = substr(r.tok, r.pos + 1, 2)
        |    WHERE r.pos < length(r.tok))
        |  SELECT tok, tf, piece FROM r WHERE piece IS NOT NULL)
        |SELECT piece, CAST(length(piece) AS BIGINT) AS len,
        |       CAST(SUM(tf) AS BIGINT) AS usage
        |FROM seg GROUP BY 1 ORDER BY usage DESC, piece LIMIT 30""".stripMargin,

    // x257: x13's fp prelude + the shared cubed KMV hash; sketches by
    // ORDER BY h LIMIT k (the sort formulation the engine's heap avoids);
    // the union sketch merges the two sketches exactly as the engine does.
    "x257_kmv_overlap" -> {
      val h = graft.queries.Reshape.kmvHashSql("fp")
      ("WITH " + OracleSqlMl.fpCodedCtes + ",\n" + OracleSqlMl.fpsDistinctCte + ",\n" +
        s"""hs AS (
          |  SELECT DISTINCT doc_id % 2 AS side, $h AS h FROM fps),
          |ka AS (SELECT h FROM (SELECT DISTINCT h FROM hs WHERE side = 0)
          |       ORDER BY h LIMIT 256),
          |kb AS (SELECT h FROM (SELECT DISTINCT h FROM hs WHERE side = 1)
          |       ORDER BY h LIMIT 256),
          |ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
          |       ORDER BY h LIMIT 256),
          |est AS (
          |  SELECT
          |    (SELECT COUNT(*) FROM hs WHERE side = 0) AS n_a,
          |    (SELECT COUNT(*) FROM hs WHERE side = 1) AS n_b,
          |    (SELECT MAX(h) FROM ka) AS kth_a,
          |    (SELECT MAX(h) FROM kb) AS kth_b,
          |    (SELECT MAX(h) FROM ku) AS kth_u,
          |    (SELECT COUNT(*) FROM ku) AS cu,
          |    (SELECT COUNT(*) FROM ku
          |     WHERE h IN (SELECT h FROM ka)
          |       AND h IN (SELECT h FROM kb)) AS inter_in_u,
          |    (SELECT COUNT(DISTINCT h) FROM hs) AS true_union,
          |    (SELECT COUNT(*) FROM
          |       (SELECT h FROM hs WHERE side = 0 INTERSECT
          |        SELECT h FROM hs WHERE side = 1)) AS true_inter)
          |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
          |  kth_a, kth_b, kth_u,
          |  CAST(CASE WHEN cu < 256 THEN cu
          |       ELSE CAST(255 AS BIGINT) * 2147483647 // kth_u END
          |    AS BIGINT) AS est_union,
          |  CAST(true_union AS BIGINT) AS true_union,
          |  CAST(inter_in_u * 1000000 // cu AS BIGINT) AS est_j_ppm,
          |  CAST(true_inter * 1000000 // true_union AS BIGINT) AS true_j_ppm
          |FROM est""".stripMargin)
    },

    // x258: the oracle materializes the (user, seg) grid + ROW_NUMBER
    // order statistics — the sort/spine formulation the engine's in-map
    // zero-fill and two-phase histogram avoid.
    "x258_sax_motifs" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |                  CAST(round(value * 100, 0) AS BIGINT) AS c
        |           FROM events),
        |m AS (SELECT MAX(day) AS maxd FROM e),
        |w AS (SELECT user_id, (maxd - day) // 2 AS seg, c FROM e, m
        |      WHERE day > maxd - 8),
        |segs AS (SELECT user_id, seg, SUM(c) AS v FROM w GROUP BY 1, 2),
        |grid AS (SELECT DISTINCT user_id FROM w),
        |vals AS (
        |  SELECT g.user_id, s.seg, COALESCE(x.v, 0) AS v
        |  FROM grid g CROSS JOIN (SELECT unnest(range(4)) AS seg) s
        |  LEFT JOIN segs x ON x.user_id = g.user_id AND x.seg = s.seg),
        |n AS (SELECT COUNT(*) AS n FROM vals),
        |r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM vals),
        |b AS (SELECT
        |  (SELECT v FROM r, n WHERE rn = (n + 3) // 4) AS b1,
        |  (SELECT v FROM r, n WHERE rn = (2 * n + 3) // 4) AS b2,
        |  (SELECT v FROM r, n WHERE rn = (3 * n + 3) // 4) AS b3),
        |sym AS (SELECT user_id, seg,
        |  CASE WHEN v <= b1 THEN 'a' WHEN v <= b2 THEN 'b'
        |       WHEN v <= b3 THEN 'c' ELSE 'd' END AS s
        |  FROM vals, b),
        |words AS (SELECT user_id, STRING_AGG(s, '' ORDER BY seg) AS word
        |          FROM sym GROUP BY 1)
        |SELECT word, COUNT(*) AS n_users FROM words GROUP BY 1
        |ORDER BY n_users DESC, word""".stripMargin,

    // x259: the single-sort ROW_NUMBER formulation of the permutation the
    // engine computes with the two-phase distributed rank; shared cubed
    // seed-7 hash.
    "x259_training_shuffle" -> {
      val h = graft.queries.Layout2.rdvHashSql("event_id", "7")
      s"""WITH hs AS (SELECT event_id, $h AS h FROM events),
        |r AS (SELECT event_id, h,
        |        ROW_NUMBER() OVER (ORDER BY h, event_id) AS rank FROM hs),
        |n AS (SELECT COUNT(*) AS n FROM r)
        |SELECT CAST((rank - 1) // ((n + 15) // 16) AS BIGINT) AS shard,
        |       COUNT(*) AS n_rows,
        |       CAST(MIN(rank) AS BIGINT) AS min_rank,
        |       CAST(MAX(rank) AS BIGINT) AS max_rank,
        |       CAST(SUM(CAST(rank AS HUGEINT) * event_id) % 2147483647
        |            AS BIGINT) AS cks
        |FROM r, n GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )
}
