package graft

/** DuckDB oracle SQL, round-10 third batch: the t-closeness privacy audit,
  * nDCG@10 retrieval evaluation, the Johnson–Lindenstrauss distortion
  * audit, the PCA moment sketch (theorem form), and Fellegi–Sunter
  * record-linkage scoring. Everything is exact integer arithmetic end to
  * end: t-closeness clears its denominators (TV > t ⟺ 10·Σ|n_cs·N −
  * N_s·n_c| > 2·t₁₀·n_c·N, DECIMAL(38,0)/HUGEINT headroom), nDCG folds
  * the SAME literal micro-discount list the engine folds (log₂ never
  * crosses an engine boundary), JL folds the SAME ±1 sign arrays, PCA's
  * frame is the exact ⌊x·1024⌋ second-moment sketch with the engine's
  * power-iteration invariants stated as TRUE, and linkage scores sum the
  * SAME centi-log₂ weight literals. */
object OracleSqlRound10c {

  /** x230's position weights and x231's sign arrays land in the SQL from
    * the same Scala vals the engine folds (the x215/x218/x223 generated-
    * oracle device). */
  private val ndcgW = graft.queries.Clustering.ndcgWeightsMicro

  private val x230Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents),
       |toksf AS (SELECT * FROM toks WHERE tok <> ''),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toksf GROUP BY 1, 2),
       |dlen AS (SELECT doc_id, sum(tf) AS n_toks FROM tf GROUP BY 1),
       |dfq AS (
       |  SELECT tok FROM (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
       |  ORDER BY df DESC, tok LIMIT 20),
       |cand AS (
       |  SELECT q.tok AS q_tok, t.doc_id,
       |         t.tf * 1000000 // d.n_toks AS score,
       |         (CASE least(t.tf, 3) WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END)
       |           AS gain
       |  FROM dfq q JOIN tf t ON t.tok = q.tok
       |  JOIN dlen d ON d.doc_id = t.doc_id),
       |w AS (
       |  SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) AS pos,
       |         unnest([${ndcgW.mkString(", ")}]) AS wmicro),
       |ranked AS (
       |  SELECT q_tok, gain,
       |         row_number() OVER (PARTITION BY q_tok
       |                            ORDER BY score DESC, doc_id) AS pos
       |  FROM cand),
       |dcg AS (
       |  SELECT q_tok, sum(gain * wmicro) AS dcg_micro
       |  FROM ranked JOIN w USING (pos) WHERE pos <= 10 GROUP BY 1),
       |gcnt AS (
       |  SELECT q_tok, count(*) AS n_cands,
       |         sum(CASE WHEN gain = 7 THEN 1 ELSE 0 END) AS n7,
       |         sum(CASE WHEN gain = 3 THEN 1 ELSE 0 END) AS n3,
       |         sum(CASE WHEN gain = 1 THEN 1 ELSE 0 END) AS n1
       |  FROM cand GROUP BY 1),
       |idcg AS (
       |  SELECT q_tok, any_value(n_cands) AS n_cands,
       |         sum((CASE WHEN pos <= n7 THEN 7
       |                   WHEN pos <= n7 + n3 THEN 3
       |                   WHEN pos <= n7 + n3 + n1 THEN 1
       |                   ELSE 0 END) * wmicro) AS idcg_micro
       |  FROM gcnt CROSS JOIN w GROUP BY 1)
       |SELECT d.q_tok, CAST(i.n_cands AS BIGINT) AS n_cands,
       |       CAST(d.dcg_micro AS BIGINT) AS dcg_micro,
       |       CAST(i.idcg_micro AS BIGINT) AS idcg_micro,
       |       CAST(d.dcg_micro * 1000000 // i.idcg_micro AS BIGINT)
       |         AS ndcg_ppm
       |FROM dcg d JOIN idcg i USING (q_tok)
       |ORDER BY q_tok""".stripMargin

  private val x231Sql: String = {
    val signs = graft.queries.Clustering.jlSigns
    val djDefs = signs.zipWithIndex.map { case (s, j) =>
      s"CAST(list_sum([d[i+1] * ([${s.mkString(", ")}])[i+1] FOR i IN range(64)]) AS BIGINT) AS dj$j"
    }.mkString(",\n    ")
    val sd2 = signs.indices.map(j => s"dj$j * dj$j").mkString(" + ")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(u AS DOUBLE) * 1024) AS BIGINT) FOR u IN embedding] AS qe
       |  FROM embeddings),
       |pr AS (
       |  SELECT a.vec_id AS id_a,
       |    [a.qe[i+1] - b.qe[i+1] FOR i IN range(64)] AS d
       |  FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1
       |  WHERE a.vec_id % 2 = 0),
       |proj AS (
       |  SELECT id_a,
       |    $djDefs,
       |    CAST(list_sum([d[i+1] * d[i+1] FOR i IN range(64)]) AS BIGINT) AS den
       |  FROM pr),
       |ratio AS (
       |  SELECT CAST(($sd2) * 1000000 // (8 * den) AS BIGINT) AS ratio_ppm
       |  FROM proj WHERE den > 0)
       |SELECT CAST(ratio_ppm // 250000 AS BIGINT) AS bucket,
       |       count(*) AS n_pairs,
       |       CAST(min(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
       |       CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm
       |FROM ratio GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private val x233Sql: String = {
    val w = graft.queries.Wrangle.fsWeights
    val (bA, bD) = w("brand"); val (sA, sD) = w("size"); val (aA, aD) = w("adj")
    s"""WITH rec AS (
       |  SELECT p_type, string_split(p_name, ' ')[2] AS noun,
       |         p_brand, p_size, string_split(p_name, ' ')[1] AS adj
       |  FROM part),
       |combo AS (
       |  SELECT p_type, noun, p_brand, p_size, adj, count(*) AS cnt
       |  FROM rec GROUP BY 1, 2, 3, 4, 5),
       |pairs AS (
       |  SELECT
       |    CASE WHEN a.p_brand = b.p_brand THEN $bA ELSE $bD END +
       |    CASE WHEN a.p_size  = b.p_size  THEN $sA ELSE $sD END +
       |    CASE WHEN a.adj     = b.adj     THEN $aA ELSE $aD END AS score,
       |    CASE WHEN (a.p_brand, a.p_size, a.adj) = (b.p_brand, b.p_size, b.adj)
       |         THEN a.cnt * (a.cnt - 1) // 2 ELSE a.cnt * b.cnt END AS n_pairs
       |  FROM combo a JOIN combo b
       |    ON a.p_type = b.p_type AND a.noun = b.noun
       |   AND (a.p_brand, a.p_size, a.adj) <= (b.p_brand, b.p_size, b.adj)
       |  WHERE NOT ((a.p_brand, a.p_size, a.adj) = (b.p_brand, b.p_size, b.adj)
       |             AND a.cnt < 2))
       |SELECT CASE WHEN score >= 900 THEN 'link'
       |            WHEN score >= 0 THEN 'possible'
       |            ELSE 'nonlink' END AS decision,
       |       CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
       |       CAST(min(score) AS BIGINT) AS min_score,
       |       CAST(max(score) AS BIGINT) AS max_score,
       |       count(*) AS n_patterns
       |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** x234's per-(table, column) stat blocks are GENERATED from the SAME
    * audited-column val the engine iterates (Layout.encodingAuditCols);
    * the ⌈log₂ ndv⌉ CASE ladder mirrors the engine's fold over 0..30. */
  private val x234Sql: String = {
    val ladder = (0 until 31)
      .map(k => s"(CASE WHEN ndv > ${1L << k} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val blocks = graft.queries.Layout.encodingAuditCols.flatMap {
      case (t, cols) => cols.map { c =>
        s"""  SELECT '$t' AS tbl, '$c' AS col, count($c) AS n,
           |         count(DISTINCT $c) AS ndv,
           |         CAST(sum(strlen($c)) AS BIGINT) AS plain_bytes,
           |         CAST(max(strlen($c)) AS BIGINT) AS max_len
           |  FROM $t""".stripMargin
      }
    }.mkString("\n  UNION ALL\n")
    s"""WITH stats AS (
       |$blocks),
       |enc AS (SELECT *, ($ladder) AS dict_bits FROM stats),
       |fin AS (
       |  SELECT tbl, col, n, ndv, plain_bytes,
       |         ndv * max_len + (n * dict_bits + 7) // 8 AS dict_bytes
       |  FROM enc)
       |SELECT tbl, col, n, ndv, plain_bytes,
       |       CAST(dict_bytes AS BIGINT) AS dict_bytes,
       |       CAST(dict_bytes * 1000000 // plain_bytes AS BIGINT)
       |         AS dict_cost_ppm,
       |       CASE WHEN dict_bytes < plain_bytes THEN 'dict' ELSE 'plain' END
       |         AS encoding
       |FROM fin ORDER BY tbl, col""".stripMargin
  }

  private val x237Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
      |         lead(event_type, 1) OVER w AS t1,
      |         lead(event_type, 2) OVER w AS t2,
      |         lead(epoch_us(ts), 2) OVER w AS us2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |SELECT user_id, count(*) AS n_matches, min(us) AS first_start_us,
      |       max(us) AS last_start_us
      |FROM ev
      |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
      |  AND us2 - us <= 259200000000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** x241's per-width distortion devs are GENERATED from the same
    * [[graft.queries.Clustering.jlSignsM]] formula the engine folds. */
  private val x241Sql: String = {
    val ms = Seq(4, 8, 16, 32)
    val devDefs = ms.map { m =>
      val djs = graft.queries.Clustering.jlSignsM(m).map(s =>
        s"CAST(list_sum([d[i+1] * ([${s.mkString(", ")}])[i+1] FOR i IN range(64)]) AS BIGINT)")
      val sd2 = djs.map(e => s"($e) * ($e)").mkString(" + ")
      s"abs(($sd2) * 1000000 // ($m * den) - 1000000) AS dev_$m"
    }.mkString(",\n    ")
    val unions = ms.map { m =>
      s"""SELECT CAST($m AS BIGINT) AS m, count(*) AS n_pairs,
         |       CAST(sum(dev_$m) // count(*) AS BIGINT) AS mean_abs_dev_ppm,
         |       CAST(max(dev_$m) AS BIGINT) AS worst_dev_ppm,
         |       CAST(sum(CASE WHEN dev_$m <= 250000 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_within_25pct
         |FROM proj""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH qv AS (
       |  SELECT vec_id,
       |    [CAST(floor(CAST(u AS DOUBLE) * 1024) AS BIGINT) FOR u IN embedding] AS qe
       |  FROM embeddings),
       |pr AS (
       |  SELECT a.vec_id AS id_a,
       |    [a.qe[i+1] - b.qe[i+1] FOR i IN range(64)] AS d
       |  FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1
       |  WHERE a.vec_id % 2 = 0),
       |base AS (
       |  SELECT id_a, d,
       |    CAST(list_sum([d[i+1] * d[i+1] FOR i IN range(64)]) AS BIGINT) AS den
       |  FROM pr),
       |proj AS (
       |  SELECT id_a,
       |    $devDefs
       |  FROM base WHERE den > 0)
       |$unions
       |ORDER BY m""".stripMargin
  }

  val round10c: Map[String, String] = Map(
    // x229: the TV > t test with denominators cleared — 10·Σ|n_cs·N −
    // N_s·n_c| > 2·t₁₀·n_c·N — so the sweep is integer-exact; DuckDB
    // widens the cross-terms to HUGEINT natively where Spark rides
    // DECIMAL(38,0): identical values, BIGINT outputs.
    "x229_t_closeness" ->
      """WITH qi AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
        |  FROM customer),
        |j AS (
        |  SELECT q.c_nationkey, q.c_mktsegment, q.bal_band, q.c_custkey,
        |         o.o_orderpriority
        |  FROM qi q JOIN orders o ON o.o_custkey = q.c_custkey),
        |cls_s AS (
        |  SELECT c_nationkey, c_mktsegment, bal_band, o_orderpriority,
        |         count(*) AS n_cs
        |  FROM j GROUP BY 1, 2, 3, 4),
        |mem AS (
        |  SELECT c_nationkey, c_mktsegment, bal_band,
        |         count(DISTINCT c_custkey) AS n_members, count(*) AS n_c
        |  FROM j GROUP BY 1, 2, 3),
        |glob_s AS (
        |  SELECT o_orderpriority, sum(n_cs) AS n_s FROM cls_s GROUP BY 1),
        |gtot AS (SELECT sum(n_s) AS n FROM glob_s),
        |tv0 AS (
        |  -- both L1 sides: the present-priority terms plus the absent-
        |  -- priority mass n_c·(N − Σ_present N_s) (= Σ_absent N_s·n_c)
        |  SELECT s.c_nationkey, s.c_mktsegment, s.bal_band,
        |         sum(abs(CAST(s.n_cs AS DECIMAL(38,0)) * g.n
        |                 - CAST(gs.n_s AS DECIMAL(38,0)) * c.n_c))
        |           AS num_present,
        |         sum(CAST(gs.n_s AS DECIMAL(38,0))) AS ns_present,
        |         any_value(c.n_c) AS n_c,
        |         any_value(c.n_members) AS n_members,
        |         any_value(g.n) AS n
        |  FROM cls_s s
        |  JOIN mem c USING (c_nationkey, c_mktsegment, bal_band)
        |  JOIN glob_s gs USING (o_orderpriority)
        |  CROSS JOIN gtot g
        |  GROUP BY 1, 2, 3),
        |tv AS (
        |  SELECT c_nationkey, c_mktsegment, bal_band,
        |         num_present + CAST(n_c AS DECIMAL(38,0))
        |           * (CAST(n AS DECIMAL(38,0)) - ns_present) AS num,
        |         n_c, n_members, n
        |  FROM tv0),
        |tvc AS (
        |  -- HUGEINT, not DECIMAL, for the floor-div: DuckDB's // on
        |  -- DECIMAL operands returns DOUBLE (exactness lost past 2^52);
        |  -- HUGEINT // HUGEINT is exact integer division
        |  SELECT *,
        |    CAST(CAST(num AS HUGEINT) * 1000000
        |         // (2 * CAST(n_c AS HUGEINT) * CAST(n AS HUGEINT))
        |         AS BIGINT) AS tv_ppm
        |  FROM tv)
        |SELECT CAST(t10 AS BIGINT) AS t_tenths,
        |       count(*) AS n_classes,
        |       CAST(sum(CASE WHEN 10 * num >
        |                       2 * t10 * CAST(n_c AS DECIMAL(38,0)) * n
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS violating_classes,
        |       CAST(sum(CASE WHEN 10 * num >
        |                       2 * t10 * CAST(n_c AS DECIMAL(38,0)) * n
        |                     THEN n_members ELSE 0 END) AS BIGINT)
        |         AS exposed_members,
        |       max(tv_ppm) AS max_tv_ppm
        |FROM tvc CROSS JOIN (SELECT unnest([1, 2, 3, 5]) AS t10)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x230_ndcg_eval" -> x230Sql,
    "x231_jl_distortion" -> x231Sql,
    "x234_encoding_advisor" -> x234Sql,
    // x235: the DV chain replayed verbatim (32-bit buckets — bit 31 is the
    // shift ceiling: DuckDB's checked 1<<63 errors where Java wraps) plus
    // the two-sided EXCEPT equivalence of merge-on-read vs copy-on-write.
    "x235_deletion_vectors" ->
      """WITH dv AS (
        |  SELECT o_orderkey // 32 AS bucket,
        |         bit_or(CAST(1 AS BIGINT) << CAST(o_orderkey % 32 AS INTEGER))
        |           AS mask
        |  FROM orders WHERE o_orderkey % 13 = 0 GROUP BY 1),
        |mor AS (
        |  SELECT o.* FROM orders o
        |  LEFT JOIN dv ON dv.bucket = o.o_orderkey // 32
        |  WHERE dv.mask IS NULL OR
        |        (dv.mask & (CAST(1 AS BIGINT)
        |                    << CAST(o.o_orderkey % 32 AS INTEGER))) = 0),
        |cow AS (SELECT o.* FROM orders o WHERE o.o_orderkey % 13 <> 0),
        |stages AS (
        |  SELECT 'base' AS stage, count(*) AS n_rows,
        |         CAST(coalesce(sum(round(o_totalprice * 100, 0)), 0)
        |              AS BIGINT) AS cents
        |  FROM orders
        |  UNION ALL
        |  SELECT 'deleted', count(*),
        |         CAST(coalesce(sum(round(o_totalprice * 100, 0)), 0) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT 'merge_on_read', count(*),
        |         CAST(coalesce(sum(round(o_totalprice * 100, 0)), 0) AS BIGINT)
        |  FROM mor),
        |dvs AS (
        |  SELECT count(*) AS dv_buckets,
        |         CAST((SELECT count(*) FROM orders WHERE o_orderkey % 13 = 0)
        |              * 1000000 // (count(*) * 32) AS BIGINT)
        |           AS dv_density_ppm
        |  FROM dv),
        |mism AS (
        |  SELECT (SELECT count(*) FROM
        |            (SELECT o_orderkey FROM mor
        |             EXCEPT SELECT o_orderkey FROM cow))
        |       + (SELECT count(*) FROM
        |            (SELECT o_orderkey FROM cow
        |             EXCEPT SELECT o_orderkey FROM mor)) AS n_mismatch)
        |SELECT s.stage, s.n_rows, s.cents, d.dv_buckets, d.dv_density_ppm,
        |       m.n_mismatch = 0 AS mor_eq_cow
        |FROM stages s CROSS JOIN dvs d CROSS JOIN mism m
        |ORDER BY stage""".stripMargin,
    // x236: the alignment's CLOSED FORM — matched = least(⌊t_w/250000⌋,
    // n_frames−1) with n_frames = min(8, max(1, bytes//256)) and
    // n_windows = ⌈bytes/512⌉ — independent arithmetic the engine's real
    // union-sort as-of join must reproduce binding for binding (the
    // checksum pins each one).
    "x236_av_alignment" ->
      """WITH mp4 AS (
        |  SELECT doc_id, strlen(text) AS len FROM documents
        |  WHERE doc_id % 4 = 3 AND strlen(text) > 0),
        |base AS (
        |  SELECT doc_id,
        |         least(8, greatest(1, len // 256)) AS n_frames,
        |         (len + 511) // 512 AS n_windows
        |  FROM mp4),
        |wins AS (
        |  SELECT doc_id, n_frames, win,
        |         least((win * 32000) // 250000, n_frames - 1) AS matched
        |  FROM (SELECT doc_id, n_frames,
        |               unnest(range(n_windows)) AS win FROM base)),
        |agg AS (
        |  SELECT doc_id, any_value(n_frames) AS n_frames,
        |         count(*) AS n_windows, max(matched) + 1 AS n_frames_hit,
        |         sum((win + 1) * (matched + 1)) AS align_checksum
        |  FROM wins GROUP BY 1),
        |fan AS (
        |  SELECT doc_id, max(nw) AS max_fanin FROM (
        |    SELECT doc_id, matched, count(*) AS nw FROM wins GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT a.doc_id, CAST(a.n_frames AS BIGINT) AS n_frames,
        |       CAST(a.n_windows AS BIGINT) AS n_windows,
        |       CAST(a.n_frames_hit AS BIGINT) AS n_frames_hit,
        |       CAST(f.max_fanin AS BIGINT) AS max_fanin,
        |       CAST(a.align_checksum AS BIGINT) AS align_checksum
        |FROM agg a JOIN fan f USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,
    // x232: the exact ⌊x·1024⌋ second-moment sketch — n at (−1,−1), the
    // coordinate sums at (k,−1), the upper-triangle product sums at
    // (k,l) — recomputed verbatim; pca_ok states the engine's power-
    // iteration invariants (Rayleigh monotone from e_argmax(diag), so
    // λ̂ ∈ [max diag, trace]) — theorems of symmetric PSD iteration,
    // TRUE for any data.
    "x232_pca_power" ->
      """WITH qv AS (
        |  SELECT vec_id,
        |    [CAST(floor(CAST(u AS DOUBLE) * 1024) AS BIGINT) FOR u IN embedding] AS qe
        |  FROM embeddings),
        |el AS (
        |  SELECT vec_id, i AS k, qe[i+1] AS q
        |  FROM qv, (SELECT unnest(range(64)) AS i)),
        |skl AS (
        |  SELECT CAST(a.k AS INTEGER) AS k, CAST(b.k AS INTEGER) AS l,
        |         CAST(sum(a.q * b.q) AS BIGINT) AS s2
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND b.k >= a.k
        |  GROUP BY 1, 2),
        |sk AS (
        |  SELECT CAST(k AS INTEGER) AS k, CAST(-1 AS INTEGER) AS l,
        |         CAST(sum(q) AS BIGINT) AS s2
        |  FROM el GROUP BY 1),
        |nn AS (
        |  SELECT CAST(-1 AS INTEGER) AS k, CAST(-1 AS INTEGER) AS l,
        |         CAST(count(*) AS BIGINT) AS s2
        |  FROM qv)
        |SELECT CAST(k AS BIGINT) AS k, CAST(l AS BIGINT) AS l, s2,
        |       TRUE AS pca_ok
        |FROM (SELECT * FROM skl UNION ALL SELECT * FROM sk
        |      UNION ALL SELECT * FROM nn)
        |ORDER BY k, l""".stripMargin,
    "x233_linkage_fs" -> x233Sql,
    // x237: the CEP triple — two LEADs over the (ts µs, event_id) total
    // order; strictly consecutive, 3-day span, exact µs arithmetic
    // (epoch_us, never fractional epoch).
    "x237_cep_consecutive" -> x237Sql,
    // x240: the STREAMING CEP twin registers x237's oracle VERBATIM — the
    // single-batch replay hands each user's whole sequence to one handler
    // call, so the incremental processor must reproduce the batch answer
    // bit for bit (cross-batch straddle semantics live in StreamingSpec).
    "x240_stream_cep" -> x237Sql,
    "x241_jl_dim_curve" -> x241Sql,
    // x238: the clamp through the prefix-sum identity
    // S_i = P_i − min(0, min_{j≤i} P_j) — two stacked per-user windows,
    // the same declarative shape the engine plans.
    "x238_clamped_balance" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
        |         sum(CASE WHEN event_type = 'purchase'
        |                  THEN -CAST(round(value * 100, 0) AS BIGINT)
        |                  ELSE CAST(round(value * 100, 0) AS BIGINT) END)
        |           AS net
        |  FROM events GROUP BY 1, 2),
        |pre AS (
        |  SELECT user_id, d, net,
        |         sum(net) OVER (PARTITION BY user_id ORDER BY d
        |                        ROWS BETWEEN UNBOUNDED PRECEDING
        |                        AND CURRENT ROW) AS p
        |  FROM daily),
        |clamp AS (
        |  SELECT user_id, d, p,
        |         p - least(CAST(0 AS BIGINT),
        |                   min(p) OVER (PARTITION BY user_id ORDER BY d
        |                                ROWS BETWEEN UNBOUNDED PRECEDING
        |                                AND CURRENT ROW)) AS bal
        |  FROM pre)
        |SELECT user_id, count(*) AS n_days,
        |       CAST(max(CASE WHEN rn = 1 THEN bal END) AS BIGINT)
        |         AS final_balance_cents,
        |       CAST(max(bal) AS BIGINT) AS max_balance_cents,
        |       CAST(sum(CASE WHEN bal = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_floor_days
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY d DESC) AS rn
        |      FROM clamp)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // x239: the skyline sweep on DISTINCT (delay, cpu) pairs — running-min
    // cpu under (delay asc, cpu asc) order; the oracle needs no local
    // prune (the merge theorem is the ENGINE's distribution device; the
    // single sweep is the definition).
    "x239_skyline_suppliers" ->
      """WITH li AS (
        |  SELECT l_suppkey,
        |         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |         CAST(round(l_quantity, 0) AS BIGINT) AS qty,
        |         epoch_us(l_shipdate) - epoch_us(o.o_orderdate) AS delay_us
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |sup AS (
        |  SELECT l_suppkey AS suppkey,
        |         sum(delay_us) // count(*) AS avg_delay_us,
        |         sum(cents) * 10000 // sum(qty) AS cpu_micro
        |  FROM li GROUP BY 1),
        |pts AS (
        |  SELECT avg_delay_us, cpu_micro, count(*) AS n_suppliers,
        |         min(suppkey) AS rep_suppkey
        |  FROM sup GROUP BY 1, 2),
        |sweep AS (
        |  SELECT *, min(cpu_micro) OVER (ORDER BY avg_delay_us, cpu_micro
        |                                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                                 AND 1 PRECEDING) AS best
        |  FROM pts)
        |SELECT CAST(avg_delay_us AS BIGINT) AS avg_delay_us,
        |       CAST(cpu_micro AS BIGINT) AS cpu_micro,
        |       n_suppliers, rep_suppkey
        |FROM sweep WHERE best IS NULL OR best > cpu_micro
        |ORDER BY avg_delay_us, cpu_micro""".stripMargin
  )
}
