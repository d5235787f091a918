package graft

/** DuckDB oracle SQL, round-10 second batch: the edit-distance similarity
  * join, content-defined chunking, the erasure-propagation audit, and
  * temperature-sampled mixing. All four are exact integer / classic-
  * algorithm arithmetic both engines implement identically: unit-cost
  * Levenshtein, the x13 rolling-hash prelude (re-spelled with `lang`
  * carried through), BIGINT cents via the x217 ROUND(x*100) device, and
  * an integer square root built from floor(sqrt) plus a ±1 correction so
  * the temperature weights never touch pow()'s cross-engine ULP drift.
  */
object OracleSqlRound10b {

  /** x223's oracle is GENERATED from the SAME literal sign arrays the
    * engine folds (LlmExt2.qlshSigns) — the x215/x218 pattern: one shared
    * Scala val, two engines running identical BIGINT arithmetic, so the
    * full LSH chain (quantize → 16 sign sums → signature → 8-bit bands →
    * bucket pairs → integer cosine test) verifies end to end. The signs
    * land in the SQL as list literals indexed by dimension. */
  private val x223Sql: String = {
    val signs = graft.queries.LlmExt2.qlshSigns
    val sumbits = signs.zipWithIndex.map { case (s, i) =>
      s"SUM(q * ([${s.mkString(",")}])[i]) AS d$i"
    }.mkString(",\n    ")
    val sig = signs.indices
      .map(i => s"(CASE WHEN d$i > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH qv AS (
       |  SELECT vec_id, gs.i AS i,
       |    CAST(floor(CAST(embedding[gs.i] AS DOUBLE) * 1024) AS BIGINT) AS q
       |  FROM embeddings, generate_series(1, 64) AS gs(i)),
       |sums AS (
       |  SELECT vec_id,
       |    $sumbits,
       |    CAST(SUM(q*q) AS BIGINT) AS nrm
       |  FROM qv GROUP BY vec_id),
       |sigs AS (SELECT vec_id, nrm, $sig AS sig FROM sums),
       |bands AS (
       |  SELECT vec_id, nrm, b.b AS band,
       |    CASE WHEN b.b = 0 THEN sig % 256 ELSE sig // 256 END AS bval
       |  FROM sigs, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) b(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    a.nrm AS na, b.nrm AS nb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT c.vec_a, c.vec_b, c.na, c.nb,
       |    CAST(SUM(qa.q * qb.q) AS BIGINT) AS qdot
       |  FROM cand c
       |  JOIN qv qa ON qa.vec_id = c.vec_a
       |  JOIN qv qb ON qb.vec_id = c.vec_b AND qb.i = qa.i
       |  GROUP BY 1, 2, 3, 4)
       |SELECT vec_a, vec_b, qdot, na, nb FROM dots
       |WHERE qdot > 0 AND 400 * qdot * qdot >= 49 * na * nb
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** x225's oracle is GENERATED one CTE layer per BPE round (the x215
    * device): each layer counts pairs, takes the (cnt desc, pair) argmax,
    * rewrites with the round's placeholder (chr(256+k) — same codepoint
    * the engine uses), and measures the symbol alphabet. Series bounds 32
    * (pair positions, x40's cap) and 64 (symbol positions) both dominate
    * the ≤8-char token length. */
  private val x225Sql: String = {
    val iters = 4
    def layer(k: Int) =
      s"""p$k AS (
         |  SELECT substr(tok, CAST(g.i AS INTEGER), 2) AS pair, COUNT(*) AS cnt
         |  FROM t$k, generate_series(1, 32) AS g(i)
         |  WHERE g.i <= length(tok) - 1 GROUP BY 1),
         |b$k AS (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair LIMIT 1),
         |t${k + 1} AS (
         |  SELECT replace(tok, (SELECT pair FROM b$k), chr(${256 + k})) AS tok
         |  FROM t$k),
         |s${k + 1} AS (
         |  SELECT CAST(COUNT(DISTINCT substr(tok, CAST(g.i AS INTEGER), 1))
         |              AS BIGINT) AS ns
         |  FROM t${k + 1}, generate_series(1, 64) AS g(i)
         |  WHERE g.i <= length(tok))""".stripMargin
    "WITH t0 AS (SELECT x AS tok FROM documents,\n" +
      "  UNNEST([x FOR x IN string_split(LOWER(text), ' ') IF x <> '']) AS u(x)),\n" +
      (0 until iters).map(layer).mkString(",\n") + "\n" +
      (0 until iters).map { k =>
        s"SELECT CAST(${k + 1} AS BIGINT) AS iter, (SELECT pair FROM b$k) AS pair, " +
          s"(SELECT CAST(cnt AS BIGINT) FROM b$k) AS cnt, (SELECT ns FROM s${k + 1}) AS n_symbols"
      }.mkString("\nUNION ALL\n") + "\nORDER BY iter"
  }

  val round10b: Map[String, String] = Map(

    "x223_lsh_portable" -> x223Sql,

    "x225_bpe_iterated" -> x225Sql,

    // x226: the aHash grid replayed char-indexed on the ASCII payloads
    // (x14's device); the block-mean > global-mean bit is the exact
    // cross-multiplied integer test; empty blocks (len < 64) contribute 0.
    "x226_image_ahash_dedup" ->
      """WITH b AS (SELECT doc_id, length(text) AS len, text FROM documents),
        |tot AS (
        |  SELECT b.doc_id,
        |    SUM(ascii(substr(b.text, CAST(u.i AS INTEGER), 1))) AS s_total
        |  FROM b, UNNEST(range(1, len + 1)) AS u(i) GROUP BY 1),
        |bl AS (
        |  SELECT b.doc_id, b.len, b.text, k.k AS k,
        |    (k.k * b.len) // 64 AS lo, ((k.k + 1) * b.len) // 64 AS hi
        |  FROM b, UNNEST(range(0, 64)) AS k(k)),
        |bs AS (
        |  SELECT bl.doc_id, bl.k, bl.hi - bl.lo AS nk,
        |    SUM(ascii(substr(bl.text, CAST(bl.lo + u.i + 1 AS INTEGER), 1))) AS s
        |  FROM bl, UNNEST(range(0, bl.hi - bl.lo)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT bs.doc_id,
        |    CAST(SUM(CASE WHEN bs.k >= 32 AND bs.s * b.len > t.s_total * bs.nk
        |                  THEN CAST(1 AS BIGINT) << (bs.k - 32) ELSE 0 END)
        |         AS BIGINT) AS ahash_hi,
        |    CAST(SUM(CASE WHEN bs.k < 32 AND bs.s * b.len > t.s_total * bs.nk
        |                  THEN CAST(1 AS BIGINT) << bs.k ELSE 0 END)
        |         AS BIGINT) AS ahash_lo
        |  FROM bs JOIN b USING (doc_id) JOIN tot t USING (doc_id) GROUP BY 1)
        |SELECT ahash_hi, ahash_lo, CAST(MIN(doc_id) AS BIGINT) AS rep_doc,
        |       COUNT(*) AS n_docs
        |FROM bits GROUP BY 1, 2 ORDER BY rep_doc""".stripMargin,

    // x224: x13's distinct-fp prelude, the x194 hot-fp cap applied to the
    // SAME universe the engine pairs over, intersection counts from the
    // kept-fp self-join (set semantics — each (doc, fp) is distinct), and
    // the tau = 0.5 decision as 2*|inter| >= |union|, all BIGINT.
    "x224_jaccard_portable" ->
      """WITH d AS (SELECT doc_id,
        |  [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, gs.i AS pos, t[gs.i] AS tok
        |  FROM d, generate_series(1, 256) AS gs(i) WHERE gs.i <= len(t)),
        |coded AS (
        |  SELECT doc_id, pos, code AS c0,
        |    LEAD(code,1) OVER w AS c1, LEAD(code,2) OVER w AS c2,
        |    LEAD(code,3) OVER w AS c3, LEAD(code,4) OVER w AS c4
        |  FROM (SELECT doc_id, pos,
        |        CAST(ascii(substr(tok,1,1))*4096 + ascii(substr(tok,2,1))*64
        |             + length(tok) AS BIGINT) AS code FROM toks)
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |fps AS (
        |  SELECT DISTINCT doc_id,
        |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
        |      % 1000000007 * 131 + c0) % 1000000007 AS fp
        |  FROM coded WHERE c4 IS NOT NULL),
        |kept AS (
        |  SELECT doc_id, fp FROM fps
        |  WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS ix
        |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.a, i.b, i.ix, sa.n AS na, sb.n AS nb,
        |  ix * 1000000 // (sa.n + sb.n - ix) AS j_ppm
        |FROM inter i
        |JOIN sizes sa ON sa.doc_id = i.a
        |JOIN sizes sb ON sb.doc_id = i.b
        |WHERE 2 * i.ix >= sa.n + sb.n - i.ix
        |ORDER BY i.a, i.b""".stripMargin,

    // x219: the pair set is exactly determined by unit-cost Levenshtein,
    // which both engines implement; the length-band predicate is a
    // necessary condition for dist <= 2, so adding it changes nothing
    // semantically (it is the blocking stage the Spark plan relies on).
    "x219_editdist_join" ->
      """WITH names AS (
        |  SELECT p_name AS name, COUNT(*) AS n FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |  a.n AS n_a, b.n AS n_b
        |FROM names a JOIN names b
        |  ON a.name < b.name
        |  AND abs(length(a.name) - length(b.name)) <= 2
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    // x220: x13's positioned rolling-hash prelude with lang carried
    // through; a boundary closes the chunk AT the window where
    // fp % 16 = 0, chunk_idx counts boundaries strictly BEFORE pos, and
    // the trailing partial chunk is kept. chunk_fp is the same Horner
    // chain the engine folds (seed 0 => first step yields the first fp,
    // identical to list_reduce's first-element seed).
    "x220_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, lang,
        |  [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, lang, gs.i AS pos, t[gs.i] AS tok
        |  FROM d, generate_series(1, 256) AS gs(i) WHERE gs.i <= len(t)),
        |coded AS (
        |  SELECT doc_id, lang, pos, code AS c0,
        |    LEAD(code,1) OVER w AS c1, LEAD(code,2) OVER w AS c2,
        |    LEAD(code,3) OVER w AS c3, LEAD(code,4) OVER w AS c4
        |  FROM (SELECT doc_id, lang, pos,
        |        CAST(ascii(substr(tok,1,1))*4096 + ascii(substr(tok,2,1))*64
        |             + length(tok) AS BIGINT) AS code FROM toks)
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |fps AS (
        |  SELECT doc_id, lang, pos,
        |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
        |      % 1000000007 * 131 + c0) % 1000000007 AS fp
        |  FROM coded WHERE c4 IS NOT NULL),
        |bnd AS (
        |  SELECT doc_id, lang, pos, fp,
        |    COALESCE(SUM(CASE WHEN fp % 16 = 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk_idx
        |  FROM fps),
        |chunks AS (
        |  SELECT doc_id, lang, chunk_idx,
        |    CAST(COUNT(*) AS BIGINT) AS n_windows,
        |    list_reduce(list(fp ORDER BY pos),
        |                (a, b) -> (a*131 + b) % 1000000007) AS chunk_fp
        |  FROM bnd GROUP BY 1, 2, 3)
        |SELECT lang,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_windows) AS BIGINT) AS n_windows,
        |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(COUNT(DISTINCT chunk_fp) AS BIGINT) AS n_distinct_chunks,
        |  CAST(MAX(n_windows) AS BIGINT) AS max_chunk_windows,
        |  CAST((COUNT(*) - COUNT(DISTINCT chunk_fp)) * 1000000 // COUNT(*)
        |       AS BIGINT) AS dup_chunk_ppm
        |FROM chunks GROUP BY 1 ORDER BY 1""".stripMargin,

    // x227: the same distinct-fp prelude; the index is the even docs' fp
    // set, hits are the odd docs' fps IN it, the verdict is the exact
    // integer containment test.
    "x227_dedup_incremental" ->
      """WITH d AS (SELECT doc_id,
        |  [x FOR x IN string_split(LOWER(text), ' ') IF x <> ''] AS t
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, gs.i AS pos, t[gs.i] AS tok
        |  FROM d, generate_series(1, 256) AS gs(i) WHERE gs.i <= len(t)),
        |coded AS (
        |  SELECT doc_id, pos, code AS c0,
        |    LEAD(code,1) OVER w AS c1, LEAD(code,2) OVER w AS c2,
        |    LEAD(code,3) OVER w AS c3, LEAD(code,4) OVER w AS c4
        |  FROM (SELECT doc_id, pos,
        |        CAST(ascii(substr(tok,1,1))*4096 + ascii(substr(tok,2,1))*64
        |             + length(tok) AS BIGINT) AS code FROM toks)
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |fps AS (
        |  SELECT DISTINCT doc_id,
        |    ((((((c4*131 + c3) % 1000000007) * 131 + c2) % 1000000007) * 131 + c1)
        |      % 1000000007 * 131 + c0) % 1000000007 AS fp
        |  FROM coded WHERE c4 IS NOT NULL),
        |idx AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
        |nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM fps
        |       WHERE doc_id % 2 = 1 GROUP BY 1),
        |hits AS (
        |  SELECT f.doc_id, COUNT(*) AS n_hit FROM fps f
        |  WHERE f.doc_id % 2 = 1 AND f.fp IN (SELECT fp FROM idx)
        |  GROUP BY 1)
        |SELECT nw.doc_id, nw.n_windows, COALESCE(h.n_hit, 0) AS n_hit,
        |  COALESCE(h.n_hit, 0) * 1000000 // nw.n_windows AS overlap_ppm,
        |  2 * COALESCE(h.n_hit, 0) >= nw.n_windows AS is_dup
        |FROM nw LEFT JOIN hits h ON h.doc_id = nw.doc_id
        |ORDER BY nw.doc_id""".stripMargin,

    // x228: x226's bit chain extended — byte bands, bucket candidates,
    // exact popcount Hamming, rank-1 by (distance, neighbor id); the
    // ROW_NUMBER pick equals the engine's struct-min because (d, nn) is
    // unique per doc.
    "x228_ahash_hamming_nn" ->
      """WITH b AS (SELECT doc_id, length(text) AS len, text FROM documents),
        |tot AS (
        |  SELECT b.doc_id,
        |    SUM(ascii(substr(b.text, CAST(u.i AS INTEGER), 1))) AS s_total
        |  FROM b, UNNEST(range(1, len + 1)) AS u(i) GROUP BY 1),
        |bl AS (
        |  SELECT b.doc_id, b.len, b.text, k.k AS k,
        |    (k.k * b.len) // 64 AS lo, ((k.k + 1) * b.len) // 64 AS hi
        |  FROM b, UNNEST(range(0, 64)) AS k(k)),
        |bs AS (
        |  SELECT bl.doc_id, bl.k, bl.hi - bl.lo AS nk,
        |    SUM(ascii(substr(bl.text, CAST(bl.lo + u.i + 1 AS INTEGER), 1))) AS s
        |  FROM bl, UNNEST(range(0, bl.hi - bl.lo)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |bits AS (
        |  SELECT bs.doc_id,
        |    CAST(SUM(CASE WHEN bs.k >= 32 AND bs.s * b.len > t.s_total * bs.nk
        |                  THEN CAST(1 AS BIGINT) << (bs.k - 32) ELSE 0 END)
        |         AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN bs.k < 32 AND bs.s * b.len > t.s_total * bs.nk
        |                  THEN CAST(1 AS BIGINT) << bs.k ELSE 0 END)
        |         AS BIGINT) AS lo
        |  FROM bs JOIN b USING (doc_id) JOIN tot t USING (doc_id) GROUP BY 1),
        |bands AS (
        |  SELECT doc_id, hi, lo, bb.b AS band,
        |    CASE WHEN bb.b < 4 THEN (lo // (CAST(1 AS BIGINT) << (8 * bb.b))) % 256
        |         ELSE (hi // (CAST(1 AS BIGINT) << (8 * (bb.b - 4)))) % 256 END AS bval
        |  FROM bits, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) bb(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS nn,
        |    a.hi AS ahi, a.lo AS alo, b.hi AS bhi, b.lo AS blo
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id <> b.doc_id),
        |ham AS (
        |  SELECT a, nn,
        |    CAST(bit_count(CAST(xor(ahi, bhi) AS BIGINT))
        |       + bit_count(CAST(xor(alo, blo) AS BIGINT)) AS BIGINT) AS d
        |  FROM cand),
        |nnr AS (
        |  SELECT a, nn, d, ROW_NUMBER() OVER (PARTITION BY a ORDER BY d, nn) AS rk
        |  FROM ham)
        |SELECT a AS doc_id, nn AS nn_doc, d AS hamming
        |FROM nnr WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // x221: the oracle recomputes the cascade set-theoretically (IN /
    // NOT IN over non-null keys) including the three residual scans —
    // orders' and lineitem's are genuine referential checks, customer's
    // is vacuously 0 by predicate erasure (stated, not hidden).
    "x221_erasure_propagation" ->
      """WITH tomb AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0),
        |eo AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM tomb)),
        |el AS (
        |  SELECT l_orderkey, l_extendedprice FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM eo)),
        |stats AS (
        |  SELECT 'customer' AS tbl,
        |    (SELECT COUNT(*) FROM customer) AS rows_before,
        |    (SELECT COUNT(*) FROM tomb) AS rows_erased,
        |    (SELECT CAST(COALESCE(SUM(CAST(ROUND(c_acctbal * 100, 0)
        |        AS BIGINT)), 0) AS BIGINT)
        |     FROM customer WHERE c_custkey % 37 = 0) AS cents_erased,
        |    0 AS residual_after
        |  UNION ALL
        |  SELECT 'orders', (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM eo),
        |    (SELECT CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0)
        |        AS BIGINT)), 0) AS BIGINT) FROM eo),
        |    (SELECT COUNT(*) FROM orders
        |     WHERE o_orderkey NOT IN (SELECT o_orderkey FROM eo)
        |       AND o_custkey IN (SELECT c_custkey FROM tomb))
        |  UNION ALL
        |  SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM el),
        |    (SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100, 0)
        |        AS BIGINT)), 0) AS BIGINT) FROM el),
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM eo)
        |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)))
        |SELECT tbl, rows_before, rows_erased,
        |  rows_before - rows_erased AS rows_after, cents_erased,
        |  CAST(residual_after AS BIGINT) AS residual_after,
        |  residual_after = 0 AS erase_ok
        |FROM stats ORDER BY tbl""".stripMargin,

    // x222: the isqrt CASE is exact because floor(sqrt(m)) is within 1 of
    // the true integer root for every BIGINT in range (IEEE sqrt is
    // correctly rounded); both theorems are recomputed, not stated.
    "x222_temperature_mix" ->
      """WITH mass AS (
        |  SELECT source,
        |    CAST(SUM(len([x FOR x IN string_split(LOWER(text), ' ')
        |                  IF x <> ''])) AS BIGINT) AS m
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, m,
        |    CASE WHEN (CAST(floor(sqrt(m)) AS BIGINT) + 1)
        |              * (CAST(floor(sqrt(m)) AS BIGINT) + 1) <= m
        |           THEN CAST(floor(sqrt(m)) AS BIGINT) + 1
        |         WHEN CAST(floor(sqrt(m)) AS BIGINT)
        |              * CAST(floor(sqrt(m)) AS BIGINT) > m
        |           THEN CAST(floor(sqrt(m)) AS BIGINT) - 1
        |         ELSE CAST(floor(sqrt(m)) AS BIGINT) END AS wt
        |  FROM mass),
        |tot AS (
        |  SELECT CAST(SUM(m) AS BIGINT) AS tm, CAST(SUM(wt) AS BIGINT) AS tw,
        |         MAX(m) AS m_max, MAX(wt) AS w_max FROM w),
        |base AS (
        |  SELECT source, m, wt,
        |    (wt * 1000000) // (SELECT tw FROM tot) AS base,
        |    (wt * 1000000) % (SELECT tw FROM tot) AS rem
        |  FROM w),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM base),
        |fin AS (
        |  SELECT source, m, wt, base,
        |    base + CASE WHEN rk <= 1000000 -
        |        (SELECT CAST(SUM(base) AS BIGINT) FROM base)
        |      THEN 1 ELSE 0 END AS alloc
        |  FROM ranked)
        |SELECT source, m, wt, base, alloc,
        |  (SELECT CAST(SUM(alloc) AS BIGINT) FROM fin) = 1000000 AS sum_ok,
        |  (SELECT w_max * tm <= m_max * tw FROM tot) AS flatten_ok
        |FROM fin ORDER BY source""".stripMargin
  )
}
