package graft

/** Round-12 oracle statements: theorem-form contracts for the four
  * previously `no_oracle` hash-seeded dedup keys (x01/x07/x08/x09).
  *
  * Device (= the round-9 x15/x18/x108 upgrade): each key's emitted rows are
  * an EXACT, hash-free ground truth both engines compute — the exhaustive
  * Jaccard-≥-4/5 pair set (x01/x08), the exact-duplicate token-multiset
  * groups (x07), the exact cosine pairs over the bounded probe slice
  * (x09) — plus an engine-computed contract flag (soundness / exact-dup
  * completeness / band-nesting monotonicity of the REAL LSH / SimHash
  * chains) that the oracle states as TRUE. The DuckDB side recomputes the
  * ground truth with plain ALL-PAIRS joins, so the driver's hash compare
  * additionally proves the engine's prefix-filter no-miss theorem on real
  * data every round.
  */
object OracleSqlRound12 {

  /** Shared exact-Jaccard CTE chain: 3-token shingle sets of
    * `lower(text)` split on single spaces (split keeps empty tokens; a
    * sub-3-token doc yields its single shorter shingle — exactly the native
    * `shingles` expression's semantics), inverted-index all-pairs
    * intersection counts, exact integer threshold J ≥ 4/5 ⟺ 9I ≥ 4(|A|+|B|),
    * value in integer micro-units. */
  private val jaccardCte =
    """WITH t AS (SELECT doc_id, string_split(LOWER(text), ' ') AS toks
      |           FROM documents),
      |idx AS (SELECT doc_id, toks,
      |               UNNEST(generate_series(1, greatest(len(toks) - 2, 1)))
      |                 AS i
      |        FROM t),
      |sh AS (SELECT DISTINCT doc_id,
      |              array_to_string(toks[i:least(i + 2, len(toks))], ' ')
      |                AS shingle
      |       FROM idx),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT inter.a, inter.b,
      |         CAST(ROUND(i * 1000000.0 / (na.n + nb.n - i), 0) AS BIGINT)
      |           AS jacc_micro
      |  FROM inter JOIN sizes na ON na.doc_id = inter.a
      |             JOIN sizes nb ON nb.doc_id = inter.b
      |  WHERE 9 * i >= 4 * (na.n + nb.n))
      |""".stripMargin

  val round12: Map[String, String] = Map(
    // x01 theorem form: the exact Jaccard-≥-4/5 pairs as micro-unit
    // DISTANCES + lsh_ok = TRUE (3-band MinHash soundness + exact-dup
    // completeness, computed for real on the engine side).
    "x01_dedup_minhash_lsh" ->
      (jaccardCte +
        """SELECT a AS doc_a, b AS doc_b,
          |       1000000 - jacc_micro AS jacc_dist_micro, TRUE AS lsh_ok
          |FROM j ORDER BY doc_a, doc_b""".stripMargin),

    // x07 theorem form: exact-duplicate groups by sorted non-empty token
    // multiset (what determines the SimHash vote sums) + simhash_ok = TRUE
    // (per-group fingerprint consistency + corpus-wide separation).
    "x07_dedup_simhash" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |         array_to_string(list_sort(list_filter(
        |           string_split(LOWER(text), ' '), x -> x <> '')), ' ')
        |           AS mkey
        |  FROM documents),
        |g AS (SELECT mkey, MIN(doc_id) AS rep, COUNT(*) AS n_docs
        |      FROM keyed WHERE mkey <> '' GROUP BY mkey)
        |SELECT rep, CAST(n_docs AS BIGINT) AS n_docs, TRUE AS simhash_ok
        |FROM g ORDER BY rep""".stripMargin,

    // x08 theorem form: the same exact pair set as similarities + lsh_ok =
    // TRUE (4-band soundness + exact-dup completeness + 3⊆4 band nesting).
    "x08_dedup_ngram_jaccard" ->
      (jaccardCte +
        """SELECT a, b, jacc_micro, TRUE AS lsh_ok
          |FROM j ORDER BY a, b""".stripMargin),

    // x09 theorem form: exact cosine pairs (micro-units) over the bounded
    // vec_id < 1000 probe slice + lsh_ok = TRUE (banded hyperplane-LSH
    // soundness within the slice).
    "x09_embedding_neardup_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |         list_sum([CAST(embedding[i] AS DOUBLE)
        |                   * CAST(embedding[i] AS DOUBLE)
        |                   FOR i IN generate_series(1, 64)]) AS nrm
        |  FROM embeddings WHERE vec_id < 1000),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         CAST(ROUND(
        |           list_sum([CAST(a.embedding[i] AS DOUBLE)
        |                     * CAST(b.embedding[i] AS DOUBLE)
        |                     FOR i IN generate_series(1, 64)])
        |           / (SQRT(a.nrm) * SQRT(b.nrm)) * 1000000, 0) AS BIGINT)
        |           AS cos_micro
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE a.nrm > 0 AND b.nrm > 0)
        |SELECT vec_a, vec_b, cos_micro, TRUE AS lsh_ok FROM p
        |WHERE cos_micro >= 450000
        |ORDER BY cos_micro DESC, vec_a, vec_b""".stripMargin
  )
}
