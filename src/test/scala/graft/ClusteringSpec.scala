package graft

import org.scalatest.funsuite.AnyFunSuite

/** x140 deterministic k-means / x141 PQ encode / x142 BM25 — structural
  * invariants the DuckDB hash compare can't state (it checks equality, not
  * WHY the numbers are right). */
class ClusteringSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables

  private lazy val nVecs = Tables.embeddings(spark, sfSmoke).count()
  private lazy val km = graft.queries.Clustering.x140(spark, sfSmoke).collect()
  private lazy val pq = graft.queries.Clustering.x141(spark, sfSmoke).collect()

  test("x140 cells partition the corpus: populations sum to |V|, d2 >= 0") {
    assert(km.map(_.getLong(1)).sum === nVecs)
    assert(km.forall(_.getDouble(2) >= 0.0))
    assert(km.map(_.getLong(0)).distinct.length === km.length)
  }

  test("x140 Lloyd round 2 does not increase total inertia") {
    // the defining property of Lloyd iteration: reassignment to the updated
    // centroids can only lower each vector's distance, so round-2 inertia
    // (vs the ROUND-1 centroids' own assignment cost) must not rise.
    // Computed against the same rounded-centroid protocol the query uses.
    val emb = Tables.embeddings(spark, sfSmoke).select("vec_id", "embedding")
    val c0 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"),
              transform(col("embedding"), _.cast("double")).as("ce"))
    val d2 = expr(
      """aggregate(zip_with(ce, embedding,
        |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
        |  0D, (s, x) -> s + x)""".stripMargin)
    val round1 = emb.crossJoin(broadcast(c0)).withColumn("d2", round(d2, 6))
      .groupBy("vec_id").agg(min(col("d2")).as("d2"))
      .agg(sum("d2")).head.getDouble(0)
    val round2 = km.map(r => r.getDouble(2) * r.getLong(1)).sum
    assert(round2 <= round1 + 1e-6,
      s"round-2 inertia $round2 above round-1 $round1")
  }

  test("x141 every (vector, subspace) is encoded exactly once") {
    // 4 subspaces, each vector encoded once per subspace; codes from the
    // 8-word codebook; reconstruction error non-negative
    val bySub = pq.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySub.keySet === Set(0L, 1L, 2L, 3L))
    bySub.foreach { case (s, n) => assert(n === nVecs, s"subspace $s") }
    assert(pq.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    assert(pq.forall(_.getDouble(3) >= 0.0))
  }

  test("x141 codeword vectors reconstruct themselves: every code is used in every subspace") {
    // vec_id 0..7 ARE the codewords, so each code's own vector sits at
    // distance 0 from it and the (d2, code) argmin must keep it there —
    // hence all 8 codes appear in all 4 subspaces: the full 32-group grid
    val grid = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid === (for (s <- 0L to 3L; c <- 0L to 7L) yield (s, c)).toSet)
  }

  test("x141 mean_err is the exact BIGINT-micros mean, recomputed per cell") {
    // the round-8 failure mode: ROUND(AVG(double),6) sat one ulp from the
    // 5e-7 boundary on cell (sub 0, code 4) and the two engines rounded in
    // opposite directions. The fix sums 6-dp-rounded d2 as exact integer
    // micros and divides ONCE — recompute every cell's mean that way from
    // the raw per-(vector, subspace) assignments and demand bit equality.
    val emb = Tables.embeddings(spark, sfSmoke).select("vec_id", "embedding")
    val cb = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("code"),
              transform(col("embedding"), _.cast("double")).as("ce"))
    val best = emb.withColumn("sub", explode(sequence(lit(0), lit(3))))
      .crossJoin(broadcast(cb))
      .withColumn("d2", round(expr(
        """aggregate(zip_with(slice(ce, sub * 16 + 1, 16),
          |                   slice(embedding, sub * 16 + 1, 16),
          |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
          |  0D, (s, x) -> s + x)""".stripMargin), 6))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("code"), col("d2")),
                  struct(col("d2"), col("code"))).as("best"))
      .select(col("sub").cast("long").as("subspace"),
              col("best.code").as("code"), col("best.d2").as("d2"))
      .collect()
    val byCell = best.groupBy(r => (r.getLong(0), r.getLong(1)))
    pq.foreach { r =>
      val cell = (r.getLong(0), r.getLong(1))
      val ds = byCell(cell).map(_.getDouble(2))
      val micros = ds.map(d => math.round(d * 1e6)).sum // exact: d2 is 6-dp
      // replicate the engine's emit exactly: ONE double division of the
      // exact integer by (n·1e6), then HALF_UP at 6 dp — both engines
      // perform this identical sequence on identical exact inputs.
      val expected = BigDecimal(micros.toDouble / (ds.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(2) === ds.length.toLong, s"cell $cell population")
      assert(math.abs(r.getDouble(3) - expected) < 1e-12,
        s"cell $cell: mean_err ${r.getDouble(3)} != exact $expected")
    }
  }

  test("trained PQ codebooks: reconstruction error never exceeds the fixed codebook's") {
    // the production path VERDICT r8 asked for: per-subspace Lloyd-trained
    // codebooks (init = x141's fixed first-8, so training strictly
    // refines the shipped codebook) must not be WORSE than the fixed one
    // on the training objective — and with real Lloyd rounds, strictly
    // better here. Errors are exact integer micros, so the comparison is
    // bit-precise, not a float tolerance.
    import graft.queries.Clustering
    val fixedErr = Clustering.pqTotalErrMicros(spark, sfSmoke,
      Clustering.fixedCodebook(spark, sfSmoke))
    val t1 = Clustering.pqTotalErrMicros(spark, sfSmoke,
      Clustering.trainedCodebooks(spark, sfSmoke, rounds = 1))
    val t2 = Clustering.pqTotalErrMicros(spark, sfSmoke,
      Clustering.trainedCodebooks(spark, sfSmoke, rounds = 2))
    assert(t1 <= fixedErr, s"1-round trained $t1 must not exceed fixed $fixedErr")
    assert(t2 <= t1 + (t1 / 100000L + 1L), // Lloyd monotone modulo 6-dp rounding
      s"round 2 ($t2) must not regress round 1 ($t1) beyond rounding slack")
    assert(t1 < fixedErr,
      "training should strictly improve on this corpus — vacuous otherwise")
  }

  test("trained PQ encode keeps the exact x141 output contract") {
    val tr = graft.queries.Clustering.pqEncodeTrained(spark, sfSmoke).collect()
    // same schema/grid semantics as x141: populations partition the corpus
    // per subspace, codes in [0,8), errors non-negative
    val bySub = tr.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySub.keySet === Set(0L, 1L, 2L, 3L))
    bySub.foreach { case (s, n) => assert(n === nVecs, s"subspace $s") }
    assert(tr.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 8))
    assert(tr.forall(_.getDouble(3) >= 0.0))
    // and the per-cell weighted mean_err total must equal the trained
    // objective within per-cell rounding (32 cells × half-micro each)
    val fromGrid = tr.map(r => math.round(r.getDouble(3) * 1e6) * r.getLong(2)).sum
    val exact = graft.queries.Clustering.pqTotalErrMicros(spark, sfSmoke,
      graft.queries.Clustering.trainedCodebooks(spark, sfSmoke))
    assert(math.abs(fromGrid - exact) <= 32L * tr.map(_.getLong(2)).max / 2 + 32L,
      s"grid-implied total $fromGrid vs exact $exact")
  }

  test("ADC estimates obey the quantization-radius bound; training shrinks the radius") {
    // The serving half of VERDICT r8's ask: trainedCodebooks must drop
    // into the ADC path (pqAdcTopK = x182's arithmetic, codebook-
    // parameterized). The guarantee PQ actually makes — and the one Lloyd
    // training improves — is the RADIUS bound, per database vector v with
    // code c(v):  |√d_adc(q,v) − √d_true(q,v)| ≤ ‖v − c(v)‖
    // (triangle inequality on the concatenated subspaces). A first cut of
    // this spec asserted trained single-query MAE ≤ fixed MAE instead —
    // NOT a theorem (training minimizes the reconstruction radius, not
    // one particular query's signed ADC errors, which can average worse)
    // and it failed for real on this corpus. So: pin the radius bound for
    // BOTH codebooks, and pin that training shrinks the mean radius — the
    // guarantee the trained serving path actually delivers.
    import graft.queries.Clustering
    val emb = Tables.embeddings(spark, sfSmoke).select("vec_id", "embedding")
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val nAll = vecs.size
    val qv = vecs(0L)
    val truth = vecs.map { case (id, v) =>
      id -> v.indices.map { i =>
        val d = qv(i).toDouble - v(i).toDouble; d * d }.sum
    }
    def totalSqRadius(cb: org.apache.spark.sql.DataFrame): Double = {
      // radius²(v) = Σ_sub best d2; ADC must sit within radius of truth
      val rad2 = Clustering.pqAssign(emb, cb)
        .groupBy("vec_id").agg(org.apache.spark.sql.functions.sum("d2").as("r2"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val adc = Clustering.pqAdcTopK(spark, sfSmoke, cb, k = nAll).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toDouble / 1e6).toMap
      assert(adc.size === nAll, "ADC must score every vector")
      adc.foreach { case (id, a) =>
        val bound = math.sqrt(rad2(id)) + 1e-3 // 6-dp rounding slack ×8 terms
        val err = math.abs(math.sqrt(a) - math.sqrt(truth(id)))
        assert(err <= bound,
          s"vec $id: |√adc − √true| = $err exceeds radius $bound")
      }
      rad2.values.sum // total squared radius — the Lloyd objective
    }
    val rFixed = totalSqRadius(Clustering.fixedCodebook(spark, sfSmoke))
    val rTrained = totalSqRadius(Clustering.trainedCodebooks(spark, sfSmoke))
    // Lloyd from the fixed init is monotone non-increasing in THIS
    // objective (tiny slack for the 6-dp codeword/distance rounding)
    assert(rTrained <= rFixed * (1 + 1e-6),
      s"training must not grow total squared radius: $rTrained vs $rFixed")
    assert(rFixed > 0.0, "vacuous if every vector is its own codeword")
  }

  test("x142 one best term per doc, positive scores, term appears in the doc") {
    val bm = graft.queries.Clustering.x142(spark, sfSmoke).collect()
    assert(bm.map(_.getLong(0)).distinct.length === bm.length)
    assert(bm.forall(_.getDouble(2) > 0.0), "BM25+1 idf is strictly positive")
    val texts = Tables.documents(spark, sfSmoke)
      .filter(col("doc_id") < 50).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ").toSet)
      .toMap
    bm.foreach { r =>
      assert(texts(r.getLong(0)).contains(r.getString(1)),
        s"doc ${r.getLong(0)}: winning term not in document")
    }
  }
}
