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
