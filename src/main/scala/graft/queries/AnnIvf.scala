package graft.queries

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{Tables, VectorKernels}

/** x18: IVF (inverted-file) approximate nearest-neighbor search — the
  * partition-based ANN structure complementing the LSH one (x09).
  *
  * Build: KMeans (fixed seed) coarse-quantizes the corpus into nlist cells;
  * every vector is assigned to its nearest centroid — at 100 TB the
  * assignment is one broadcast-centroid map pass and cells become the
  * partitioning/clustering key of the stored table.
  * Query: probe only the nprobe nearest cells (centroid distances computed on
  * the driver against the tiny centroid set), then exact cosine inside the
  * probed cells — the scan shrinks by ≈ nlist/nprobe while recall stays high
  * for clustered data. Recall vs the exact q45 is property-tested.
  */
object AnnIvf {
  private val nlist = 16
  private val nprobe = 4
  private val dim = 64

  /** Cell assignments + centroids for an arbitrary embeddings frame.
    * The prediction function is deterministic: identical vectors always land
    * in the same cell — the property the x111 recall matrix pins. */
  private[queries] def quantizeEmb(emb: DataFrame): (DataFrame, Array[Array[Double]]) = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val feats = emb.withColumn("features", toVec(col("embedding")))
    val km = new KMeans().setK(nlist).setSeed(7L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(feats)
    (model.transform(feats).select(col("vec_id"), col("embedding"), col("cell")),
     model.clusterCenters.map(_.toArray))
  }

  /** Cell assignments + centroids for the embeddings table. */
  private def quantize(spark: SparkSession, dir: String): (DataFrame, Array[Array[Double]]) =
    quantizeEmb(Tables.embeddings(spark, dir))

  /** `(qid, cell)` rows: the `np` nearest IVF cells per query vector, ranked
    * by Euclidean centroid distance with cell id as the deterministic
    * tie-break (same order [[x18]] uses driver-side for its single query).
    * Fully distributed: queries × centroids is a broadcast of the TINY
    * centroid set (nlist rows — at 100 TB still nlist rows), the distance is
    * a codegen'd `zip_with`/`aggregate` fold, and the per-query rank window
    * partitions on qid — never a global window. A query assigned to cell c
    * always probes c first (its own centroid is its nearest by definition of
    * the assignment), which is what makes twin recall exact at any np >= 1.
    *
    * `queries` must have columns `(qid, qe)`; result preserves that grain. */
  private[queries] def probedCells(queries: DataFrame,
                                   centers: Array[Array[Double]],
                                   np: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    import org.apache.spark.sql.expressions.Window
    queries.join(broadcast(cents))
      .withColumn("dist2", expr(
        """aggregate(zip_with(centroid, qe,
          |  (a, b) -> (a - CAST(b AS DOUBLE)) * (a - CAST(b AS DOUBLE))),
          |  0D, (s, x) -> s + x)""".stripMargin))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("dist2"), col("cell"))))
      .filter(col("probe_rank") <= np)
      .select(col("qid"), col("qe"), col("cell"))
  }

  /** Top-`k` IVF search for a whole query frame at probe width `np`:
    * candidates are the vectors of the probed cells (self excluded), ranked
    * per query by (cosine desc, vec_id) — the same total order the exact
    * q45 baseline uses, so a full probe (np = nlist) reproduces brute force
    * EXACTLY and the AnnIvfSpec recall curve is monotone by construction. */
  private[graft] def ivfTopK(emb: DataFrame, queries: DataFrame,
                             np: Int, k: Int): DataFrame = {
    val (assigned, centers) = quantizeEmb(emb)
    import org.apache.spark.sql.expressions.Window
    probedCells(queries, centers, np)
      .join(assigned, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorKernels.cosine6(col("embedding"), col("qe"))
        .cast(DoubleType))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rk"))
  }

  /** x18 entry: top-20 cosine neighbors of vec_id 0 searching only the
    * nprobe nearest IVF cells. */
  def x18(spark: SparkSession, dir: String): DataFrame = {
    val (assigned, centers) = quantize(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double =
      c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    val probed = centers.zipWithIndex.sortBy { case (c, i) => (dist2(c), i) }
      .take(nprobe).map(_._2)
    val qdf = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    assigned
      .filter(col("cell").isin(probed.map(Integer.valueOf): _*) && col("vec_id") =!= 0)
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"),
              VectorKernels.cosine6(col("embedding"), col("qe"))
                .cast(DoubleType).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(20)
  }
}
