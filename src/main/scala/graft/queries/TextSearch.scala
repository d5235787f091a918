package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** x243: phrase search over the corpus — the positional/adjacency query
  * the inverted-index family (x55 postings, x142 BM25, x95 RRF) stopped
  * short of.
  */
object TextSearch {

  /** Adjacent-bigram structs from a filtered token array — pure in-map
    * array arithmetic; the CASE guard keeps `sequence` off the descending
    * [1,0] path a 1-token doc would hit. */
  private val bigramsExpr =
    """CASE WHEN size(ts) < 2 THEN array()
      |ELSE transform(sequence(1, size(ts) - 1),
      |               i -> struct(element_at(ts, i) AS t1,
      |                           element_at(ts, i + 1) AS t2)) END""".stripMargin

  /** x243: PHRASE SEARCH — data-derived two-token phrase queries answered
    * by exact adjacency counting: the 10 highest-df tokens (df desc, token
    * tiebreak) each paired with their most frequent immediate successor
    * (count desc, token tiebreak) form the query set; per phrase the
    * engine reports the head token's df, the number of matching documents,
    * total occurrences, and the first matching doc_id. "Adjacent" means
    * consecutive positions AFTER empty-token filtering — both engines
    * filter the split list before positions exist, so a double space can
    * never shift alignment.
    *
    * 100 TB: three map+aggregate passes over the documents scan, each
    * projecting only (doc_id, text): (1) per-doc `array_distinct` explode
    * → token df (the doc-distinct shuffle never happens — distinctness is
    * settled in the map); (2) bigram explode → corpus bigram counts
    * (vocab²-bounded output, map-side combine); (3) bigram explode joined
    * to the 10 BROADCAST phrases → per-phrase doc stats (the join filters
    * to ~10⁻⁵ of rows before any shuffle). The alternative — materializing
    * a corpus-sized token-position frame to save two scans — loses at
    * scale: scans are cheap and codegen-fused, corpus-sized caches are
    * not. The successor argmax window runs on the vocab-bounded bigram
    * AGGREGATE, never on postings. */
  def x243(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
              filter(split(lower(col("text")), " "), t => t =!= "").as("ts"))

    val df = docs
      .select(explode(array_distinct(col("ts"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val top10 = df.orderBy(col("df").desc, col("tok").asc).limit(10)

    val bigr = docs
      .select(explode(expr(bigramsExpr)).as("pr"))
      .groupBy(col("pr.t1").as("t1"), col("pr.t2").as("t2"))
      .agg(count(lit(1)).as("n_occ"))

    val succ = bigr
      .join(broadcast(top10), bigr("t1") === top10("tok"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("t1"))
              .orderBy(col("n_occ").desc, col("t2").asc)))
      .filter(col("rn") === 1)
      .select(col("t1"), col("t2"), col("df").as("df1"), col("n_occ"))

    docs
      .select(col("doc_id"), explode(expr(bigramsExpr)).as("pr"))
      .select(col("doc_id"), col("pr.t1").as("t1"), col("pr.t2").as("t2"))
      .join(broadcast(succ), Seq("t1", "t2"))
      .groupBy("t1", "t2", "df1", "n_occ")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           min(col("doc_id")).as("first_doc"))
      .select(concat(col("t1"), lit(" "), col("t2")).as("phrase"),
              col("df1").cast(LongType).as("df1"),
              col("n_docs"), col("n_occ"),
              col("first_doc").cast(LongType).as("first_doc"))
      .orderBy("phrase")
  }
}
