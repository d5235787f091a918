package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** x14: multimodal column plumbing — images/audio/video as opaque `binary`
  * columns with a typed metadata struct, processed by a per-partition decode/
  * feature-extract stage.
  *
  * The container has no image/audio codecs, so [[MultimodalOps.decodeStub]]
  * is a clearly-marked DETERMINISTIC FAKE (byte histogram + synthetic
  * dimensions); everything around it — the media schema, the batched
  * mapPartitions shape (one decoder init per partition, the expensive part in
  * a real deployment), partition sizing, and the downstream aggregation — is
  * the real 100 TB plumbing and is tested. Swap `decodeStub` for a codec call
  * and nothing else changes.
  */
object MultimodalOps {

  /** Typed media row: content is opaque bytes + declared format metadata. */
  final case class MediaRow(doc_id: Long, format: String, n_bytes: Long,
                            content: Array[Byte])

  /** Decoded features: dimensions + a 16-bin byte histogram "embedding". */
  final case class MediaFeatures(doc_id: Long, format: String, width: Int,
                                 height: Int, feature: Array[Double])

  /** STUB — stands in for the real codec (javax.imageio / ffmpeg / soundfile
    * is not available in this environment). Deterministic pure function of
    * the bytes so tests and the oracle-of-record (re-running it) are stable. */
  def decodeStub(format: String, bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1)
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    // fake dimensions derived from the payload size, as a real decoder would
    // read from the container header
    val width = 64 + (bytes.length % 64)
    val height = 64 + ((bytes.length / 64) % 64)
    (width, height, hist)
  }

  /** Build the media table: document text bytes standing in for encoded
    * media; format assigned deterministically. At 100 TB this is the layout —
    * one binary column, metadata columns the optimizer can prune/filter on
    * WITHOUT touching the payload. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
              element_at(array(lit("jpeg"), lit("png"), lit("wav"), lit("mp4")),
                         (col("doc_id") % 4 + 1).cast(IntegerType)).as("format"),
              octet_length(col("text")).cast(LongType).as("n_bytes"),
              encode(col("text"), "utf-8").cast(BinaryType).as("content"))
      .as[MediaRow]
  }

  /** The decode/feature-extract stage: mapPartitions so a real decoder is
    * initialized once per partition and rows stream through it batched —
    * the shape a GPU/codec pipeline needs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: decoder/codec/model handle initialized HERE, once
      rows.map { r =>
        val (w, h, feat) = decodeStub(r.format, r.content)
        MediaFeatures(r.doc_id, r.format, w, h, feat)
      }
    }
  }

  /** x14 entry: metadata-pruned scan → per-partition decode → aggregate.
    * Output: per format, count + mean feature-vector norm (rounded). */
  def x14(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, dir))
    feats.toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"),
              sqrt(aggregate(transform(col("feature"), x => x * x),
                             lit(0.0), (a, v) => a + v)).as("norm"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
           round(avg(col("norm")), 6).as("avg_norm"),
           round(avg(col("width")), 6).as("avg_width"),
           round(avg(col("height")), 6).as("avg_height"))
      .orderBy("format")
  }
}
