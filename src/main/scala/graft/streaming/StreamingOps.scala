package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming operators x02–x04 (SURVEY.md §2.5): the
  * streaming-proper twins of the batch window queries q35/q37.
  *
  * Transform builders are factored out so ScalaTest can drive the SAME logical
  * plan from a MemoryStream (asserting batch-twin equality and late-data
  * semantics), while the `queries` entries replay the events parquet through a
  * file streaming source with Trigger.AvailableNow into a memory sink — the
  * genuine streaming runtime (watermark tracking, state store, incremental
  * execution), deterministic because all data is in order within one replay.
  *
  * 100 TB posture: all three are keyed-state streaming aggs; state size is
  * bounded by (windows × types) / live sessions, and the watermark GCs state.
  */
object StreamingOps {

  /** x02 transform: tumbling 1h count/sum with a 10-minute watermark. */
  def tumblingWithWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast(DecimalType(18, 2))).as("sv"))
      .select(unix_micros(col("window.start")).as("bucket_us"),
              col("event_type"), col("cnt"), col("sv"))

  /** x03 transform: 30-minute-gap session windows per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))

  /** x04 transform: tumbling count in Update mode semantics (late rows beyond
    * the watermark are dropped; in-watermark updates re-emit). */
  def lateDataCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("bucket_us"), col("cnt"))

  /** The events parquet replayed as a genuine stream. The file source wants a
    * directory, so we stage a /tmp dir holding a symlink to the (read-only)
    * events.parquet of the requested scale factor. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val staged = java.nio.file.Paths.get(
      "/tmp/graft_stream", dir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(staged)
    val link = staged.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(dir, "events.parquet"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Runs a streaming transform to completion (AvailableNow) into a memory
    * sink and returns the result table. */
  private def runToTable(spark: SparkSession, streamed: DataFrame,
                         name: String, outputMode: String): DataFrame = {
    // streaming state stores are per shuffle partition; these replays carry
    // tiny keyed state, so 8 partitions beat the batch default (the value is
    // fixed into the query at start and restored for batch work after)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = streamed.writeStream
        .format("memory").queryName(name)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** x02 entry: equals q35 on in-order replay (complete mode, no late data). */
  def x02(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, tumblingWithWatermark(eventsStream(spark, dir)),
               s"x02_sink_${System.nanoTime()}", "complete")
      .orderBy("bucket_us", "event_type")

  /** x03 entry: per-user session count must equal q37's session count. */
  def x03(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, sessionWindows(eventsStream(spark, dir)),
               s"x03_sink_${System.nanoTime()}", "complete")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
                              sum(col("n_events")).as("n_events"))
      .orderBy("user_id")

  /** x04 entry: update-mode machinery on the same replay; MemoryStream tests
    * assert the actual late/out-of-order dropping. */
  def x04(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, lateDataCounts(eventsStream(spark, dir)),
               s"x04_sink_${System.nanoTime()}", "update")
      .groupBy("bucket_us").agg(max(col("cnt")).as("cnt"))
      .orderBy("bucket_us")
}
