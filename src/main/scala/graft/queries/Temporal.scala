package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** q35–q37: batch twins of the streaming operators (tumbling, sliding,
  * session windows). The streaming-proper versions live in
  * [[graft.streaming.StreamingOps]] and are asserted equal to these on
  * in-order data.
  */
object Temporal {
  private val dec = DecimalType(18, 2)

  /** q35: tumbling 1h buckets — plain hash agg on (hour, type); at 100 TB this
    * is one shuffle whose key cardinality is tiny (720 h × 5 types). */
  def q35(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("bucket_us"),
               col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           // exact decimal sum internally; double out (output-type protocol)
           graft.engine.OutTypes.money(sum(col("value").cast(dec))).as("sv"))
      .orderBy("bucket_us", "event_type")

  /** q36: 1h windows sliding 15min via the native `window()` generator — each
    * event lands in exactly 4 overlapping buckets; the epoch-aligned grid
    * matches the oracle's floor(epoch_us/900e6) arithmetic. */
  def q36(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .groupBy(unix_micros(col("w.start")).as("win_start_us"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("win_start_us")

  /** q37: 30-min-gap sessionization — lag marks session starts, a running sum
    * assigns session ids, then one agg per (user, session). Both window passes
    * share the same (user_id) partitioning, so Spark plans a single exchange. */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        // >= not >: mirrors session_window's half-open [start, last+gap) —
        // an event at EXACTLY last+gap opens a new session, so the batch rule,
        // the streaming twin (x03), and the custom-state twin (x19) all agree
        // at the boundary regardless of data refresh (ADVICE r2).
        when(col("prev_us").isNull || col("us") - col("prev_us") >= 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
           min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .orderBy("user_id", "sid")
  }
}
