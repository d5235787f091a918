package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** x02–x04: streaming twins equal their batch queries on in-order data, and
  * the watermark actually drops late rows (SURVEY.md §2.5). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                        event_type: String, value: Double, props: String)

  private def runStream(mem: MemoryStream[Ev],
                        transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String, name: String,
                        batches: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
    val q = transform(mem.toDF).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    for (b <- batches) { mem.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("x02 streaming tumbling == q35 batch on in-order replay") {
    val batch = graft.queries.Temporal.q35(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val stream = graft.streaming.StreamingOps.x02(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(stream === batch)
  }

  test("x03 streaming session count == q37 batch sessions per user") {
    val batch = graft.queries.Temporal.q37(spark, sfSmoke)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
                              sum("n_events").as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val stream = graft.streaming.StreamingOps.x03(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stream === batch)
  }

  test("x04 watermark drops rows later than 10 minutes (update mode)") {
    val mem = MemoryStream[Ev](spark)
    val out = runStream(mem, graft.streaming.StreamingOps.lateDataCounts,
      "update", "x04_test",
      batches = Seq(
        // batch 1: minute 0 and minute 130 → watermark advances to 120, which
        // expires the hour-0 window (end 60 ≤ 120)
        Seq(Ev(1, ts(0), 1, "view", 1.0, "{}"), Ev(2, ts(130), 1, "view", 1.0, "{}")),
        // batch 2: minute 10 lands in the EXPIRED hour-0 window → DROPPED;
        //          minute 125 updates the still-open hour-2 window → counted
        Seq(Ev(3, ts(10), 1, "view", 1.0, "{}"), Ev(4, ts(125), 1, "view", 1.0, "{}"))))
    val byBucket = out.groupBy("bucket_us").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byBucket(0L) === 1L, "hour-0 window stays at 1: the late minute-10 row was dropped")
    assert(byBucket(7200000000L) === 2L, "hour-2 window got the in-watermark update")
  }

  test("x02 transform drops nothing when data arrives in order (MemoryStream)") {
    val mem = MemoryStream[Ev](spark)
    val evs = (0 until 120 by 7).map(m => Ev(m.toLong, ts(m.toLong), 1L, "view", 1.0, "{}"))
    val out = runStream(mem, graft.streaming.StreamingOps.tumblingWithWatermark,
      "complete", "x02_test", batches = Seq(evs))
    val total = out.agg(sum("cnt")).head().getLong(0)
    assert(total === evs.size.toLong)
  }
}
