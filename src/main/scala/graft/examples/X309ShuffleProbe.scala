package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Shuffle-byte evidence for x309 (VERDICT r13 task 3): the substring-dedup
  * site aggregate keyed by the 13-token gram STRING (x298's oracle-verbatim
  * key) versus the 64-bit `rolling_fps` fingerprint (x309's production
  * key). Both chains flag the same duplicated positions (x309's fp_ok
  * containment theorem); the fingerprint cuts the per-position shuffle
  * payload from ~80 B of gram text to 8 B, and this probe measures the
  * realized whole-chain shuffle-write bytes at sf0.1.
  *
  * Usage: runMain graft.examples.X309ShuffleProbe [sfDir]
  */
object X309ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark: SparkSession = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def measure(label: String)(body: => Long): Long = {
      body // warm (listing/codegen)
      Thread.sleep(2000); bytes.set(0)
      val rows = body
      Thread.sleep(2000) // listener events drain asynchronously
      val b = bytes.get
      println(f"[x309-probe] $label%-12s ${b / 1024.0 / 1024.0}%8.2f MB shuffle write, $rows%8d rows")
      b
    }
    val gram = measure("gram-keyed") {
      graft.queries.LlmExt2.x298(spark, dir).count()
    }
    val docs = graft.engine.Tables.fanOut(
      graft.engine.Tables.documents(spark, dir).select("doc_id", "text"))
    val fp = measure("fp-keyed") {
      graft.queries.LlmExt2.x309FpFlagged(docs, 13).count()
    }
    println(f"[x309-probe] cut: ${gram.toDouble / fp}%.1fx")
    spark.stop()
  }
}
