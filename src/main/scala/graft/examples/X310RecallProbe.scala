package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** x310 IVF-PQ recall evidence: recall@20 of the IVF-PQ search vs the
  * exact brute-force top-20 at every testdata scale factor, next to
  * x18's IVF-flat recall — the measured numbers the x310 scaladoc and
  * recall-floor flag cite.
  *
  * Usage: runMain graft.examples.X310RecallProbe [sfDir ...]
  */
object X310RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                        "/root/testdata/sf0.1")
    val spark: SparkSession = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val exact = graft.queries.AnnIvf.x310(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val pq = graft.queries.AnnIvf.x310Raw(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val ivf = graft.queries.AnnIvf.x18Raw(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"[x310-probe] $dir  ivf-pq recall@20 = ${(exact & pq).size}/20" +
        s"  (x18 ivf-flat = ${(exact & ivf).size}/20)")
    }
    spark.stop()
  }
}
