package graft.queries

import org.apache.spark.sql.functions._

/** Scratch profiler for x24's stages (not part of the registered surface). */
object ProfileX24 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(32, 32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    graft.queries.Pipeline.x24(spark, "/root/testdata/sf0.001").count()
    val docs = graft.engine.Tables.documents(spark, dir)
    val fp = graft.queries.LlmExt2.docFingerprints(docs).distinct()
    time("fingerprints.count")(fp.count())
    time("fingerprints.count warm")(fp.count())
    val edges = time("star edges build+persist") {
      val e = graft.queries.Pipeline.fingerprintStarEdges(fp).persist()
      e.count(); e
    }
    println(s"[profile] edges rows = ${edges.count()}")
    time("full x24")(graft.queries.Pipeline.x24(spark, dir).count())
    time("full x24 again")(graft.queries.Pipeline.x24(spark, dir).count())
    spark.stop()
  }
}
