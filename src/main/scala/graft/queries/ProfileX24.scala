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
    for (i <- 1 to 4)
      time(s"full x24 #$i")(graft.queries.Pipeline.x24(spark, dir).count())
    // replicate the loop with round timings
    val docsDf = docs
    val nbMin = edges.groupBy("u").agg(min(col("v")).as("nb"))
    var labels = docsDf.select(col("doc_id").as("node"))
      .join(nbMin, col("node") === col("u"), "left")
      .select(col("node"),
              least(col("node"), coalesce(col("nb"), col("node"))).as("label"))
      .localCheckpoint(true)
    def labelSum(d: org.apache.spark.sql.DataFrame): Long = {
      val row = d.agg(sum(col("label"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      time(s"round $rounds") {
        val prop = edges.join(labels, col("v") === col("node"))
          .select(col("u").as("node"), col("label"))
        val nm = labels.unionByName(prop)
          .groupBy("node").agg(min(col("label")).as("label"))
        val jumped = nm.as("x")
          .join(nm.select(col("node").as("jn"), col("label").as("jl")).as("y"),
                col("x.label") === col("jn"), "left")
          .select(col("x.node").as("node"),
                  least(col("x.label"), coalesce(col("jl"), col("x.label"))).as("label"))
        val next = jumped.localCheckpoint(true)
        val s = labelSum(next)
        labels = next
        converged = s == prevSum
        prevSum = s
        rounds += 1
      }
    }
    println(s"[profile] rounds = $rounds")
    spark.stop()
  }
}
