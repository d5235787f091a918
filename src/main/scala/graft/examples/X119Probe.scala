package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** Scratch probe: compare x119 formulations (ReuseExchange-reliant vs
  * persist-disciplined vs persist+AQE-cache-partitioning) at sf0.1. */
object X119Probe {
  private def body(spark: SparkSession, dir: String,
                   persistFrames: Boolean): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    var edges = li.as("a")
      .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    if (persistFrames) edges = edges.persist()
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    var oriented = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    if (persistFrames) oriented = oriented.persist()
    val adj = oriented.groupBy(col("src").as("n"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("n").as("src"), col("nbrs").as("nu")), "src")
      .join(adj.select(col("n").as("dst"), col("nbrs").as("nv")),
            Seq("dst"), "left")
      .select(when(col("nv").isNull, 0L)
        .otherwise(size(array_intersect(col("nu"), col("nv"))).cast(LongType))
        .as("t"))
    val out = edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(tri.agg(sum(col("t")).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
    if (persistFrames) {
      val r = out.localCheckpoint(true)
      edges.unpersist(); oriented.unpersist()
      r
    } else out
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // warm
    body(spark, "/root/testdata/sf0.001", persistFrames = false).count()
    body(spark, "/root/testdata/sf0.001", persistFrames = true).count()
    for (variant <- Seq("reuse", "persist", "persist", "reuse")) {
      val t0 = System.nanoTime()
      val n = body(spark, dir, variant == "persist").count()
      println(f"[probe] $variant%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    spark.stop()
  }
}
