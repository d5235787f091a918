package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.engine.Tables

/** Scratch probe (round 16): x119's per-edge intersection both ways —
  * `size(array_intersect(nu, nv))` (hash set + materialized output array
  * per edge) vs the native `sorted_intersect_count` merge kernel — on the
  * identical DAG at sf0.1. Also asserts the two triangle totals agree. */
object X119IntersectProbe {
  private def body(spark: SparkSession, dir: String, native: Boolean): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val edges = li.as("a")
      .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    val adj = oriented.groupBy(col("src").as("n"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val inter =
      if (native) call_function("sorted_intersect_count", col("nu"), col("nv"))
      else size(array_intersect(col("nu"), col("nv"))).cast(LongType)
    val tri = oriented
      .join(adj.select(col("n").as("src"), col("nbrs").as("nu")), "src")
      .join(adj.select(col("n").as("dst"), col("nbrs").as("nv")),
            Seq("dst"), "left")
      .select(when(col("nv").isNull, 0L).otherwise(inter).as("t"))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(tri.agg(sum(col("t")).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // warm both codegen paths
    body(spark, "/root/testdata/sf0.001", native = false).count()
    body(spark, "/root/testdata/sf0.001", native = true).count()
    val a = body(spark, dir, native = false).collect()(0)
    val b = body(spark, dir, native = true).collect()(0)
    require(a == b, s"triangle totals diverge: $a vs $b")
    println(s"[probe] totals agree: $a")
    for (variant <- Seq("hashset", "native", "hashset", "native", "hashset", "native")) {
      val t0 = System.nanoTime()
      body(spark, dir, variant == "native").count()
      println(f"[probe] $variant%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
