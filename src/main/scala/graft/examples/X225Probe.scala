package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway probe for the x225 aggregate shapes (r16): times (a) the r15
  * pair+symbol aggregates as two scans, (b) the combined single-scan
  * length-tagged aggregate, (c) pieces in isolation, over the same
  * materialized token frame. Not part of the driver contract. */
object X225Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local(32, 32)
    val toks = graft.engine.Tables.documents(spark, dir)
      .select(explode(filter(split(lower(col("text")), " "), t => t =!= ""))
        .as("tok"))
      .localCheckpoint(true)
    val pairsArr = when(length(col("tok")) >= 2,
      transform(sequence(lit(1), least(length(col("tok")) - 1, lit(32))),
        i => col("tok").substr(i, lit(2))))
      .otherwise(array().cast(ArrayType(StringType)))
    val symsArr = transform(
      sequence(lit(1), least(length(col("tok")), lit(64))),
      i => col("tok").substr(i, lit(1)))
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 3) {
      time("win: pair groupBy+top1") {
        noop(toks.select(explode(pairsArr).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(1))
      }
      time("nsym: countDistinct") {
        noop(toks.select(explode(symsArr).as("sym"))
          .agg(countDistinct(col("sym")).as("nsym")))
      }
      time("combined: tagged groupBy") {
        noop(toks.select(explode(concat(pairsArr, symsArr)).as("s"))
          .groupBy("s").agg(count(lit(1)).as("cnt")))
      }
      time("combined: posexplode2") {
        noop(toks.select(explode(pairsArr).as("s"))
          .unionByName(toks.select(explode(symsArr).as("s")))
          .groupBy("s").agg(count(lit(1)).as("cnt")))
      }
    }
    spark.stop()
  }
}
