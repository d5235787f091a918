package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.queries.LlmExt2

/** Scratch probe (round 16): the dedup exact-Jaccard CONFIRM stage both
  * ways — `size(array_intersect(sha, shb))` (materializes the near-full
  * intersection array per candidate pair) vs the count-only
  * `intersect_count` hash kernel — on the real x08 banded candidates at
  * sf0.1. The candidate ids and shingle frame are materialized once
  * outside the timed region so the legs time ONLY the confirm re-attach
  * and the Jaccard cut. Asserts both forms pass identical pair counts. */
object X08ConfirmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.1")
    val shSets = LlmExt2.shingleSets(docs).localCheckpoint(true)
    val sigs = LlmExt2.minhashSigs(shSets, 4).localCheckpoint(true)
    val keys = sigs.select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          struct(col(s"mh${2 * b}").as("b0"), col(s"mh${2 * b + 1}").as("b1"))): _*)))
      .select(col("doc_id"), col("pos").as("band"),
              col("col.b0").as("b0"), col("col.b1").as("b1"))
    val cand = keys.as("ka").join(keys.as("kb"),
        col("ka.band") === col("kb.band") && col("ka.b0") === col("kb.b0") &&
        col("ka.b1") === col("kb.b1") && col("ka.doc_id") < col("kb.doc_id"))
      .select(col("ka.doc_id").as("a"), col("kb.doc_id").as("b")).distinct()
      .localCheckpoint(true)
    println(s"[probe] candidates = ${cand.count()}")

    def confirm(native: Boolean): DataFrame = {
      val inter =
        if (native) call_function("intersect_count", col("sha"), col("shb"))
        else size(array_intersect(col("sha"), col("shb"))).cast(LongType)
      cand
        .join(shSets.select(col("doc_id").as("a"), col("shingles").as("sha")), "a")
        .join(shSets.select(col("doc_id").as("b"), col("shingles").as("shb")), "b")
        .select(col("a"), col("b"), inter.as("inter"),
                size(col("sha")).cast(LongType).as("na"),
                size(col("shb")).cast(LongType).as("nb"))
        .filter(col("inter") * 9 >= (col("na") + col("nb")) * 4)
        .select(col("a"), col("b"),
                round(col("inter") * lit(1000000.0) /
                      (col("na") + col("nb") - col("inter")), 0)
                  .cast(LongType).as("jacc_micro"))
    }
    val ref = confirm(native = false).collect().map(_.toSeq).sortBy(_.toString)
    val nat = confirm(native = true).collect().map(_.toSeq).sortBy(_.toString)
    require(ref.toSeq == nat.toSeq, "confirm outputs diverge")
    println(s"[probe] outputs agree: ${ref.length} confirmed pairs")
    for (variant <- Seq("hashset", "native", "hashset", "native",
                        "hashset", "native")) {
      val t0 = System.nanoTime()
      confirm(variant == "native").count()
      println(f"[probe] $variant%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
