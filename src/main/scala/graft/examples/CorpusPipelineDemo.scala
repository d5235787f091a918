package graft.examples

import org.apache.spark.sql.functions._

/** End-to-end training-corpus pipeline, composed from the registered
  * operators — the "user of the reference switches to this library" story
  * run as one program. Stages (each is an oracle-checked operator on its
  * own; here they CHAIN, each reading the previous stage's frame, the way a
  * production curation DAG would):
  *
  *   raw documents
  *     → quality gate (x47's score-and-threshold rule)
  *     → exact dedup on normalized text (q44's key)
  *     → near-dup candidate removal via portable MinHash-LSH (x86's pairs;
  *       keep the lower doc_id of every pair — star-survivor rule)
  *     → decontamination against the "eval" split (x21's anti-join)
  *     → temperature-reweighted source mix report (x90 over survivors)
  *
  * Run: sbt "runMain graft.examples.CorpusPipelineDemo [sfDir]"
  * Prints per-stage row counts and the final mix; asserts monotone
  * shrinkage so a drive-by regression is loud.
  */
object CorpusPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(8, 8)
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"

    val docs = graft.engine.Tables.documents(spark, dir)
    val n0 = docs.count()

    // 1. quality gate: keep docs above the x47/x11-style floor
    val scored = docs
      .withColumn("toks", filter(split(lower(col("text")), " "), t => t =!= ""))
      .filter(size(col("toks")) >= 5)
      .withColumn("quality",
        least(col("n_chars") * 1.0 / 500, lit(1.0)) * 0.4 +
        (size(array_distinct(col("toks"))) * 1.0 / size(col("toks"))) * 0.4 +
        least((col("n_chars") * 1.0 / size(col("toks"))) / 10, lit(1.0)) * 0.2)
      .filter(col("quality") >= 0.5)
      .drop("toks")
    val n1 = scored.count()

    // 2. exact dedup: one survivor per normalized text (q44's key, min id)
    val exact = scored
      .withColumn("norm", regexp_replace(lower(col("text")), "\\s+", " "))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("norm").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("norm", "rn")
    val n2 = exact.count()

    // 3. near-dup removal: drop the HIGHER id of every x86 candidate pair
    val losers = graft.queries.LlmExt2.x86(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
    val n3 = nearDeduped.count()

    // 4. decontamination: x21's rule — drop docs sharing a normalized text
    //    key with the held-out slice (doc_id % 100 < 5 stands in for eval)
    val evalSet = docs.filter(col("doc_id") % 100 < 5)
      .select(regexp_replace(lower(col("text")), "\\s+", " ").as("k")).distinct()
    val clean = nearDeduped
      .withColumn("k", regexp_replace(lower(col("text")), "\\s+", " "))
      .join(broadcast(evalSet), Seq("k"), "left_anti").drop("k")
    val n4 = clean.count()

    // 5. final mix report: temperature weights over the survivor sources
    val mix = clean.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("share", col("n_docs") * lit(1.0)
        / sum(col("n_docs")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("weight",
        round(exp(lit(0.7) * log(col("share"))), 6))
      .orderBy(col("n_docs").desc, col("source"))

    println(s"raw=$n0 quality=$n1 exact_dedup=$n2 near_dedup=$n3 decontaminated=$n4")
    mix.show(25, truncate = false)
    require(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4,
      "every curation stage only removes documents")
    require(n4 > 0, "the pipeline must keep a non-empty corpus")
    spark.stop()
  }
}
