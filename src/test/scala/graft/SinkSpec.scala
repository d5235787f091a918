package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sink-side coverage: partitioned parquet writes and the partition pruning
  * they unlock — at 100 TB, writing event data partitioned by date and having
  * the optimizer prune to one partition is the difference between a full scan
  * and a point read. */
class SinkSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("partitioned parquet sink + partition pruning at read") {
    val out = Files.createTempDirectory("sink").toString + "/events_by_type"
    graft.engine.Tables.events(spark, sfSmoke)
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val back = spark.read.parquet(out)
    val one = back.filter(col("event_type") === "purchase")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "the event_type predicate must prune partitions, not filter rows:\n" + plan.take(600))
    // value parity through the sink round-trip
    val direct = graft.engine.Tables.events(spark, sfSmoke)
      .filter(col("event_type") === "purchase").count()
    assert(one.count() === direct)
  }

  test("JSONL corpus interchange: write documents as JSON lines, read back losslessly") {
    // JSONL is the de-facto LLM-corpus interchange format; the engine must
    // both emit it and re-ingest it with an EXPLICIT schema (schema inference
    // is a second full scan at 100 TB — never rely on it)
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
    val out = Files.createTempDirectory("jsonl").toString + "/documents"
    docs.write.mode("overwrite").json(out)
    val back = spark.read.schema(docs.schema).json(out)
    assert(back.schema === docs.schema, "explicit schema must be preserved")
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(b === a, "JSONL round-trip must be lossless")
    // projection still prunes the parsed fields even though JSON rows are
    // read whole: the scan's ReadSchema narrows to the requested columns
    val narrow = back.select("doc_id", "lang")
    narrow.collect()
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "JSON scan must parse only the projected fields:\n" + plan.take(500))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the catalog is per-session in-memory but the warehouse dir persists;
    // clear stale locations from previous JVMs
    for (t <- Seq("b_orders", "b_customer")) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    graft.engine.Tables.orders(spark, sfSmoke)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    graft.engine.Tables.customer(spark, sfSmoke)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"),
            col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides read pre-bucketed: the join itself needs no Exchange
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, plan.take(500))
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning(o_custkey") &&
           !belowJoin.contains("Exchange hashpartitioning(c_custkey"),
      "bucketed join must not re-shuffle either side:\n" + belowJoin.take(800))
    // value parity with the plain join
    val direct = graft.queries.Relational1.q04(spark, sfSmoke).collect()
    val fromBuckets = joined.select(col("c_mktsegment"), col("n"))
      .orderBy("c_mktsegment").collect()
    assert(fromBuckets.map(r => (r.getString(0), r.getLong(1))).toSeq ===
           direct.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("sorted single-file parquet sink preserves order (Verify contract)") {
    val out = Files.createTempDirectory("sink2").toString + "/q12"
    graft.queries.Relational1.q12(spark, sfSmoke)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).collect().map(_.getString(0))
    assert(back.toSeq === back.sorted.toSeq, "row order must survive the sink")
  }
}
