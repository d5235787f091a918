package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** x53–x55 invariants beyond the value-exact oracle compare. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x53 funnel stages are monotone non-increasing") {
    val stages = Analytics.x53(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stages.keySet === Set(1L, 2L, 3L))
    assert(stages(1L) >= stages(2L) && stages(2L) >= stages(3L),
      s"funnel widened downstream: $stages")
  }

  test("x54 offset-0 retention equals cohort size and offsets stay within it") {
    val rows = Analytics.x54(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wk = expr("unix_micros(ts) DIV 604800000000")
    val cohortSizes = graft.engine.Tables.events(spark, sfSmoke)
      .select(col("user_id"), wk.as("week"))
      .groupBy("user_id").agg(min(col("week")).as("cw"))
      .groupBy("cw").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((cw, n) <- cohortSizes) {
      // every user is active in their own first week by construction
      assert(rows.get((cw, 0L)).contains(n), s"cohort $cw offset 0")
      for (k <- 1L to 3L; r <- rows.get((cw, k)))
        assert(r <= n, s"cohort $cw offset $k retained $r > size $n")
    }
  }

  test("x56 encodings round-trip through x36's vocabulary") {
    val vocab = graft.queries.TextOps.x36(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap // token_id -> tok
    val docToks = graft.engine.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"),
              filter(split(lower(col("text")), " "), t => t =!= "").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for (r <- graft.queries.TextOps.x56(spark, sfSmoke).collect()) {
      val (id, nEnc, ids) =
        (r.getLong(0), r.getLong(1), r.getString(2).split(",").map(_.toLong))
      val toks = docToks(id)
      assert(nEnc === math.min(20, toks.length).toLong, s"doc $id n_enc")
      assert(ids.length === nEnc, s"doc $id id count")
      for ((tid, tok) <- ids.zip(toks)) {
        if (tid == 0L) assert(!vocab.contains(tid), s"doc $id OOV id 0")
        else assert(vocab(tid) === tok,
          s"doc $id: id $tid decodes to ${vocab(tid)}, expected $tok")
      }
    }
  }

  test("x55 postings hold min(df,10) ascending doc_ids") {
    for (r <- Analytics.x55(spark, sfSmoke).collect()) {
      val (df, posts) = (r.getLong(1), r.getString(2).split(",").map(_.toLong))
      assert(posts.length === math.min(df, 10L).toInt, s"tok ${r.getString(0)}")
      assert(posts.sameElements(posts.sorted), s"tok ${r.getString(0)} unsorted")
    }
  }
}
