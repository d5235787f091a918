package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.engine.Tables

/** Product-analytics staples over the events stream — ordered funnels (x53)
  * and cohort retention (x54) — plus the inverted-index build (x55) every
  * search/RAG pipeline runs over its corpus. All three are exact integer /
  * timestamp algebra, oracle-checked term-for-term.
  */
object Analytics {

  /** x53: ORDERED FUNNEL — signup → view → purchase with STRICT time order
    * per user: a later stage counts only if it happens after the user's
    * earliest qualifying previous stage (min-ts chaining, the standard
    * windowless funnel formulation). Output: one row per stage with the
    * surviving-user count.
    *
    * 100 TB: three conditional min-aggregates keyed by user with map-side
    * partials, chained by broadcast-sized joins only AFTER each per-user
    * reduction — event volume is touched once per stage, never joined
    * row-to-row. */
  def x53(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    val stage = (n: Int, name: String, d: DataFrame) =>
      d.agg(count(lit(1)).as("users"))
        .select(lit(n.toLong).as("stage_n"), lit(name).as("stage"),
                col("users"))
    stage(1, "signup", s1)
      .unionByName(stage(2, "view_after_signup", s2))
      .unionByName(stage(3, "purchase_after_view", s3))
      .orderBy("stage_n")
  }

  /** x54: COHORT RETENTION — users grouped by the epoch-week of their first
    * event; for each cohort and week offset 0–3, how many came back. The
    * retention matrix every growth dashboard is built on.
    *
    * 100 TB: one per-user min (cohort assignment), one distinct over
    * (user, week) — both map-side-combinable — and a key-partitioned join;
    * output is |cohorts| × 4 rows regardless of event volume. */
  def x54(spark: SparkSession, dir: String): DataFrame = {
    val wk = expr("unix_micros(ts) DIV 604800000000")
    val ev = Tables.events(spark, dir).select(col("user_id"), wk.as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .filter(col("week_offset") <= 3)
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** x55: INVERTED INDEX — token → document frequency + the first 10 postings
    * (ascending doc_id, rendered as one CSV string under the no-array output
    * protocol). min-df 5 mirrors x36's vocabulary threshold.
    *
    * 100 TB: distinct (token, doc) then ONE token-keyed aggregate; the
    * posting-list truncation happens inside the aggregate (sort + slice of a
    * per-token list bounded by df), so no unbounded row state — for full
    * postings at scale this would become a sorted write, not a collect_list,
    * but the truncated index IS the common serving artifact. */
  def x55(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
              explode(filter(split(lower(col("text")), " "), t => t =!= ""))
                .as("tok"))
      .distinct()
    toks.groupBy("tok")
      .agg(count(lit(1)).as("df"),
           concat_ws(",",
             transform(slice(sort_array(collect_list(col("doc_id"))), 1, 10),
                       d => d.cast(StringType))).as("postings"))
      .filter(col("df") >= 5)
      .orderBy("tok")
  }
}
