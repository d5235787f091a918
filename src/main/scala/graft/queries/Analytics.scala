package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.engine.Tables

/** Product-analytics staples over the events stream — ordered funnels (x53)
  * and cohort retention (x54) — plus the inverted-index build (x55) every
  * search/RAG pipeline runs over its corpus. All three are exact integer /
  * timestamp algebra, oracle-checked term-for-term.
  */
/** Typed row for the x97 cogroup (user, epoch-µs timestamp). */
final case class UserStamp(user_id: Long, us: Long)

object Analytics {

  /** x92: CONCURRENT SESSIONS OVER TIME — how many q37-rule sessions are
    * OPEN at each hour boundary: the load/occupancy curve behind capacity
    * planning and activity dashboards. A session [first_us, last_us +
    * 30 min) covers the hour marks in (ceil(start/1h) .. ceil(end/1h)−1);
    * the fan-out per session is its span in hours (tiny for gap-bounded
    * sessions), so coverage is per-row `sequence` algebra — NO interval
    * join at all.
    *
    * 100 TB: one user-keyed session window (q37's exchange), a per-session
    * aggregate on the same partitioning, the hour fan-out inside codegen,
    * and a final ≤|hours| histogram agg with map-side combine. */
  def x92(spark: SparkSession, dir: String): DataFrame = {
    val H = 3600000000L // one hour in µs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
              unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") >= 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                      org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("s_us"), (max(col("us")) + 1800000000L).as("e_us"))
    // hour marks covered: first = ceil(s/H), last = ceil(e/H) - 1 (end excl.)
    sess
      .withColumn("h0", expr(s"(s_us + ${H - 1}) DIV $H"))
      .withColumn("h1", expr(s"(e_us + ${H - 1}) DIV $H - 1"))
      .filter(col("h1") >= col("h0"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hour_idx"))
      .groupBy("hour_idx")
      .agg(count(lit(1)).as("n_open_sessions"))
      .select((col("hour_idx") * H).as("hour_us"), col("n_open_sessions"))
      .orderBy("hour_us")
  }

  /** x93: TIME-TO-CONVERT DISTRIBUTION — seconds from a user's first signup
    * to their first purchase AFTER it, summarized as exact p25/p50/p75/p95
    * (x28's proven percentile pairing): the latency histogram behind
    * conversion-window decisions. Per-user durations are exact integer
    * seconds (µs difference, integer division).
    *
    * 100 TB: two conditional per-user min-aggregates (x53's shape), one
    * broadcast-sized join after reduction, percentiles over |converting
    * users| durations. */
  def x93(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .join(s1, "user_id").filter(col("us") > col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"), min(col("t1")).as("t1"))
      .select(expr("(t2 - t1) DIV 1000000").as("secs"))
    conv.agg(count(lit(1)).as("n_converted"),
             round(expr("percentile(secs, 0.25)"), 6).as("p25"),
             round(expr("percentile(secs, 0.5)"), 6).as("p50"),
             round(expr("percentile(secs, 0.75)"), 6).as("p75"),
             round(expr("percentile(secs, 0.95)"), 6).as("p95"))
  }

  /** x97: TYPED COGROUP — x93's per-user conversion lag computed through
    * `KeyValueGroupedDataset.cogroup`, the typed escape hatch for per-key
    * logic that won't fit join+agg algebra (here it WOULD — x93 proves it —
    * which is exactly what makes the two entries mutually verifying: same
    * oracle rule, declarative vs imperative mechanism, like x03 vs x19 on
    * the streaming side). Emits one (user, lag_secs) row per converting
    * user.
    *
    * 100 TB: cogroup shuffles both sides by user once, then streams each
    * user's two iterators through the function; this body materializes only
    * the signup timestamps (bounded per user) and folds purchases lazily.
    * The declarative x93 shape remains the first choice — this is the
    * mechanism demo, priced honestly (no codegen inside the lambda). */
  def x97(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).as[UserStamp]
    side("signup").groupByKey(_.user_id)
      .cogroup(side("purchase").groupByKey(_.user_id)) { (uid, signups, purchases) =>
        // materialize ONLY the signup stamps (iterator semantics: isEmpty
        // would consume the head); purchases fold lazily below
        val ss = signups.map(_.us).toArray
        if (ss.isEmpty) Iterator.empty
        else {
          val t1 = ss.min
          var best = Long.MaxValue
          purchases.foreach(p => if (p.us > t1 && p.us < best) best = p.us)
          if (best == Long.MaxValue) Iterator.empty
          else Iterator((uid, (best - t1) / 1000000L))
        }
      }
      .toDF("user_id", "lag_secs")
      .orderBy("user_id")
  }

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

  /** x132: TOP ENTRY JOURNEYS — the most common FIRST-3-EVENT type paths
    * (the journey-mining read on x39's single transitions and x73's fixed
    * 2-contexts: ranked multi-step paths; truncated to the entry prefix
    * because complete paths are near-unique per user and count to 1).
    * Each user's prefix becomes one arrow-joined string in (ts, event_id)
    * order — x124's collect-sort-stringify discipline on struct keys —
    * then paths group-count and the top 20 (count desc, path tiebreak)
    * survive.
    *
    * 100 TB: per-user agg state is the user's own history (bounded-history
    * posture; a heap-based "3 smallest structs" TypedImperativeAggregate —
    * x70's pattern — would cap it at O(3) if histories were unbounded);
    * the path count is map-side combinable on a string key; the global
    * top-k is the q24 TakeOrderedAndProject pattern, never a full sort. */
  def x132(spark: SparkSession, dir: String): DataFrame = {
    val paths = Tables.events(spark, dir)
      .select(col("user_id"),
              struct(unix_micros(col("ts")).as("us"),
                     col("event_id").as("eid"),
                     col("event_type").as("t")).as("s"))
      .groupBy("user_id")
      .agg(array_join(transform(slice(sort_array(collect_list(col("s"))), 1, 3),
                                s => s.getField("t")), ">").as("path"))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** x129: MULTI-TOUCH ATTRIBUTION — each purchase's credit split EQUALLY
    * across every event the user produced in the preceding hour (linear
    * attribution; x85 is the last-touch single-winner variant), plus a
    * `direct` channel for purchases with no prior touch. Credit is exact
    * integer ppm: each touch earns `1000000 DIV n_touches` of its
    * purchase (floor — a 3-touch purchase distributes 999,999 ppm; the
    * remainder is deliberately dropped, not redistributed, so every
    * credit is a pure function of n_touches on both engines).
    *
    * 100 TB: one user-keyed join purchases⋈touches with the hour window
    * as an in-join predicate — pair fan-out is bounded by events-per-
    * (user, hour)², the q09/x92 bounded-history posture (unbounded
    * per-user firehoses would take q09's time-bucketed range join); the
    * no-touch remainder is the same join's LEFT ANTI twin on one shared
    * lineage; final agg is |channels| rows. */
  def x129(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
              unix_micros(col("ts")).as("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
    val touches = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type").as("channel"),
              col("us").as("t_us"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .filter(col("t_us") >= col("p_us") - lit(3600000000L) &&
                col("t_us") < col("p_us"))
    val credited = pairs
      .withColumn("n_touches",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("p_id")))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touches_total"),
           sum(expr("1000000 DIV n_touches")).as("credit_ppm"))
    val direct = purchases
      .join(pairs.select("p_id").distinct(), Seq("p_id"), "left_anti")
      .agg(count(lit(1)).as("n_touches_total"))
      .select(lit("direct").as("channel"), col("n_touches_total"),
              (col("n_touches_total") * 1000000L).as("credit_ppm"))
    credited.unionByName(direct).orderBy("channel")
  }

  /** x237: COMPLEX-EVENT-PROCESSING PATTERN MATCH — the MATCH_RECOGNIZE /
    * Flink-CEP shape the funnel family deliberately is NOT: x53's funnel
    * allows gaps (view … later click … later purchase); CEP demands the
    * STRICTLY CONSECUTIVE sequence view→click→purchase in a user's event
    * stream (no intervening event of any type) with the whole triple
    * inside a 3-day span. Sequence order is the total order (ts µs,
    * event_id) — the same-microsecond tiebreak that makes the match set
    * deterministic. Per user: match count and the first/last match start.
    *
    * 100 TB: one user-keyed window (the q37/x53 exchange — per-user
    * state, never a global sort); the pattern test is two LEADs + CASE
    * inside codegen, so widening the pattern alphabet or length is free;
    * the aggregate is partial+final on the same user keying. */
  def x237(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
              unix_micros(col("ts")).as("us"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("us2", lead(col("us"), 2).over(w))
      .filter(col("event_type") === "view" && col("t1") === "click" &&
                col("t2") === "purchase" &&
                col("us2") - col("us") <= 259200000000L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"),
           min(col("us")).as("first_start_us"),
           max(col("us")).as("last_start_us"))
      .orderBy("user_id")
  }

  /** x238: CLAMPED RUNNING BALANCE — the inventory/credit-ledger fold SQL
    * window functions famously "can't" express: daily net cents per user
    * (purchases debit, everything else credits), accumulated under a
    * floor-at-zero clamp (balance never goes negative — the overdraft /
    * stock-out rule). The sequential recurrence S_i = max(0, S_{i−1}+x_i)
    * IS windowable through the prefix-sum identity
    * S_i = P_i − min(0, min_{j≤i} P_j) for a one-sided clamp (proved
    * against the sequential fold in Round10eSpec), so the engine stays
    * declarative — two stacked per-user windows, no mapPartitions, no
    * recursion. Per user: days, final/max balance, days the floor binds.
    *
    * 100 TB: one (user, day) partial+final rollup, then both window
    * passes ride ONE user-keyed exchange (same partitioning, Spark plans
    * a single sort); per-user day counts are calendar-bounded. */
  def x238(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.currentRow)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("d").desc)
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("d"),
              when(col("event_type") === "purchase",
                   -round(col("value") * 100, 0).cast(LongType))
                .otherwise(round(col("value") * 100, 0).cast(LongType))
                .as("cents"))
      .groupBy("user_id", "d").agg(sum(col("cents")).as("net"))
    daily
      .withColumn("p", sum(col("net")).over(w))
      .withColumn("bal", col("p") - least(lit(0L), min(col("p")).over(w)))
      .withColumn("rn", row_number().over(wd))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_days"),
           max(when(col("rn") === 1, col("bal"))).as("final_balance_cents"),
           max(col("bal")).as("max_balance_cents"),
           sum(when(col("bal") === 0L, 1L).otherwise(0L)).as("n_floor_days"))
      .orderBy("user_id")
  }

  /** x268: COHORT RETENTION MATRIX WITH RATES — x54's growth readout
    * completed into the artifact a review actually reads: the FULL
    * (cohort_week, weeks_since) triangle (x54 caps at offset 3), each cell
    * carrying the cohort's SIZE and the retention rate in ppm — an exact
    * integer 10⁶-scaled floor division (`DIV`, matching DuckDB `//` on
    * BIGINT), never a float ratio. Weeks are epoch-µs integral division by
    * 604800000000 (the x54 arithmetic) — exact on both engines; a
    * float `/`-then-cast here can land one week off on exact multiples.
    *
    * 100 TB: activity first collapses to DISTINCT (user, week) — the
    * deduplication that makes the cohort join carry one row per
    * user-week, not per event; the first-week frame rides the SAME
    * user-keyed shuffle; the per-cell aggregate is map-side combinable
    * and the cohort-size attach is a broadcast of a ≤|weeks|-row frame. */
  def x268(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"),
              expr("unix_micros(ts) DIV 604800000000").as("week"))
      .distinct()
    val firsts = act.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = firsts.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    act.join(firsts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("weeks_since"), col("n_active"),
              col("cohort_size"),
              expr("n_active * 1000000 DIV cohort_size").as("retention_ppm"))
      .orderBy("cohort_week", "weeks_since")
  }

  /** x294: SEQUENTIAL-PATTERN SUPPORT — for every ORDERED event-type pair
    * (a → b), how many users did a strictly before ever doing b (first
    * occurrences compared), the sequential-rule mining primitive
    * (PrefixSpan's length-2 core) that complements x39's adjacent
    * transitions and x53's fixed funnel: x39 counts consecutive steps,
    * this counts "eventually after", the relation that defines a funnel
    * worth building. Confidence rides as conf_ppm = support(a→b)·10⁶ DIV
    * users(a). Equal first-occurrence timestamps count for NEITHER order
    * (strict <, deterministic at µs grain).
    *
    * 100 TB: the only event-scale work is ONE (user, type) min-timestamp
    * aggregate (map-side combinable); the ordered-pair fan-out is a
    * per-user self-join on that aggregate, bounded by the type-vocabulary
    * width (≤ \|types\|² rows per user), and the support rollup lands on
    * the ≤ \|types\|² grid. No event ever joins an event. */
  def x294(spark: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(min(col("ts")).as("t0"))
      .materialized // both self-join sides + the per-type totals
    val perType = firsts.groupBy(col("event_type").as("a"))
      .agg(count(lit(1)).as("n_users_a"))
    firsts.select(col("user_id"), col("event_type").as("a"), col("t0").as("ta"))
      .join(firsts.select(col("user_id"), col("event_type").as("b"),
                          col("t0").as("tb")), "user_id")
      .filter(col("a") =!= col("b") && col("ta") < col("tb"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_users_ab"))
      .join(broadcast(perType), "a")
      .select(col("a"), col("b"), col("n_users_ab"), col("n_users_a"),
              expr("n_users_ab * 1000000 DIV n_users_a").as("conf_ppm"))
      .orderBy("a", "b")
  }
}
