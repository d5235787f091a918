package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.engine.Tables

/** Feature-engineering and corpus-diagnostic stages (round 5): native
  * bounded-state top-k (x70), quantile bucketing (x71), per-entity feature
  * vectors (x72), higher-order sequence contexts (x73), key-skew
  * diagnostics (x74), temporal distribution drift (x75), character n-gram
  * profiles (x76), and integer-exact outlier flagging (x77). All eight are
  * oracle-checked: outputs are BIGINT / ROUND(…, k) DOUBLE / STRING only
  * (SURVEY.md §7.4 repr protocol), and every float is produced by a fixed
  * short arithmetic chain over exact integers — portable bit-for-bit.
  */
object Features {

  /** x70: NATIVE TOP-K PER GROUP — the 3 highest-value orders per order
    * priority via [[graft.engine.expr.TopKPairs]], a bounded-state
    * TypedImperativeAggregate (k pairs per partition per group; min-heap
    * eviction; mergeable partials).
    *
    * 100 TB: Spark's WindowGroupLimit already bounds the window idiom's
    * shuffle to k rows per partition per group, but still sorts every input
    * partition twice (pre- and post-exchange); this plan replaces both
    * sorts with O(k) heaps — O(n log k), no sort buffer — and the exchange
    * carries at most k·partitions pairs per group. PlanSpec asserts the
    * physical plan is an ObjectHashAggregate pair with NO Window (hence no
    * sort) anywhere. */
  def x70(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(call_function("topk_pairs",
        col("o_totalprice"), col("o_orderkey"), lit(3)).as("tk"))
      .select(col("o_orderpriority"), posexplode(col("tk")))
      .select(col("o_orderpriority"),
              (col("pos") + 1).cast(LongType).as("rank"),
              col("col.tag").as("o_orderkey"),
              round(col("col.score"), 2).as("total_price"))
      .orderBy("o_orderpriority", "rank")

  /** x71: QUANTILE BUCKETING — equal-frequency quartiles of customer
    * balances within each market segment (`ntile(4)` under the total order
    * (acctbal, custkey)), reported as per-bucket count, bounds, and exact
    * cent mass. The binning step behind "split the corpus into quality
    * quartiles" curation rules.
    *
    * 100 TB: one hash shuffle on the segment key + per-partition sort for
    * the window; the aggregate that follows reuses the same partitioning, so
    * no second exchange. ntile's bucket arithmetic (first `n mod 4` buckets
    * one element larger) is the SQL-standard definition on both engines. */
  def x71(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .groupBy("c_mktsegment", "quartile")
      .agg(count(lit(1)).as("n"),
           round(min(col("c_acctbal")), 2).as("min_bal"),
           round(max(col("c_acctbal")), 2).as("max_bal"),
           sum(round(col("c_acctbal") * 100, 0).cast(LongType)).as("bal_cents"))
      .orderBy("c_mktsegment", "quartile")
  }

  /** x72: PER-ENTITY FEATURE VECTOR — the classic user-level feature build
    * (event count, type diversity, activity span, mean inter-event gap,
    * value mass) as ONE aggregate pass. Every feature is exact integer
    * arithmetic: spans/gaps via epoch-µs BIGINT division, money via
    * per-row cent rounding before the BIGINT sum.
    *
    * 100 TB: a single hash shuffle on user_id with map-side partials
    * (count-distinct over 5 event types stays a tiny exact set per
    * partial); output is |users| rows — the feature table a downstream
    * trainer joins against. */
  def x72(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"),
              unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("event_type")).as("n_types"),
           expr("(max(us) - min(us)) DIV 1000000").as("span_s"),
           expr("""CASE WHEN count(1) > 1
                   THEN ((max(us) - min(us)) DIV 1000) DIV (count(1) - 1)
                   ELSE 0 END""").as("mean_gap_ms"),
           sum(round(col("value") * 100, 0).cast(LongType)).as("value_cents"))
      .orderBy("user_id")

  /** x73: ORDER-2 SEQUENCE CONTEXTS — per-user event trigrams
    * (context = two previous event types, label = the next), the training
    * rows of a second-order Markov / next-event model. Support-filtered at
    * ≥ 3 occurrences. Extends x39's bigram transitions one order up.
    *
    * 100 TB: one shuffle by user_id for the lag window (state: two rows),
    * then an aggregate over ≤ |types|³ context cells — map-side combine
    * makes the second exchange negligible. */
  def x73(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"),
              lag(col("event_type"), 1).over(w).as("prev1"),
              lag(col("event_type"), 2).over(w).as("prev2"))
      .filter(col("prev2").isNotNull)
      .select(concat(col("prev2"), lit(">"), col("prev1")).as("context"),
              col("event_type").as("next_type"))
      .groupBy("context", "next_type")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3)
      .orderBy("context", "next_type")
  }

  /** x74: KEY-SKEW DIAGNOSTIC — the pre-flight report a pipeline runs
    * before choosing a join strategy on a key: row/key cardinalities, the
    * hottest key's share (exact ppm, integer division), and the p50/p95/p99
    * of the per-key count distribution (type-7 interpolation on both
    * engines, the x28-proven pattern).
    *
    * 100 TB: one shuffle to count per key, then a single-row aggregate over
    * |keys| counts. The percentile here is EXACT (it sorts the per-key
    * counts, not the rows); if |keys| itself were huge this is where
    * approx_percentile swaps in — the report's consumer tolerates sketch
    * error, the oracle does not. */
  def x74(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_rows"),
           count(lit(1)).as("n_keys"),
           max(col("c")).as("max_c"),
           min(col("c")).as("min_c"),
           expr("max(c) * 1000000 DIV sum(c)").as("top1_ppm"),
           round(expr("percentile(c, 0.5)"), 6).as("p50"),
           round(expr("percentile(c, 0.95)"), 6).as("p95"),
           round(expr("percentile(c, 0.99)"), 6).as("p99"))

  /** x75: TEMPORAL DRIFT (PSI) — population-stability-index contribution of
    * each event type between the first and second half of the time range
    * (split at the exact integer midpoint of epoch-µs min/max). The
    * train/serve skew check every production pipeline runs; PSI =
    * Σ (p−q)·ln(p/q) over class shares.
    *
    * 100 TB: two scans collapsed into one — the midpoint is a 1-row
    * broadcast from the same aggregate pass shape, the halves split is a
    * conditional aggregation per event type (5 cells), and the share
    * normalization is a tiny window over those cells. Shares are
    * BIGINT-ratio divisions; each PSI term is a fixed 4-op double chain —
    * portable before the 6-digit round. */
  def x75(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid"))
    val cells = ev.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("n_early"),
           sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("n_late"))
    val tot = Window.partitionBy()
    cells
      .withColumn("p", col("n_early") * lit(1.0) / sum(col("n_early")).over(tot))
      .withColumn("q", col("n_late") * lit(1.0) / sum(col("n_late")).over(tot))
      .select(col("event_type"), col("n_early"), col("n_late"),
              round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi"))
      .orderBy("event_type")
  }

  /** x76: CHARACTER TRIGRAM PROFILE — top-10 char 3-grams per language over
    * lowercased text, the classical language-ID / script-detection feature
    * (x10's token profile, one level below words). Sliding positions are
    * generated per row (`sequence` + explode) inside codegen — no join.
    *
    * 100 TB: fan-out is n_chars−2 per document (bounded, ~1× corpus mass as
    * 3-char rows); ONE hash shuffle on (lang, trigram) with map-side
    * combine, then a |langs|-partition window for the top-10 cut. At real
    * scale the combine step is the whole game: the distinct-trigram space is
    * ≤ |alphabet|³, so partials collapse the fan-out before the exchange.
    * `fanOut` spreads the single-row-group harness scan across cores before
    * the n_chars-per-row explode (Tables.fanOut Scaladoc; measured 2.9 s →
    * sub-second at sf0.1). */
  def x76(spark: SparkSession, dir: String): DataFrame = {
    val byCnt = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tri"))
    Tables.fanOut(Tables.documents(spark, dir)
        .filter(col("n_chars") >= 3))
      .select(col("lang"), lower(col("text")).as("t"),
              explode(sequence(lit(1L), col("n_chars") - 2)).as("i"))
      .select(col("lang"), col("t").substr(col("i").cast("int"), lit(3)).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(byCnt).cast(LongType))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("tri"), col("cnt"))
      .orderBy("lang", "rank")
  }

  /** x78: FULFILLMENT-DELAY STATS — days between order date and each line's
    * ship date, aggregated per return flag: the canonical fact⋈fact derived
    * metric. Day deltas are exact integer date arithmetic; the mean is one
    * BIGINT-ratio division rounded to 6dp.
    *
    * 100 TB: the one genuinely big-⋈-big join in this batch — lineitem and
    * orders both scale with the corpus, so neither side broadcasts: the join
    * hash-shuffles BOTH sides on orderkey (at warehouse scale the two tables
    * would be bucketed on orderkey to delete this exchange — SURVEY §5) and
    * the 3-group aggregate is pure map-side-combine after it. Only the 3
    * needed columns of each table reach the join (column pruning to the
    * scan). */
  def x78(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), to_date(col("l_shipdate")).as("ship_d"))
      .join(Tables.orders(spark, dir)
              .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_d")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_returnflag"), datediff(col("ship_d"), col("order_d")).cast(LongType).as("delay_d"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
           min(col("delay_d")).as("min_delay"),
           max(col("delay_d")).as("max_delay"),
           sum(col("delay_d")).as("sum_delay"),
           round(sum(col("delay_d")) * lit(1.0) / count(lit(1)), 6).as("mean_delay"))
      .orderBy("l_returnflag")

  /** x79: NEAR-DUP RATE BY SOURCE — per corpus source, the share of
    * documents (exact ppm) carrying at least one 5-token shingle fingerprint
    * that also occurs in ANOTHER document. The per-slice contamination
    * report a curation pipeline reads before deciding which source needs
    * the expensive dedup pass; reuses x13's portable rolling-hash
    * fingerprints.
    *
    * 100 TB: no pair enumeration anywhere — "shared" is decided by a
    * fp-keyed count-distinct (bounded per fp), the dup-doc set is an
    * fp-join + distinct on doc ids only, and the final agg is |sources|
    * rows. Contrast x24, which must materialize edges to CLUSTER the dups;
    * rating them only needs this much. */
  def x79(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fps = LlmExt2.docFingerprints(docs).distinct()
    val shared = fps.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") > 1)
      .select("fp")
    val dupDocs = fps.join(shared, "fp").select("doc_id").distinct()
      .withColumn("is_dup", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(dupDocs, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"),
           expr("sum(coalesce(is_dup, 0)) * 1000000 DIV count(1)").as("dup_ppm"))
      .orderBy("source")
  }

  /** x80: CROSS-SOURCE OVERLAP — fingerprint-set Jaccard (exact ppm) for
    * every source pair: how much content two corpus slices share, the
    * mixing-matrix a corpus composer reads next to x30's quotas. Operates
    * on DISTINCT (source, fp) — document multiplicity within a source
    * doesn't inflate overlap.
    *
    * 100 TB: the fp self-join fans out |sources(fp)|² per fingerprint —
    * bounded by the (tiny, fixed) source count, NOT by document count; the
    * result is ≤ C(|sources|,2) rows. Set sizes ride in on a broadcast. */
  def x80(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // sfp feeds three consumers (both self-join sides + sizes) but is NOT
    // materialized: the distinct's exchange is reused across consumers
    // (ReusedExchange), and an eager localCheckpoint here measured SLOWER
    // (1.27s vs 1.02s at sf0.1) than letting the reuse do its job
    val sfp = docs.select(col("doc_id"), col("source"))
      .join(LlmExt2.docFingerprints(docs), "doc_id")
      .select("source", "fp").distinct()
    val sizes = sfp.groupBy("source").agg(count(lit(1)).as("sz"))
    sfp.as("a")
      .join(sfp.as("b"),
            col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_a")
                           .withColumnRenamed("sz", "sz_a")), "source_a")
      .join(broadcast(sizes.withColumnRenamed("source", "source_b")
                           .withColumnRenamed("sz", "sz_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
              (col("sz_a") + col("sz_b") - col("n_common")).as("n_union"),
              expr("n_common * 1000000 DIV (sz_a + sz_b - n_common)").as("jaccard_ppm"))
      .orderBy("source_a", "source_b")
  }

  /** x81: SESSION-LENGTH HISTOGRAM — distribution of events-per-session
    * under q37's 30-minute-gap rule (same half-open boundary as
    * session_window): the shape report behind session-based sampling or
    * packing decisions.
    *
    * 100 TB: one user-keyed window pass to number sessions (q37's
    * exchange), one (user, session) agg that reuses its partitioning, and a
    * final histogram agg over ≤ max-session-length cells. */
  def x81(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
              unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("us") - col("prev_us") >= 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n_events"))
    sess.groupBy("n_events").agg(count(lit(1)).as("n_sessions"))
      .orderBy("n_events")
  }

  /** x82: CONTINGENCY CHI-SQUARE CELLS — language × length-band observed vs
    * expected counts with each cell's χ² contribution: the independence
    * diagnostic ("does doc length depend on language?") a corpus audit runs
    * before stratifying on either axis. Cell contributions are emitted
    * per-row (NOT summed) so every output value is a fixed arithmetic chain
    * over exact BIGINT marginals — the χ² total would be a float sum whose
    * order differs across engines.
    *
    * 100 TB: one (lang, band) agg with map-side combine; the marginals are
    * window sums over ≤ |langs|·|bands| cells — driver-free and tiny. */
  def x82(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .select(col("lang"), least(expr("n_chars DIV 200"), lit(4L)).as("band"))
      .groupBy("lang", "band").agg(count(lit(1)).as("observed"))
    val byLang = Window.partitionBy("lang")
    val byBand = Window.partitionBy("band")
    val all = Window.partitionBy()
    val e = col("row_tot") * col("col_tot") * lit(1.0) / col("n")
    cells
      .withColumn("row_tot", sum(col("observed")).over(byLang))
      .withColumn("col_tot", sum(col("observed")).over(byBand))
      .withColumn("n", sum(col("observed")).over(all))
      .select(col("lang"), col("band"), col("observed"),
              round(e, 6).as("expected"),
              round((col("observed") - e) * (col("observed") - e) / e, 6)
                .as("chi2_contrib"))
      .orderBy("lang", "band")
  }

  /** x83: SPLIT-GAIN SCORING — per-band Gini impurity of the price label
    * under a quantity binning (bands of 10), plus the unsplit parent as
    * band −1: the split-evaluation statistic a decision-tree / feature-
    * selection pass computes per candidate feature. Each Gini is one exact
    * integer-ratio chain (1 − (pos²+neg²)/n²); the weighted gain is left to
    * the consumer (a float sum over bands — the spec computes and checks
    * it).
    *
    * 100 TB: ONE conditional aggregate over one scan; the parent (band −1)
    * row is re-aggregated from the ≤5 band rows, not from a second corpus
    * pass (measured 1.6 s → 0.5 s at sf0.1). Cast caveat: quantities are
    * whole-valued doubles, so the int cast agrees across engines (Spark
    * truncates, DuckDB rounds — equal on integers). */
  def x83(spark: SparkSession, dir: String): DataFrame = {
    val bands = Tables.lineitem(spark, dir)
      .select(when(col("l_extendedprice") > 95000, 1L).otherwise(0L).as("pos"),
              expr("(CAST(l_quantity AS INT) - 1) DIV 10").cast(LongType).as("band"))
      .groupBy("band").agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      .materialized // ≤5 rows; feeds itself + the parent re-agg
    val parent = bands.agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"))
      .select(lit(-1L).as("band"), col("n"), col("n_pos"))
    bands.unionByName(parent)
      .select(col("band"), col("n"), col("n_pos"),
              round(lit(1.0) -
                (col("n_pos") * col("n_pos") + (col("n") - col("n_pos")) * (col("n") - col("n_pos")))
                * lit(1.0) / (col("n") * col("n")), 6).as("gini"))
      .orderBy("band")
  }

  /** x84: ROLLING ACTIVE USERS — daily actives plus the trailing-7-day
    * distinct-user count per day (DAU/WAU), the engagement pair every
    * activity pipeline reports. Exact rolling distinct: the (day, user)
    * grid is joined to the day spine over a 7-day band — a bounded fan-out
    * (≤7 rows per grid row), NOT a windowed count-distinct (which Spark
    * windows don't support exactly).
    *
    * 100 TB: events collapse to the (day, user) grid first (one shuffle,
    * grid ≪ events); the band join fans the grid ×≤7 and re-aggregates —
    * both stages map-side combinable. The day spine is tiny and broadcast. */
  def x84(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val days = du.select("day").distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = broadcast(days.as("d"))
      .join(du.as("a"),
            col("a.day") <= col("d.day") && col("a.day") >= date_sub(col("d.day"), 6))
      .groupBy(col("d.day").as("day"))
      .agg(countDistinct(col("a.user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day").cast("string").as("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  /** x85: LAST-TOUCH ATTRIBUTION — every purchase's value attributed to the
    * hour-of-day of the user's most recent PRIOR click, via the native
    * as-of join ([[graft.plans.AsOf]], x23's operator in its second
    * deployment): the classic marketing-attribution shape (strictly-prior
    * match, q11's semantics).
    *
    * 100 TB: the as-of exec sorts both sides once per (key, ts) exchange —
    * no per-pair blow-up (AsOfJoin.scala Scaladoc); the attribution agg is
    * 24 cells with map-side combine. */
  def x85(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    graft.plans.AsOf.joinAsOf(p, c, "user_id", "ts", "ts", "click_ts")
      .filter(col("click_ts").isNotNull)
      .groupBy(hour(col("click_ts")).cast(LongType).as("click_hour"))
      .agg(count(lit(1)).as("n_purchases"),
           sum(round(col("value") * 100, 0).cast(LongType)).as("value_cents"))
      .orderBy("click_hour")
  }

  /** x77: INTEGER-EXACT OUTLIER FLAGS — per event type, how many users have
    * an activity count more than 2 sample standard deviations above/below
    * the mean. The z-test is evaluated WITHOUT floats: with n users, S=Σc,
    * SS=Σc², the condition |c−S/n| > 2·σ is equivalent to
    * (c·n − S)²·(n−1) > 4·n·(SS·n − S²) — all BIGINT, so the flag count
    * cannot flip on engine-specific float-summation order. (Exact-BIGINT
    * headroom: |c·n−S|²·n must stay < 2⁶³ — holds through ~10⁹ rows per
    * type; beyond that the production path switches the moments to DECIMAL
    * or the test to a sampled approximation.)
    *
    * 100 TB: per-(type,user) counts are one shuffle; the moment table is 5
    * rows, broadcast back; the flag evaluation is codegen'd row algebra. */
  def x77(spark: SparkSession, dir: String): DataFrame = {
    val cu = Tables.events(spark, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
    val st = cu.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
           sum(col("c") * col("c")).as("ss"))
    val dev = col("c") * col("n") - col("s")
    cu.join(broadcast(st), "event_type")
      .withColumn("flagged",
        dev * dev * (col("n") - 1) > lit(4L) * col("n") * (col("ss") * col("n") - col("s") * col("s")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
           sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
           max(col("c")).as("max_c"))
      .orderBy("event_type")
  }

  /** x133: WINSORIZED STATISTICS — per event type, the mean after clamping
    * spend into its [p05, p95] band: the robust aggregate that NEUTRALIZES
    * tails instead of flagging them (x121 counts outliers; x77 z-flags
    * them; this reports the statistic as if they were at the fence).
    * Percentiles are DISCRETE — the element at integer index
    * (n−1)·p DIV 100 + 1 of the sorted multiset, so the fences are actual
    * data values and every quantity (fences, clamped cents, sums) is exact
    * BIGINT; only the final mean divides, as one fixed double, 6dp.
    *
    * 100 TB: one type-keyed rank window + ONE conditional aggregate picks
    * both fences (the rn = index rows) — no per-percentile re-sort; the
    * |types|-row fence table broadcasts back; the clamp is codegen'd row
    * algebra. Same bounded-group posture as x28/x121. */
  def x133(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
              round(col("value") * 100, 0).cast(LongType).as("cents"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents"), col("event_id"))
    val ranked = c
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    val fences = ranked.groupBy("event_type")
      .agg(max(when(col("rn") === expr("(n - 1) * 5 DIV 100 + 1"),
                    col("cents"))).as("lo"),
           max(when(col("rn") === expr("(n - 1) * 95 DIV 100 + 1"),
                    col("cents"))).as("hi"))
    c.join(broadcast(fences), "event_type")
      .select(col("event_type"), col("lo"), col("hi"),
              greatest(col("lo"), least(col("hi"), col("cents"))).as("wc"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(col("lo")).as("lo_cents"),
           max(col("hi")).as("hi_cents"), sum(col("wc")).as("wsum_cents"))
      .withColumn("wmean_cents",
        round(col("wsum_cents").cast(DoubleType) / col("n").cast(DoubleType), 6))
      .orderBy("event_type")
  }

  /** x121: ROBUST OUTLIERS (median/MAD) — x77's flag rule with the
    * mean/stddev replaced by median and median-absolute-deviation, the
    * estimator that does not move when the outliers themselves inflate the
    * moments (50% breakdown vs 0% for z-scores — one huge order shifts a
    * mean, not a median). Exactness discipline: prices quantize ONCE to
    * BIGINT cents; a type-7 median of integers is then a multiple of 0.5,
    * a MAD of those deviations a multiple of 0.25, and 3·MAD likewise —
    * every quantity is exactly representable in binary, so the cut
    * `dev > 3·MAD` is decided identically by both engines with no float
    * tolerance anywhere. (That is why cents, not raw DOUBLE prices: type-7
    * interpolation on arbitrary doubles rounds, and a 1-ulp disagreement
    * at the cut would flip a count.)
    *
    * 100 TB: same posture as x28 — exact per-group medians sort each
    * group's values, fine for bounded group counts (5 priorities); the
    * median/MAD tables are group-cardinality-sized broadcasts back; the
    * flag evaluation is codegen'd row algebra. Unbounded groups belong to
    * x15's sketch percentiles. */
  def x121(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
              round(col("o_totalprice") * 100, 0).cast(LongType).as("cents"))
    val med = cents.groupBy("o_orderpriority")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = cents.join(broadcast(med), "o_orderpriority")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = dev.groupBy("o_orderpriority")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           max(col("med")).as("med_cents"),
           max(col("mad")).as("mad_cents"),
           sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
             .as("n_outliers"))
      .orderBy("o_orderpriority")
  }

  /** x214: JOIN-SIZE ESTIMATION AUDIT — x74's companion: before choosing
    * a join strategy you estimate |orders ⋈ customer|; this key computes
    * the three textbook estimators NEXT TO the ground truth so their
    * error is a measured fact, not folklore:
    *   - perkey_est  = Σ_k cnt_o(k)·cnt_c(k) over the per-key histograms —
    *     EXACTLY the equi-join cardinality (an identity, spec-pinned);
    *   - bucket_est  = the same sum over 64-bucket (k mod 64) histograms —
    *     an UPPER BOUND (collisions only inflate: Σ over a coarsening of
    *     the key partition dominates the per-key sum), and on this dense
    *     key space it overshoots 2.4×/23×/234× at sf0.001/0.01/0.1 —
    *     the measured case for distinct-count-corrected statistics;
    *   - uniform_est = |O|·|C| / max(ndv_O, ndv_C), the uniform-frequency
    *     System-R formula — exact here because custkey is a key of one
    *     side (its assumption holds).
    *
    * 100 TB: the histograms are partial+final aggregates (per-key one
    * keyed shuffle, bucket 64 rows); the ground-truth join is the real
    * keyed join this audit exists to predict — at production scale a user
    * drops the exact column and keeps the estimators, which cost a scan
    * each. The 1-row stitches ride broadcast (the x119-approved shape). */
  def x214(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val c = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
    val exact = o.join(c, "k").agg(count(lit(1)).as("exact_rows"))
    val perkey = o.groupBy("k").agg(count(lit(1)).as("co"))
      .join(c.groupBy("k").agg(count(lit(1)).as("cc")), "k")
      .agg(sum(col("co") * col("cc")).as("perkey_est"))
    val bucket = o.groupBy((col("k") % 64).as("b")).agg(count(lit(1)).as("co"))
      .join(c.groupBy((col("k") % 64).as("b")).agg(count(lit(1)).as("cc")), "b")
      .agg(sum(col("co") * col("cc")).as("bucket_est"))
    val sides = o.agg(count(lit(1)).as("n_o"), countDistinct(col("k")).as("ndv_o"))
      .crossJoin(c.agg(count(lit(1)).as("n_c"), countDistinct(col("k")).as("ndv_c")))
    exact.crossJoin(broadcast(perkey)).crossJoin(broadcast(bucket))
      .crossJoin(broadcast(sides))
      .select(col("exact_rows"), col("perkey_est"), col("bucket_est"),
              // n_o cast to DOUBLE before the cross-term: BIGINT n_o·n_c
              // silently overflows past ~3e9-row sides (ADVICE r9; x185's
              // DECIMAL headroom class). The quotient is emitted as a
              // rounded double anyway, and both engines' doubles are exact
              // for the sub-2^53 products the grading scales produce.
              round(col("n_o").cast(DoubleType) * col("n_c") /
                    greatest(col("ndv_o"), col("ndv_c")), 6).as("uniform_est"),
              round(col("bucket_est") * lit(1.0) / col("exact_rows"), 6)
                .as("bucket_inflation"))
  }

  /** x267: POINT-IN-TIME FEATURE JOIN — training-set construction without
    * feature leakage, THE correctness bug that silently inflates offline
    * metrics: each label event (a purchase) gets features computed from
    * that user's events STRICTLY BEFORE the label's timestamp — prior
    * click count, prior view count, and the most recent prior event value
    * (milli-quantized at the source row, −1 when no prior event exists;
    * a NULL source value folds to the same −1 sentinel on BOTH engines,
    * so `last` never reasons about null-skipping).
    * Strictness is encoded in the SORT, not a filter: label probes order
    * BEFORE feature rows at the same (user, ts), so the
    * preceding-rows-only frame can never read a same-instant feature —
    * including the label event itself.
    *
    * 100 TB: the UNION-WINDOW formulation — labels and feature rows union
    * into one stream and every feature is a running conditional aggregate
    * over ONE user-keyed sort; the naive per-label range join the oracle
    * could afford (label × prior-events) shuffles O(labels · history)
    * rows, this shuffles O(events) once. Adding features widens the
    * window projection, never adds a pass. */
  def x267(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
              expr("coalesce(CAST(round(value * 1000, 0) AS BIGINT), -1L)")
                .as("val_milli"))
    val unioned = ev
      .withColumn("is_label",
        when(col("event_type") === "purchase", 1L).otherwise(0L))
    // labels FIRST within a timestamp: the preceding frame then contains
    // exactly the strictly-earlier rows
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("is_label").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn("n_clicks_before",
        coalesce(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .over(w), lit(0L)))
      .withColumn("n_views_before",
        coalesce(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .over(w), lit(0L)))
      .withColumn("last_val_milli",
        coalesce(last(when(col("is_label") === 0, col("val_milli")), true)
          .over(w), lit(-1L)))
      .filter(col("is_label") === 1)
      .select(col("event_id").as("label_id"), col("user_id"),
              unix_micros(col("ts")).as("label_ts_us"),
              col("n_clicks_before"), col("n_views_before"),
              col("last_val_milli"))
      .orderBy("label_id")
  }

  /** x291: OUT-OF-FOLD TARGET ENCODING — the leakage-safe categorical
    * encoder every tabular training pipeline needs: encode o_orderpriority
    * by the positive rate of label (o_totalprice > 150 000) computed over
    * the OTHER four folds (folds = the portable Knuth mix of o_orderkey,
    * mod 5 — deterministic stand-in for a seeded K-fold split). A row's
    * own fold never contributes to its encoding — the leakage-freedom
    * property x267 enforces in time, restated across folds; the naive
    * full-data mean would leak each row's own label into its feature.
    * EXACT arithmetic: oof_ppm = (pos_tot − pos_f)·10⁶ DIV (n_tot − n_f);
    * a category living entirely in one fold falls back to the
    * all-categories complement prior (same DIV form, flagged in the
    * `fallback` column). One row per (category, fold) — the encoding TABLE
    * a trainer broadcasts back onto the data.
    *
    * 100 TB: one partial+final (category, fold) aggregate over the fact
    * table; totals per category and the global prior derive from that
    * bounded grid by second-stage rollups (≤ \|cats\|·k rows) — the
    * encoder costs one shuffle regardless of fold count, vs the k-fit
    * naive form. */
  def x291(spark: SparkSession, dir: String): DataFrame = {
    val folded = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("cat"),
              (((col("o_orderkey") % 100000000L) * lit(2654435761L) +
                lit(97564181L)) % lit(2147483647L) % 5L).as("fold"),
              when(col("o_totalprice") > 150000, 1L).otherwise(0L).as("pos"))
    val grid = folded.groupBy("cat", "fold")
      .agg(count(lit(1)).as("n_f"), sum(col("pos")).as("pos_f"))
      .materialized // 3 consumers: grid, per-cat totals, prior
    val perCat = grid.groupBy("cat")
      .agg(sum(col("n_f")).as("n_tot"), sum(col("pos_f")).as("pos_tot"))
    val global = grid.agg(sum(col("n_f")).as("n_all"),
                          sum(col("pos_f")).as("pos_all"))
    grid.join(broadcast(perCat), "cat").crossJoin(broadcast(global))
      .withColumn("fallback", col("n_tot") === col("n_f"))
      .withColumn("oof_ppm",
        when(!col("fallback"),
             expr("(pos_tot - pos_f) * 1000000 DIV (n_tot - n_f)"))
          .otherwise(expr("(pos_all - pos_f) * 1000000 DIV (n_all - n_f)")))
      .select(col("cat"), col("fold"), col("n_f"), col("oof_ppm"),
              col("fallback"))
      .orderBy("cat", "fold")
  }
}
