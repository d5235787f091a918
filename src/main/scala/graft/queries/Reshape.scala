package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Tables

/** x15–x17: sketch aggregations and reshaping operators.
  *
  * x16/x17 are oracle-checked (pivot/unpivot over a FIXED column list is
  * portable conditional aggregation / stacking); x15/x108's sketch VALUES
  * are engine-specific by nature, so both keys emit theorem form — exact
  * values plus an engine-side ok flag stating the sketch contract — and
  * are oracle-checked that way (plus property-tested in ReshapeSpec).
  */
object Reshape {

  /** x15: approximate sketches — HyperLogLog++ distinct counts and
    * approximate percentiles, in THEOREM FORM: the sketches run for real
    * per priority, but the emitted row is (group, exact values, approx_ok)
    * where approx_ok is the sketch CONTRACT checked engine-side — HLL++
    * (rsd 0.02) within 5 % of the exact distinct count, and each
    * percentile_approx value sitting within ±0.005·n of its target rank
    * (tie-safe one-sided count(≤)/count(<) bounds, the x112 device; value
    * error is data-dependent, rank error is the sketch's actual
    * guarantee). The oracle states the exact values + ok = TRUE, so this
    * key is driver-hash-checked instead of `no_oracle` — any sketch
    * regression flips the flag and turns the row red.
    *
    * THE memory-bounded path for 100 TB cardinality/quantile work: exact
    * countDistinct shuffles every distinct value; the sketch is
    * constant-size per group and mergeable. The exact twins here are
    * affordable because groups are bounded (5 priorities); at unbounded
    * cardinality a user runs ONLY the sketch half (x28 is the exact
    * percentile twin, x122 the exact-distinct tile path). The rank-check
    * join fans the bounded 5-row sketch frame back over orders once —
    * broadcast, one extra scan, no row-scale shuffle. */
  /** The raw sketch values behind x15 — the user-facing approximate query
    * (per priority: HLL++ distinct estimate, approx p50/p95). Constant
    * memory per group, no exact twin — what you actually run at unbounded
    * cardinality; x15 wraps this in the oracle-checkable contract. */
  def x15Raw(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"),
           percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50"),
           percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("p95"))
      .orderBy("o_orderpriority")

  def x15(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_custkey"), col("o_totalprice"))
    val per = o.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("ac"),
           countDistinct(col("o_custkey")).as("exact_custs"),
           percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("ap50"),
           percentile_approx(col("o_totalprice"), lit(0.95), lit(10000)).as("ap95"),
           round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
           round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"),
           count(lit(1)).as("n"))
    val ranks = o
      .join(broadcast(per.select(col("o_orderpriority").as("rp"),
                                 col("ap50"), col("ap95"))),
            col("o_orderpriority") === col("rp"))
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_totalprice") <= col("ap50"), 1L).otherwise(0L)).as("le50"),
           sum(when(col("o_totalprice") <  col("ap50"), 1L).otherwise(0L)).as("lt50"),
           sum(when(col("o_totalprice") <= col("ap95"), 1L).otherwise(0L)).as("le95"),
           sum(when(col("o_totalprice") <  col("ap95"), 1L).otherwise(0L)).as("lt95"))
    per.join(ranks, "o_orderpriority")
      .select(col("o_orderpriority"), col("exact_custs"),
              col("p50"), col("p95"),
        (abs(col("ac") - col("exact_custs")) * 20 <= col("exact_custs") &&
         col("le50") * 1000 >= col("n") * 495 &&
         col("lt50") * 1000 <= col("n") * 505 &&
         col("le95") * 1000 >= col("n") * 945 &&
         col("lt95") * 1000 <= col("n") * 955).as("approx_ok"))
      .orderBy("o_orderpriority")
  }

  /** x28: EXACT grouped percentiles — x15's ground-truth twin, the same
    * exact↔approximate pairing as q46↔x18 (docs/PLANS.md). `percentile` sorts
    * each group's value multiset, so memory is bounded by distinct values per
    * group — fine for bounded groups (6 priorities here), while an unbounded
    * 100 TB group belongs to x15's constant-memory sketch. Both engines
    * compute the type-7 linear interpolation at index p·(n−1); rounded 6dp.
    * Oracle: DuckDB `quantile_cont`. */
  def x28(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
           round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
           round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
           round(expr("percentile(o_totalprice, 0.95)"), 6).as("p95"))
      .orderBy("o_orderpriority")

  /** x108: MERGEABLE HLL SKETCH ROLLUP — the pattern x15's
    * `approx_count_distinct` cannot express: DataSketches HLL sketches as
    * FIRST-CLASS mergeable values. Per priority, distinct customers three
    * ways: exact, a direct sketch, and a TWO-LEVEL rollup (per-month tile
    * sketches → `hll_union_agg`). In coupon/sparse mode (small groups) the
    * tiled estimate equals the direct one EXACTLY — sketch state is an
    * order-independent set, so pre-aggregated tiles lose nothing
    * (ReshapeSpec pins that plus tile-count invariance at sfSmoke). Past
    * coupon mode the union's HLL_8 target re-estimates within the sketch
    * error of the direct HLL_4 sketch (~1.3% measured at sf0.01).
    *
    * THEOREM FORM (sketch binaries are not DuckDB-expressible, but their
    * contract is): the emitted row is (group, exact_custs, sketch_ok)
    * where sketch_ok checks engine-side that the tiled union estimate
    * lands within 2 % of the direct estimate AND the direct estimate
    * within 5 % of exact (the x112 thresholds). The oracle states the
    * exact count + ok = TRUE, so the key is driver-hash-checked; the
    * estimates themselves stay pinned per-group in ReshapeSpec.
    *
    * 100 TB: THE re-aggregation pattern — persist tiny per-partition/day
    * sketch tiles once, answer any distinct-count rollup (month, year,
    * ad-hoc priority sets) by unioning tiles, never rescanning the corpus.
    * approx_count_distinct's HLL++ state is internal-only; these sketches
    * are columns you can store and re-merge across jobs. The exact twin
    * here is affordable at bounded group count; unbounded users run tiles
    * only (or x122's exact bitmap tiles on dense ids). */
  /** The raw mergeable-sketch rollup behind x108: per priority the direct
    * estimate, the exact count, and the monthly-tile union estimate —
    * the user-facing re-aggregation query x108 wraps in its contract. */
  def x108Raw(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val tiles = o
      .groupBy(col("o_orderpriority"), date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val tiled = tiles.groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_tiled"))
    val direct = o.groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est_direct"),
           countDistinct(col("o_custkey")).as("exact_custs"))
    direct.join(tiled, Seq("o_orderpriority"))
  }

  def x108(spark: SparkSession, dir: String): DataFrame =
    x108Raw(spark, dir)
      .select(col("o_orderpriority"), col("exact_custs"),
        (abs(col("est_tiled") - col("est_direct")) * 50 <= col("est_direct") &&
         abs(col("est_direct") - col("exact_custs")) * 20 <= col("exact_custs"))
          .as("sketch_ok"))
      .orderBy("o_orderpriority")

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** x16: pivot — events long → wide counts per (user, event_type). The
    * value list is FIXED so the output schema is static and portable; Spark
    * plans it as a single conditional aggregation pass (no per-value scans). */
  /** x122: EXACT DISTINCT COUNTS FROM MERGEABLE BITMAP TILES — x108's
    * persist-tiles-rescan-never pattern with zero approximation error: each
    * (event_type, day, user-bucket) tile is one BIGINT whose bits mark the
    * 64 users of that id-bucket seen that day. Tiles OR together — across
    * days, types, any ad-hoc slice — and popcount after the union is the
    * EXACT distinct count (the Snowflake/ClickHouse BITMAP_* idiom). Output
    * per type: Σ-of-daily distincts (tile popcounts summed), the all-days
    * rollup distinct (tiles OR-merged THEN popcounted), and the direct
    * `countDistinct` — rollup == direct is part of the pinned result, the
    * exactness theorem the oracle re-states in SQL.
    *
    * 100 TB: tile state is |buckets| = max_user_id/64 BIGINTs per group —
    * dense-id corpora only (64M users/day ≈ 8 MB of tiles/day, vs the
    * sketch's KBs with ~1% error; sparse 2⁶³ key spaces need x108's HLL or
    * a roaring bitmap). Both aggs are partial+final map-side-combined
    * bit_or — no distinct-value shuffle anywhere, and persisted daily tiles
    * answer any later rollup without touching raw events. */
  def x122(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
              expr("user_id DIV 64").as("bucket"),
              expr("shiftleft(1L, CAST(user_id % 64 AS INT))").as("m"))
    val tiles = base.groupBy("event_type", "day", "bucket")
      .agg(expr("bit_or(m)").as("bm"))
    val daily = tiles.groupBy("event_type", "day")
      .agg(sum(bit_count(col("bm"))).as("d"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("d")).as("sum_daily"))
    val rolled = tiles.groupBy("event_type", "bucket")
      .agg(expr("bit_or(bm)").as("bm"))
      .groupBy("event_type")
      .agg(sum(bit_count(col("bm"))).cast(LongType).as("n_users_tiles"))
    val direct = Tables.events(spark, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users_direct"))
    daily.join(rolled, "event_type").join(direct, "event_type")
      .select(col("event_type"), col("n_days"), col("sum_daily"),
              col("n_users_tiles"), col("n_users_direct"))
      .orderBy("event_type")
  }

  /** x137: SLIDING DISTINCT FROM TILES — trailing-7-day distinct users per
    * (event_type, day), computed by OR-merging x122's daily bitmap tiles
    * across the window frame and popcounting the union: the incremental
    * answer to "7-day actives" that never re-touches raw events (x84 walks
    * a row-level window over the raw user stream; this walks a
    * |buckets|-row window over pre-reduced tiles — at 100 TB that is the
    * difference between re-scanning a week of events per day and merging
    * 8-byte tiles). The frame runs per (type, bucket) ordered by day; days
    * where a bucket has no tile contribute nothing, so the day spine per
    * bucket is densified from the type's OWN day set first (an absent
    * frame row would silently shrink the window).
    *
    * 100 TB: tiles aggregate once (map-side bit_or) and the corpus is
    * scanned ONCE — each tile then fans out to the ≤ 7 anchor days it can
    * serve (a bounded explode over the PRE-REDUCED tile table, never over
    * events; the earlier spine-join + RANGE-window draft re-scanned events
    * three times because column pruning made its three tile references
    * non-identical, killing exchange reuse). Anchors where the type had no
    * events of its own are dropped by the `observed` flag — a tile always
    * serves its own day, so observedness needs no second pass. The oracle
    * states the theorem: tile-union popcounts == COUNT(DISTINCT) over the
    * raw 7-day join — exactness of OR-merge under ANY regrouping, x122's
    * invariant extended to sliding frames. */
  def x137(spark: SparkSession, dir: String): DataFrame = {
    val tiles = Tables.events(spark, dir)
      .select(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
                .as("dayn"),
              expr("user_id DIV 64").as("bucket"),
              expr("shiftleft(1L, CAST(user_id % 64 AS INT))").as("m"))
      .groupBy("event_type", "dayn", "bucket")
      .agg(expr("bit_or(m)").as("bm"))
    tiles
      .select(col("event_type"), col("bucket"), col("bm"), col("dayn"),
              explode(sequence(col("dayn"), col("dayn") + 6)).as("adayn"))
      .groupBy("event_type", "adayn", "bucket")
      .agg(expr("bit_or(bm)").as("wbm"),
           max(when(col("dayn") === col("adayn"), 1L).otherwise(0L)).as("own"))
      .groupBy("event_type", "adayn")
      .agg(sum(bit_count(col("wbm"))).as("d7_users"),
           max(col("own")).as("observed"))
      .filter(col("observed") === 1)
      .select(col("event_type"),
              date_add(lit("1970-01-01").cast("date"), col("adayn")).as("day"),
              col("d7_users"))
      .orderBy("event_type", "day")
  }

  def x16(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy("user_id")

  /** x17: unpivot/melt — the x16 wide table back to long form, dropping the
    * zero cells introduced by pivot. `unpivot` is a zero-shuffle row
    * expansion. */
  def x17(spark: SparkSession, dir: String): DataFrame =
    x16(spark, dir)
      .unpivot(Array(col("user_id")),
               eventTypes.map(col).toArray, "event_type", "cnt")
      .filter(col("cnt") > 0)
      .orderBy("user_id", "event_type")

  /** The x257 KMV hash: the cubed Knuth mix over x13's shingle
    * fingerprints (a³ mod M — the x253 lesson: the raw linear map leaves
    * order structure that skews order-statistic estimators; measured on
    * this corpus the linear KMV union estimate is 42% off, the cubed one
    * 4%). Shared with the generated oracle. */
  private[graft] def kmvHashSql(fp: String): String = {
    val a = s"(($fp) * 2654435761 + 12345) % 2147483647"
    s"((($a) * ($a)) % 2147483647) * ($a) % 2147483647"
  }

  /** x257: KMV SNAPSHOT-OVERLAP ESTIMATION — "how much do two corpus
    * snapshots share?" answered from two 256-value sketches WITHOUT ever
    * joining the snapshots: each side keeps its k = 256 smallest distinct
    * shingle-fp hashes (k-minimum-values, Bar-Yossef et al.); the union
    * sketch is the k smallest of the MERGED 512 sketch values (KMV is
    * closed under merge — the property that lets snapshots sketch
    * independently and compare later, proven against the from-scratch
    * union sketch in Round10kSpec); distinct-union size estimates as
    * (k−1)·M/h₍ₖ₎ and Jaccard as the fraction of union-sketch values
    * present in BOTH sketches. The exact truths are computed beside the
    * estimates (4% / sketch-granularity error measured — stated, not
    * hidden), the validation a production cross-datacenter compare
    * cannot afford.
    *
    * 100 TB: per side ONE distinct-hash aggregate feeds an O(k)
    * `topk_pairs` heap (map-side partial, one row per partition
    * shuffles); everything after the heaps is ≤512 rows. The truth
    * branch (exact distinct counts) exists for validation and drops in
    * production — the sketches never see each other's corpus. */
  def x257(spark: SparkSession, dir: String): DataFrame = {
    val hs = graft.queries.LlmExt2
      .docFingerprints(Tables.documents(spark, dir))
      .select((col("doc_id") % 2).as("side"),
              expr(kmvHashSql("fp")).as("h"))
      .distinct()
      .materialized // consumers: two sketches + the truth aggs
    def sketch(side: Int) = hs.filter(col("side") === side)
      .agg(call_function("topk_pairs",
        negate(col("h").cast(DoubleType)), col("h"), lit(256)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.tag").as("h"))
    val ka = sketch(0).materialized // ≤256 rows, 3 consumers
    val kb = sketch(1).materialized
    val ku = ka.unionByName(kb).distinct()
      .orderBy("h").limit(256) // the MERGE: k smallest of the two sketches
    val both = ka.intersect(kb)
    val truth = hs.groupBy("h").agg(countDistinct(col("side")).as("ns"))
      .agg(count(lit(1)).as("true_union"),
           sum(when(col("ns") === 2, 1L).otherwise(0L)).as("true_inter"))
    val counts = hs.agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_b"))
    counts
      .crossJoin(broadcast(ka.agg(max(col("h")).as("kth_a"),
                                  count(lit(1)).as("ca"))))
      .crossJoin(broadcast(kb.agg(max(col("h")).as("kth_b"),
                                  count(lit(1)).as("cb"))))
      .crossJoin(broadcast(ku.agg(max(col("h")).as("kth_u"),
                                  count(lit(1)).as("cu"))))
      .crossJoin(broadcast(
        ku.join(both, Seq("h")).agg(count(lit(1)).as("inter_in_u"))))
      .crossJoin(broadcast(truth))
      .selectExpr(
        "n_a", "n_b", "kth_a", "kth_b", "kth_u",
        "CASE WHEN cu < 256 THEN cu ELSE CAST(255 AS BIGINT) * 2147483647 DIV kth_u END AS est_union",
        "true_union",
        "inter_in_u * 1000000 DIV cu AS est_j_ppm",
        "true_inter * 1000000 DIV true_union AS true_j_ppm")
  }
}
