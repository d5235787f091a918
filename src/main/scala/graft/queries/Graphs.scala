package graft.queries

import graft.engine.Mat.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.engine.Tables

/** x188–x189: multi-hop graph operators over the support-≥2 co-purchase
  * graph (x181's edge definition) — BFS hop histogram from a deterministic
  * seed set, and k-core peeling. Both are FIXED-round iterations (3), so
  * each plan is a static composition with no driver-side convergence probe
  * — the property that makes them oracle-checkable as unrolled SQL.
  */
object Graphs {

  /** Undirected support-≥2 co-purchase edges, both directions — the same
    * graph x181 propagates labels over (parts co-ordered at least twice).
    * 100 TB: the pair build is per-order (bounded by order width²), never
    * all-pairs over parts; the support filter runs inside the (u,v)
    * partial aggregate. */
  private def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val e0 = op.as("a")
      .join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("u", "v")
    e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
  }

  /** x188: BFS HOP HISTOGRAM — breadth-first reach from the deterministic
    * seed set {nodes ≡ 0 mod 97}, 3 hops, reporting how many nodes sit at
    * hop 0/1/2/3 and how many stay unreached (hop −1). The "blast radius"
    * primitive behind recall/contamination spread analyses; complements
    * x24 (components), x119 (triangles), x181 (communities). Every hop
    * level emits exactly one histogram row even when empty (a 1-row global
    * aggregate per level), so the output shape is static like the oracle's.
    *
    * 100 TB: each hop is one keyed join (edges hashed on the neighbor end,
    * frontier on node) + a distinct + an anti-join against the reached set
    * — frontier-sized, not graph-sized; the edge list is built once,
    * pre-partitioned on `v`, and reused by all 3 hops; each level
    * localCheckpoints to keep the unrolled lineage flat. */
  def x188(spark: SparkSession, dir: String): DataFrame = {
    val und = copurchaseEdges(spark, dir).repartition(col("v")).persist()
    val nodes = und.select(col("u").as("node")).distinct()
    // NOTE (r15 optimization pass): converting these per-level eager
    // checkpoints to LAZY ones was tried and REVERTED — with multiple
    // aggregate branches referencing different rounds, the single final
    // job races sibling stages into recomputing whole round chains before
    // their persist blocks register (x290 measured 2.9 s -> 5.5 s).
    // Eager-per-round serializes the rounds exactly once each.
    var reached = nodes.filter(col("node") % 97 === 0)
      .materialized
    var frontier = reached
    var levelCounts = Seq(
      reached.agg(count(lit(1)).as("n_nodes"))
        .select(lit(0L).as("hop"), col("n_nodes")))
    for (i <- 1 to 3) {
      val next = und.join(frontier, col("v") === col("node"))
        .select(col("u").as("node")).distinct()
        .join(reached.select(col("node").as("rn")),
              col("node") === col("rn"), "left_anti")
        .materialized
      levelCounts = levelCounts :+ next.agg(count(lit(1)).as("n_nodes"))
        .select(lit(i.toLong).as("hop"), col("n_nodes"))
      reached = reached.unionByName(next).materialized
      frontier = next
    }
    val unreached = nodes
      .join(reached.select(col("node").as("rn")),
            col("node") === col("rn"), "left_anti")
      .agg(count(lit(1)).as("n_nodes"))
      .select(lit(-1L).as("hop"), col("n_nodes"))
    val out = (unreached +: levelCounts).reduce(_ unionByName _)
      .orderBy("hop").materialized
    und.unpersist()
    out
  }

  /** x189: K-CORE PEELING — 3 rounds of 2-core reduction: each round drops
    * every node with degree < 2 and all edges touching it, reporting
    * (nodes, edges) remaining after each round. Fixed-round peeling toward
    * the 2-core — the graph-cleaning primitive (degree-1 tendrils are
    * noise for community/triangle analyses) — with the round count static,
    * like x181's LPA, so the oracle unrolls.
    *
    * 100 TB: each round = one degree partial-aggregate + two semi-joins
    * (kept-node filter on each endpoint) — all keyed, all graph-linear; the
    * per-round stats are 1-row global aggregates; localCheckpoint flattens
    * the 3-round lineage. */
  def x189(spark: SparkSession, dir: String): DataFrame = {
    var cur = copurchaseEdges(spark, dir).materialized
    var stats = Seq.empty[DataFrame]
    for (r <- 1 to 3) {
      val keep = cur.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2).select("u")
      cur = cur
        .join(keep.select(col("u").as("ku")), col("u") === col("ku"),
              "left_semi")
        .join(keep.select(col("u").as("kv")), col("v") === col("kv"),
              "left_semi")
        .materialized
      stats = stats :+ cur
        .agg(countDistinct(col("u")).as("n_nodes"),
             count(lit(1)).as("ne"))
        .select(lit(r.toLong).as("round"), col("n_nodes"),
                expr("ne DIV 2").as("n_edges"))
    }
    stats.reduce(_ unionByName _).orderBy("round")
  }

  /** x194: NEAR-DUP CLUSTERS — dedup GROUPS, not just pairs: documents
    * sharing ≥2 distinct rolling-hash 5-gram fingerprints (x13/x120's
    * span-dup signal) become edges; 3 fixed rounds of synchronous
    * min-label propagation collapse the edge set into cluster ids; output
    * is (cluster_id, n_docs) — what a curation pipeline actually consumes
    * (keep one per cluster). Complements x24 (convergence-driven CC over
    * exact-dup edges) with an oracle-checkable fixed-round variant over
    * NEAR-dup edges, and x86/x109 (pair emitters) with the grouping step.
    *
    * 100 TB: fingerprints come from the native `rolling_fps` expression —
    * one codegen'd pass, no shuffle (x120's path); the pair build is
    * fp-keyed (never doc×doc) with the support-≥2 filter inside the (u,v)
    * partial aggregate and the [[HotFpCap]] hot-fingerprint guard (drop
    * boilerplate fps seen in > 64 docs) applied before the self-join, so
    * no single viral fp can fan out quadratically. Each label round is
    * one keyed join + a
    * min partial-aggregate over the cached, pre-partitioned edge list
    * (x181's reuse pattern). */
  /** Hot-fingerprint cap: a fingerprint shared by more than this many
    * documents is boilerplate (license headers, navigation chrome), not
    * duplication signal — and it is exactly the key whose fp-keyed
    * self-join fans out quadratically (10⁶ docs sharing one viral fp →
    * 5·10¹¹ candidate pairs). Dropping fps with df > K bounds every
    * join group at K²/2 pairs. 64 is far above any real dup cluster's
    * fp-sharing and far below boilerplate reach; the testdata corpus
    * maxes out at df = 4 (sf0.1), so the oracle keys see no change. */
  private[graft] val HotFpCap = 64L

  /** Near-dup candidate pairs: docs sharing ≥2 distinct rolling-hash
    * 5-gram fingerprints, u < v — the classic LSH bucket-pair shape.
    * ONE fp-keyed shuffle collapses each fingerprint to its distinct doc
    * set (`collect_set`, bounded by [[HotFpCap]] — the guard is a size
    * check on the already-built group, not a second df pass), pairs are
    * exploded IN-MAP from the ≤cap-sized sets, and the ≥2-shared-fp
    * support filter sits behind the (u,v) partial aggregate.
    *
    * Round-10 rebuild: the previous formulation (df aggregate + keep-join
    * + fp self-join) claimed its exchanges were reused, but the physical
    * plan scanned documents FOUR times and computed `rolling_fps` on each
    * (VERDICT r9 observation 1 — x196 doubled when the cap landed). This
    * shape scans once, shuffles (fp) once and (u,v) once; per-group state
    * is ≤ cap doc ids (512 B), and the in-map pair fan-out is bounded by
    * cap²/2 per fingerprint — exactly the bound the guard exists to
    * enforce. PlanSpec pins the single-scan, join-free plan. */
  private[graft] def fpSharePairs(docs: org.apache.spark.sql.DataFrame): DataFrame =
    LlmExt2.docFingerprints(docs)
      .groupBy("fp").agg(collect_set(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= HotFpCap)
      .select(explode(col("ds")).as("u"), col("ds"))
      .select(col("u"), explode(col("ds")).as("v"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("u", "v")

  def x194(spark: SparkSession, dir: String): DataFrame = {
    val e0 = fpSharePairs(Tables.documents(spark, dir))
    val und = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("v")).persist()
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      labels = und.join(labels, col("v") === col("node"))
        .select(col("u").as("node"), col("label"))
        .unionByName(labels)
        .groupBy("node")
        .agg(min(col("label")).as("label"))
        .materialized
    }
    val out = labels.groupBy("label").agg(count(lit(1)).as("n_docs"))
      .select(col("label").as("cluster_id"), col("n_docs"))
      .orderBy(col("n_docs").desc, col("cluster_id"))
      .materialized
    und.unpersist()
    out
  }

  /** x196: TOKEN-COSINE PAIR SCORING — exact term-frequency cosine for
    * every x194 near-dup candidate pair: dot = Σ_t tf_a(t)·tf_b(t)
    * (exact BIGINT), cosine = dot/(√‖a‖·√‖b‖) rounded 6 dp. The scoring
    * half of the candidate→verify dedup protocol: the fp bands FIND
    * candidates cheaply, the cosine DECIDES, and both halves are
    * oracle-checked (x86 does the same with Jaccard; this is the
    * vector-space twin reusing the corpus's own tf vectors).
    *
    * 100 TB: never all-pairs — the tf join fans each candidate pair out
    * by ONE side's token list, then contracts through a keyed (doc, tok)
    * hash join and a (u,v) partial aggregate; norms are one ≤|docs|-row
    * aggregate attached by two keyed joins. */
  def x196(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val e0 = fpSharePairs(docs)
    val cnts = LlmExt2.tokens(docs)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val norms = cnts.groupBy("doc_id")
      .agg(sum(col("c") * col("c")).as("nrm"))
    val num = e0
      .join(cnts.select(col("doc_id").as("u"), col("tok"),
                        col("c").as("ca")), Seq("u"))
      .join(cnts.select(col("doc_id").as("v"), col("tok"),
                        col("c").as("cb")), Seq("v", "tok"))
      .groupBy("u", "v").agg(sum(col("ca") * col("cb")).as("dot"))
    num
      .join(norms.select(col("doc_id").as("u"), col("nrm").as("na")), "u")
      .join(norms.select(col("doc_id").as("v"), col("nrm").as("nb")), "v")
      .select(col("u").as("doc_a"), col("v").as("doc_b"), col("dot"),
        round(col("dot").cast(org.apache.spark.sql.types.DoubleType) /
              (sqrt(col("na").cast(org.apache.spark.sql.types.DoubleType)) *
               sqrt(col("nb").cast(org.apache.spark.sql.types.DoubleType))),
          6).as("cosine"))
      .orderBy("doc_a", "doc_b")
  }

  /** x255: WEIGHTED k-HOP DISTANCES (bounded Bellman–Ford) — the weighted
    * companion the graph family lacked (x188's BFS counts hops; this
    * prices them): over the symmetrized adjacent-bigram co-occurrence
    * graph with integer edge costs w = 1000 + ⌊10⁶/cnt⌋ (stronger
    * co-occurrence ⇒ shorter edge — all exact BIGINT), the exact
    * shortest distance USING ≤4 EDGES from the corpus's highest-df token
    * to each of the 20 highest-df tokens. Four relaxation rounds compute
    * precisely the ≤4-edge optimum (the Bellman–Ford prefix property —
    * the theorem Round10jSpec replays), so the bound is a stated
    * contract, not an approximation apology.
    *
    * 100 TB: the edge list is a vocab²-bounded (Zipf-thin in practice)
    * aggregate built once and reused across rounds; each round is one
    * token-keyed join + min-aggregate, `localCheckpoint` per round (the
    * x24/x188 iteration discipline — lineage must not nest 4 joins
    * deep); the top-20 stitch is a broadcast. Rounds scale with the hop
    * bound, never with corpus size. */
  def x255(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
              filter(split(lower(col("text")), " "), t => t =!= "").as("ts"))
    val bigr = docs
      .select(explode(expr(
        """CASE WHEN size(ts) < 2 THEN array()
          |ELSE transform(sequence(1, size(ts) - 1),
          |               i -> struct(element_at(ts, i) AS t1,
          |                           element_at(ts, i + 1) AS t2)) END"""
          .stripMargin)).as("pr"))
      .groupBy(col("pr.t1").as("a"), col("pr.t2").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3 && col("a") =!= col("b"))
    val edges = bigr.select(col("a").as("u"), col("b").as("v"), col("cnt"))
      .unionByName(bigr.select(col("b").as("u"), col("a").as("v"), col("cnt")))
      .groupBy("u", "v").agg(sum(col("cnt")).as("c"))
      .withColumn("w", expr("1000 + 1000000 DIV c"))
      .select("u", "v", "w")
      .materialized // reused by all 4 relaxation rounds
    val df = docs.select(explode(array_distinct(col("ts"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .materialized // two consumers: the source pick + the top-20
    val src = df.orderBy(col("df").desc, col("tok").asc).limit(1)
      .select(col("tok").as("v"), lit(0L).as("d"))
    var dist = src.materialized
    for (_ <- 1 to 4) {
      dist = dist
        .unionByName(dist.join(edges, dist("v") === edges("u"))
          .select(edges("v"), (dist("d") + edges("w")).as("d")))
        .groupBy("v").agg(min(col("d")).as("d"))
        .materialized
    }
    df.orderBy(col("df").desc, col("tok").asc).limit(20)
      .join(dist, col("tok") === dist("v"), "left")
      .select(col("tok"), col("df"),
              coalesce(col("d"), lit(-1L)).as("dist4"))
      .orderBy("tok")
  }

  /** x287: LINK PREDICTION (common-neighbors + Adamic–Adar) on the
    * customer–part bipartite graph — for every part pair that shares
    * at least TWO buyers (the copurchaseEdges support convention; one
    * shared buyer is noise) but was NEVER co-ordered, the number of
    * common customers and the Adamic–Adar score Σ_c 1/ln(deg(c)) (rare
    * shared buyers weigh more than promiscuous ones): the classic
    * candidate generator for recommendation / graph-completion pipelines.
    * Top 50 predicted links by (cn, aa) with a full tie order.
    *
    * Determinism: Adamic–Adar terms are irrational, so each customer's
    * term rounds to integer micro-units ONCE (round(10⁶/ln deg, 0) —
    * bit-stable round-to-0, x271 lesson) and the pair score is an
    * order-free BIGINT sum of those fixed terms — never a float sum.
    *
    * 100 TB: the pair fan-out is a CO-PARTITIONED self-join on the
    * customer key (both sides are the same checkpointed bipartite edge
    * set, so one exchange feeds both), kept entirely inside whole-stage
    * codegen — the earlier collect_set + in-map-HOF variant evaluated the
    * pair lambda INTERPRETED and ran 5× slower at the same shuffle volume
    * (measured 8.6 s → 2 s on the 13 M-pair sf0.1 grid); Spark HOFs do
    * not codegen, so "avoid the join" is the wrong trade here. The
    * hot-vertex cap (2 ≤ deg ≤ 256) filters BEFORE the fan-out; the pair
    * key packs to ONE BIGINT (pa·10⁶ + pb — halves the aggregate's
    * hash/shuffle width vs a struct key). The packing is only injective
    * while every partkey < 10⁶ (TPC-H reaches that at sf≈5), so both pack
    * sites run behind [[guardPairDomain]] — the map-side
    * `assert_true().isNull` where-guard (RecallMatrices' device): zero
    * extra shuffle, and the job FAILS LOUDLY on the first violating row
    * instead of silently merging collided pair groups; widen pk to
    * DECIMAL(38,0) to lift the cap, same plan. The support threshold
    * cn ≥ 2 (the
    * copurchaseEdges convention — one shared buyer is noise) shrinks the
    * anti-join input from the mostly-unique pair grid to the signal set.
    * Degree-1 customers drop with the cap (a common neighbor has degree
    * ≥ 2 by definition — and ln 1 = 0 would divide by zero). */
  /** The packed-pair-key base: pk = pa·PairPackBase + pb is injective only
    * while 0 ≤ pa, pb < PairPackBase. */
  private[graft] val PairPackBase = 1000000L

  /** Fail-loud domain guard for the packed pair key (VERDICT r12 task 4):
    * NULL (row passes) while both keys sit below [[PairPackBase]]; raises
    * on the FIRST violating row — map-side, codegen'd, no extra shuffle,
    * no driver action. Without it, partkeys ≥ 10⁶ would collide distinct
    * pairs into one pk and the DIV/% unpack would return garbage
    * silently. */
  private[graft] def guardPairDomain(df: DataFrame): DataFrame =
    df.where(assert_true(
      col("pa") >= 0L && col("pa") < lit(PairPackBase) &&
        col("pb") >= 0L && col("pb") < lit(PairPackBase),
      lit(s"x287 packed pair key requires 0 <= partkey < $PairPackBase " +
        "(widen pk to DECIMAL(38,0) to lift the cap)")).isNull)

  def x287(spark: SparkSession, dir: String): DataFrame = {
    // the (customer, part) and (order, part) base frames are independent
    // eager materializations — overlap them (guide §2.6, Par); identical
    // outputs
    val (cp, op) = graft.engine.Par.two(
      () => Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey"),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
        .materialized, // both sides of the self-join + degree agg
      () => Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        .materialized)
    val deg = cp.groupBy("c").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= 256)
      .withColumn("term_micro",
        round(lit(1000000.0) / log(col("deg").cast(DoubleType)), 0)
          .cast(LongType))
    val scored = guardPairDomain(cp.join(deg, "c")
      .select(col("c"), col("p").as("pa"), col("term_micro"))
      .join(cp.select(col("c"), col("p").as("pb")), "c")
      .filter(col("pa") < col("pb")))
      .select((col("pa") * PairPackBase + col("pb")).as("pk"),
              col("term_micro"))
      .groupBy("pk")
      .agg(count(lit(1)).as("cn"), sum(col("term_micro")).as("aa_micro"))
      .filter(col("cn") >= 2)
    val edgePairs = guardPairDomain(op.select(col("o"), col("p").as("pa"))
      .join(op.select(col("o"), col("p").as("pb")), "o")
      .filter(col("pa") < col("pb")))
      .select((col("pa") * PairPackBase + col("pb")).as("pk")).distinct()
    scored.join(edgePairs, Seq("pk"), "left_anti")
      .select(expr("pk DIV 1000000").as("pa"), expr("pk % 1000000").as("pb"),
              col("cn"), col("aa_micro"))
      .orderBy(col("cn").desc, col("aa_micro").desc, col("pa"), col("pb"))
      .limit(50)
  }

  /** x290: PERSONALIZED PAGERANK — 3 unrolled push iterations with teleport
    * to x188's seed set (nodes ≡ 0 mod 97) over the co-purchase graph:
    * the "relevance from these items" primitive behind recommendation
    * candidate generation and taxonomy expansion, complementing x67's
    * GLOBAL PageRank. EXACT integer mass units (each seed starts with
    * 10¹²): per edge the damped transfer is (m·17) DIV (20·deg u), per
    * node the teleport contribution (m·3) DIV 20 pools and redistributes
    * equally over the seeds (pool DIV \|seeds\|) — every step is BIGINT
    * floor division both engines replay, so the mass vector is
    * bit-identical and integer truncation only LEAKS mass, never creates
    * it: total mass is monotonically non-increasing, and that conservation
    * theorem rides the output as an oracle-recomputed flag. Top 20 nodes
    * by (mass, id).
    *
    * 100 TB: each iteration is ONE mass⋈edges join co-keyed on the source
    * node + a node-keyed inflow aggregate (frontier mass never fans out
    * beyond the true edge count), plus a 1-row teleport scalar broadcast
    * back to the bounded seed set; rounds localCheckpoint to keep the
    * unrolled lineage flat, exactly the x188 discipline. Damping 17/20 and
    * the integer grain make convergence auditing exact — production would
    * iterate to a mass-delta threshold with the same per-round plan. */
  def x290(spark: SparkSession, dir: String): DataFrame = {
    val und = copurchaseEdges(spark, dir)
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    // edges with out-degree attached, built ONCE and reused by all rounds
    val outE = und.join(deg, "u").materialized
    val seeds = outE.select(col("u").as("node")).distinct()
      .filter(col("node") % 97 === 0).materialized
    val nSeeds = seeds.agg(count(lit(1)).as("ns"))
    val m0tot = seeds.agg((count(lit(1)) * lit(1000000000000L)).as("t0"))
    var mass = seeds.select(col("node"), lit(1000000000000L).as("m"))
      .materialized
    val totals = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (_ <- 1 to 3) {
      val inflow = outE
        .join(mass.select(col("node").as("u"), col("m")), "u")
        .select(col("v").as("node"),
                expr("(m * 17) DIV (20 * deg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      val pool = mass.agg(sum(expr("(m * 3) DIV 20")).as("pool"))
      val teleport = seeds.crossJoin(broadcast(pool.crossJoin(nSeeds)))
        .select(col("node"), expr("pool DIV ns").as("c"))
      mass = inflow.unionByName(teleport)
        .groupBy("node").agg(sum(col("c")).as("m"))
        .filter(col("m") > 0)
        .materialized
      totals += mass.agg(sum(col("m")).as("t"))
    }
    val Seq(t1, t2, t3) = totals.toSeq
    val flags = m0tot.crossJoin(t1.select(col("t").as("t1")))
      .crossJoin(t2.select(col("t").as("t2")))
      .crossJoin(t3.select(col("t").as("t3")))
      .select((col("t1") <= col("t0") && col("t2") <= col("t1") &&
               col("t3") <= col("t2")).as("mass_conserved"))
    mass.crossJoin(broadcast(flags))
      .orderBy(col("m").desc, col("node"))
      .limit(20)
      .select(col("node"), col("m").as("mass"), col("mass_conserved"))
      .orderBy(col("mass").desc, col("node"))
  }
}
