package graft.examples

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Scale-linearity check: writes a 10× key-shifted copy of sf0.1 to /tmp and
  * compares flagship query runtimes against the original. Key shifting keeps
  * join fan-outs honest (a plain row duplication would square them).
  *
  * Observed (local[32], this container): q10/q12/q41/q44/x23 run 10× the data
  * in 1.0–1.9× the time (fixed job overhead still dominates at this size —
  * the distributed work is far from the bottleneck). x08 grows ~11×: the
  * synthetic copy gives EVERY document 10 near-duplicates, so candidate
  * pairs per LSH bucket grow quadratically in the duplication factor and the
  * output itself grows ~50× — linear in the true pair workload. x24 grows
  * 1.6–1.9× on 10× data even though every fingerprint bucket is 10× hotter —
  * the star-edge builder (Pipeline.fingerprintStarEdges) keeps edge volume
  * linear where the round-1 all-pairs self-join would have gone quadratic.
  * q09 runs 10× events (user-shifted: per-user history constant) at ~3× —
  * the bucketed range join tracks total row volume, not per-key pair counts.
  *
  * Round-5 additions (same container): x70 runs 10× the data at ~1× — the
  * top-k heap aggregate's exchange is k-bounded, so the extra rows only pay
  * scan+update cost. x78 (fact⋈fact SMJ, both sides 10× with disjoint key
  * shifts) lands at ~2× — linear in row volume. x86 grows ~22×: the
  * synthetic copy hands every document 9 true near-duplicates, so the
  * CORRECT output itself grows ~450× (every copy pair is a real j=1.0
  * pair); 22× runtime against 450× output is the same sublinear-in-true-
  * workload behavior as x08, not a plan defect — on production data where
  * duplicates are rare, candidates track the dup rate, not the corpus².
  * x104 (correlated subqueries, decorrelated to custkey aggregates +
  * joins) runs 10× the data — 10× the customers under the disjoint key
  * shift — at ~1.4×: the aggregate reduces before either join, so the
  * joins see |customers| rows, never |orders|².
  *
  * Round-6 additions (same container): both dirs are warmed before
  * timing so one-time costs (JIT, x113's bucketed ingest — a layout
  * cost paid once on a real warehouse) stay out of the ratio. x113
  * runs the co-located join on 10× the data at ~2.3× — the exchange-
  * free SMJ tracks scan volume; x109 lands at ~4.4–6× against a true
  * containment output that grows ~90× (every ordered twin pair of the
  * 10 identical copies), the same sublinear-in-true-workload behavior
  * as x08/x86. x119 runs 10× orders at ~1.2× — the co-purchase graph
  * saturates over the fixed part vocabulary, and the degree-oriented
  * adjacency intersection tracks edges, not wedges; x120 at ~1.5×
  * (window volume); x125 at ~1.2× — AQE reuses an orderkey exchange
  * across the semi/anti chain's identical lineitem⋈orders subplans
  * (one ReusedExchange in the adaptive plan) instead of re-shuffling
  * each arm.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local(32, 32)
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale10"
    val copies = 10
    val O = 10000000L; val C = 1000000L; val E = 100000000L; val D = 1000000L
    def rep(df: org.apache.spark.sql.DataFrame, shifts: Map[String, Long]) =
      (0 until copies).map { i =>
        shifts.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + lit(i * base)) }
      }.reduce(_ unionByName _)
    rep(Tables.lineitem(spark, src), Map("l_orderkey" -> O))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    rep(Tables.orders(spark, src), Map("o_orderkey" -> O, "o_custkey" -> C))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    rep(Tables.customer(spark, src), Map("c_custkey" -> C))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    rep(Tables.documents(spark, src), Map("doc_id" -> D))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$src/nation.parquet").write.mode("overwrite").parquet(s"$out/nation.parquet")
    spark.read.parquet(s"$src/region.parquet").write.mode("overwrite").parquet(s"$out/region.parquet")
    spark.read.parquet(s"$src/supplier.parquet").write.mode("overwrite").parquet(s"$out/supplier.parquet")
    // events: duplicate the RAW ns-long file so Tables.events still normalizes
    val evRaw = spark.read.parquet(s"$src/events.parquet")
    (0 until copies).map(i => evRaw
        .withColumn("event_id", col("event_id") + lit(i * E))
        .withColumn("user_id", col("user_id") + lit(i * C)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    for (q <- Seq("q10_join_multiway_tpch_q5", "q12_agg_tpch_q1",
                  "q41_ml_chi_rule_weights", "q44_dedup_exact",
                  "x08_dedup_ngram_jaccard", "x23_asof_join_native",
                  // q09: user-count shifting keeps per-user history length
                  // constant, so the bucketed range join must stay ~linear
                  // (the bare equi-join it replaced was per-key quadratic)
                  "q09_join_range_pairs",
                  // x24: the 10× copy makes every fingerprint bucket 10×
                  // hotter — exactly the regime the star-edge builder must
                  // keep linear (the round-1 all-pairs form went quadratic)
                  "x24_dedup_components",
                  // x70: the heap aggregate's exchange stays k-bounded, so
                  // 10× input should cost ~scan time only
                  "x70_topk_native",
                  // x78: both join sides grow 10× with disjoint keyshifts —
                  // the orderkey SMJ must track row volume linearly
                  "x78_ship_delay_stats",
                  // x86: every fingerprint bucket is 10× hotter, same
                  // candidate-pair pressure as x24/x08's regime
                  "x86_minhash_oracle_lsh",
                  // x104: decorrelated subqueries — the custkey aggregates
                  // and their joins must track row volume (customer count
                  // grows 10× under the disjoint custkey shift)
                  "x104_correlated_subquery",
                  // x109: 10 identical copies of every doc make each
                  // fingerprint 10× hotter AND the true containment output
                  // grow ~90× (all ordered twin pairs) — the prefix filter
                  // must keep candidates tracking true pairs, not corpus²
                  "x109_containment_prefix",
                  // x113: the bucketed ingest (10× write) plus the
                  // exchange-free co-located join — both must track row
                  // volume; the join itself reads co-located buckets at
                  // any scale
                  "x113_colocated_join",
                  // x119: 10× orders over the SAME part vocabulary — each
                  // part meets more partners, but the co-purchase graph
                  // saturates (pairs are drawn from a fixed vocab²), so
                  // edge growth is sublinear and the O(√m) out-degree
                  // bound keeps intersection work tracking edges
                  "x119_triangle_count",
                  // x120: every fingerprint bucket is 10× hotter AND every
                  // window of a copied doc becomes cross-doc duplicated —
                  // the fp-keyed semi join must track window volume
                  "x120_span_dup_stats",
                  // x125: semi+anti reuse the orderkey lineage — 10× both
                  // fact sides with disjoint keys must stay ~linear
                  "x125_sole_late_supplier")) {
      // warm BOTH dirs: steady-state on each side, so one-time costs (JIT,
      // codegen, x113's bucketed ingest — a layout cost paid once on a real
      // warehouse) stay out of the ratio
      graft.SparkEntry.queries(q)(spark, src).collect()
      graft.SparkEntry.queries(q)(spark, out).collect()
      val t1 = System.nanoTime; graft.SparkEntry.queries(q)(spark, src).collect()
      val small = (System.nanoTime - t1) / 1e9
      val t2 = System.nanoTime; graft.SparkEntry.queries(q)(spark, out).collect()
      val big = (System.nanoTime - t2) / 1e9
      println(f"$q: base=${small}%.2f s ${copies}x=${big}%.2f s ratio=${big / small}%.1f")
    }
    spark.stop()
  }
}
