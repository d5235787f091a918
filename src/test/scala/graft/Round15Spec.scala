package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 operator contracts: x315 substring-dedup apply pass. */
class Round15Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x315 planted-passage surgery: shared passage cut from every holder, rest intact") {
    import spark.implicits._
    val passage = (1 to 15).map(i => s"tok$i").mkString(" ")
    val inner = (1 to 13).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha $passage omega"),
      (2L, s"beta gamma $passage"),
      (3L, "entirely unrelated words " + (1 to 12).map(i => s"u$i").mkString(" ")),
      (4L, s"$inner $inner") // self-repetition: both copies are the signal
    ).toDF("doc_id", "text")
    val out = graft.queries.LlmExt2.x315Apply(docs, 13)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1: the 15 passage tokens are exactly the flagged coverage
    // (window starts 1..3 cover positions 1..15); 'alpha'/'omega' survive
    assert(out(1L).getAs[String]("cleaned_text") === "alpha omega")
    assert(out(1L).getAs[Long]("removed_tokens") === 15L)
    assert(out(1L).getAs[Long]("n_runs_cut") === 1L)
    // doc 2: same passage at a different offset — cut identically
    assert(out(2L).getAs[String]("cleaned_text") === "beta gamma")
    assert(out(2L).getAs[Long]("removed_tokens") === 15L)
    // doc 3: no duplicated window — passes through whole (normalized form)
    assert(out(3L).getAs[Long]("removed_tokens") === 0L)
    assert(out(3L).getAs[Long]("kept_tokens") === 15L)
    assert(out(3L).getAs[String]("cleaned_text").startsWith("entirely unrelated"))
    // doc 4: a 13-token run repeated back-to-back — the two flagged starts
    // sit exactly K apart, merge into ONE run, and the whole doc is cut
    assert(out(4L).getAs[String]("cleaned_text") === "")
    assert(out(4L).getAs[Long]("kept_tokens") === 0L)
    assert(out(4L).getAs[Long]("removed_tokens") === 26L)
    assert(out(4L).getAs[Long]("n_runs_cut") === 1L)
    // conservation + no-survivor theorems on every row
    out.values.foreach { r =>
      assert(r.getAs[Boolean]("conserve_ok"))
      assert(r.getAs[Long]("n_flag_survive") === 0L)
      assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("removed_tokens")
        === r.getAs[Long]("n_tokens"))
    }
    // doc count preserved
    assert(out.size === 4)
  }

  test("x315 at sf0.001: ledger consistent with x298's run report") {
    val apply = graft.queries.LlmExt2.x315(spark, sfSmoke).collect()
    assert(apply.length === 500) // one row per document, none dropped
    apply.foreach { r =>
      assert(r.getAs[Boolean]("conserve_ok"))
      assert(r.getAs[Long]("n_flag_survive") === 0L)
    }
    // x298 reports the runs; x315 cuts them. Coverage = disjoint-run union,
    // so per-doc removed_tokens must equal the sum of x298's run n_tokens,
    // and n_runs_cut the run count.
    val runs = graft.queries.LlmExt2.x298(spark, sfSmoke).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) =>
        d -> (rs.map(_.getAs[Long]("n_tokens")).sum, rs.length.toLong) }
    val cut = apply.filter(_.getAs[Long]("removed_tokens") > 0)
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("removed_tokens"), r.getAs[Long]("n_runs_cut"))).toMap
    assert(cut.keySet === runs.keySet)
    runs.foreach { case (d, (tok, n)) => assert(cut(d) === ((tok, n))) }
  }

  test("x316 gram novelty: first-sight convention and per-source ledger on a planted corpus") {
    import spark.implicits._
    val p1 = (1 to 13).map(i => s"a$i").mkString(" ")
    val p2 = (1 to 13).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", p1), // unique gram: novel, not duplicated
      (2L, "srcA", p2), // first sight of p2: novel AND duplicated
      (3L, "srcB", p2)  // repeat of p2: not novel, duplicated
    ).toDF("doc_id", "source", "text")
    val out = graft.queries.LlmExt2.gramNoveltyFrom(docs, 13)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("srcA"); val b = out("srcB")
    assert(a.getAs[Long]("n_sites") === 2L && a.getAs[Long]("n_novel") === 2L &&
      a.getAs[Long]("n_dup_sites") === 1L)
    assert(a.getAs[Long]("novelty_ppm") === 1000000L &&
      a.getAs[Long]("dup_ppm") === 500000L)
    assert(b.getAs[Long]("n_sites") === 1L && b.getAs[Long]("n_novel") === 0L &&
      b.getAs[Long]("n_dup_sites") === 1L)
    assert(b.getAs[Long]("novelty_ppm") === 0L &&
      b.getAs[Long]("dup_ppm") === 1000000L)
  }

  test("x317 hard negatives: band excludes duplicates and easy negatives, rank is (cos desc, id)") {
    import spark.implicits._
    def vec(vals: (Int, Float)*): Seq[Float] = {
      val m = vals.toMap; Seq.tabulate(64)(i => m.getOrElse(i, 0.0f))
    }
    val emb = Seq(
      (0L, vec(0 -> 1.0f)),            // anchor A = e0
      (1L, vec(0 -> 1.0f)),            // exact dup of A: cos 1.0 — EXCLUDED (above ceiling)
      (2L, vec(0 -> 1.0f, 1 -> 1.0f)), // cos(A)=1/√2≈0.7071, cos(B)=1/√2
      (3L, vec(1 -> 1.0f)),            // = anchor B's direction: cos(A)=0 excluded
      (4L, vec(0 -> 2.0f, 1 -> 1.0f)), // cos(A)=2/√5≈0.8944, cos(B)=1/√5≈0.4472
      (50L, vec(1 -> 1.0f))            // anchor B = e1
    ).toDF("vec_id", "embedding")
    val rows = graft.queries.LlmExt.hardNegativesFrom(emb).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Long]("rank"),
                 r.getAs[Long]("neg_id"), r.getAs[Long]("cos_micro"))).toSeq
    assert(rows === Seq(
      (0L, 1L, 4L, 894427L), (0L, 2L, 2L, 707107L),
      (50L, 1L, 2L, 707107L), (50L, 2L, 4L, 447214L)))
  }

  test("x284 hot-cell anchor cap: keeper search bounded at the 256 earliest members") {
    import spark.implicits._
    def unit(j: Int): Seq[Float] = Seq.tabulate(64)(i => if (i == j) 1.0f else 0.0f)
    // One pathological cell (k = 1 ⇒ everything assigns to vec 0's cell):
    // 300 exact copies of e1 (ids 1..300), then a twin PAIR of e2 at ids
    // 301/302 — the pair's earlier member ranks past the 256-anchor window.
    val emb = (Seq((0L, unit(0))) ++ (1L to 300L).map(i => (i, unit(1))) ++
      Seq((301L, unit(2)), (302L, unit(2))))
      .toDF("vec_id", "embedding")
    val out = graft.queries.Clustering.semDedupFrom(emb, 1).collect()
    // every copy of e1 past the first is dropped — its keeper (id 1) is an
    // anchor, so the cap costs nothing even though the cell holds 303
    assert(out.map(_.getAs[Long]("vec_id")).toSet === (2L to 300L).toSet)
    out.foreach { r =>
      assert(r.getAs[Long]("keeper") === 1L)
      assert(r.getAs[Long]("cos_micro") === 1000000L)
    }
    // id 302 SURVIVES: its only twin (301) is not among the cell's 256
    // earliest members — the documented recall trade that buys the
    // O(N·cap) pair bound; production recovers it by scaling k (x311)
    assert(!out.exists(_.getAs[Long]("vec_id") === 302L))
  }

  test("x284/x311 unchanged at the sf0.001 gate: no cell reaches the cap") {
    // max cell size at the oracle sfs is ~70 (sf0.01) — the capped chain
    // must reproduce the uncapped r14 answer there bit for bit; pin via
    // the round-over-round row count + per-row contract at sf0.001
    val rows = graft.queries.Clustering.x284(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("keeper") < r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("cos_micro") >= 400000L)
    }
  }

  test("x111 clustered-corpus recall: floors clear 15/20 at sf0.001 with pinned counts") {
    val emb = graft.engine.Tables.embeddings(spark, sfSmoke)
    val raw = graft.queries.RecallMatrices.clusterRecall(emb).collect()
      .map(r => r.getAs[String]("method") ->
        (r.getAs[Long]("found"), r.getAs[Long]("planted"))).toMap
    // 500 vectors ⇒ 72 nonzero seeds ⇒ 1440 planted member-hits possible
    val (ivfF, ivfP) = raw("x18_cluster_recall20")
    val (pqF, pqP) = raw("x310_cluster_recall20")
    assert(ivfP === 1440L && pqP === 1440L)
    assert(ivfF * 20L >= ivfP * 15L,
      s"IVF clustered recall below floor: $ivfF/$ivfP")
    assert(pqF * 20L >= pqP * 15L,
      s"PQ clustered recall below floor: $pqF/$pqP")
  }

  test("x111 matrix rows green at all three sfs (cluster floors included)") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")) {
      val rows = graft.queries.RecallMatrices.x111(spark, sf).collect()
        .map(r => r.getAs[String]("method") ->
          (r.getAs[Long]("found_pairs"), r.getAs[Long]("planted_pairs"))).toMap
      assert(rows("x18_cluster_recall20") === ((1L, 1L)), s"ivf floor at $sf")
      assert(rows("x310_cluster_recall20") === ((1L, 1L)), s"pq floor at $sf")
      // the pre-existing theorem rows stay exact
      assert(rows("x18_ivf_same_cell")._1 === rows("x18_ivf_same_cell")._2)
      assert(rows("x310_pq_same_code")._1 === rows("x310_pq_same_code")._2)
    }
  }
}
