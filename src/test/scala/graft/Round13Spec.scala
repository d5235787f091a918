package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 specs: x298 exact substring dedup (planted shared passages),
  * x299 DSIR selection (full JVM LM replay), x300 context chunking (stride
  * arithmetic replay), x301 dedup-aware split (planted groups), x302
  * learned quality filter (cross-key gate theorem), the x287
  * packed-pair-key fail-loud guard, and the bench environment probe. */
class Round13Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import spark.implicits._

  /** Plant a documents dir with the given (doc_id, text) rows. */
  private def plantDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("x298dir").toString
    rows.map { case (id, t) => (id, t, "aa", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def runs(dir: String): Seq[(Long, Long, Long, Long, Long, Long)] =
    graft.queries.LlmExt2.x298(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))

  test("x298 finds a 20-token passage planted across 3 docs at 3 offsets") {
    // passage P of 20 tokens; per-doc filler tokens are globally unique so
    // only windows fully inside P are shared (8 windows: starts 0..7
    // relative to P's offset) — one merged run per doc covering exactly P
    val p = (1 to 20).map(i => f"p$i%02d").mkString(" ")
    def u(doc: Int, n: Int, from: Int = 0) =
      (from until from + n).map(i => s"u$doc-$i").mkString(" ")
    val dir = plantDocs(Seq(
      1L -> s"$p ${u(1, 10)}",           // P at offset 0
      2L -> s"${u(2, 5)} $p ${u(2, 5, 5)}", // P at offset 5
      3L -> s"${u(3, 10)} $p"))          // P at offset 10
    val got = runs(dir)
    assert(got === Seq(
      (1L, 0L, 19L, 20L, 8L, 1L),
      (2L, 5L, 24L, 20L, 8L, 1L),
      (3L, 10L, 29L, 20L, 8L, 1L)))
  }

  test("x298 interval-union merge: touching runs merge, gapped runs split") {
    // G1 and G2 are 13-token grams. Doc 6 holds them ADJACENT (the two
    // flagged starts are 0 and 13 — gap exactly K — and the 12 boundary-
    // spanning windows are unique to doc 6, so the interval union must
    // still merge the touching coverage into ONE 26-token run). Doc 7
    // holds them far apart in reverse order → two separate runs.
    val g1 = (1 to 13).map(i => f"a$i%02d").mkString(" ")
    val g2 = (1 to 13).map(i => f"b$i%02d").mkString(" ")
    val gap = (1 to 14).map(i => s"z7-$i").mkString(" ")
    val dir = plantDocs(Seq(6L -> s"$g1 $g2", 7L -> s"$g2 $gap $g1"))
    val got = runs(dir)
    assert(got === Seq(
      (6L, 0L, 25L, 26L, 2L, 6L),   // merged: starts 0 and 13, gap == K
      (7L, 0L, 12L, 13L, 1L, 6L),   // G2 alone
      (7L, 27L, 39L, 13L, 1L, 6L))) // G1 alone, 14-token gap > K splits
  }

  test("x298 flags self-repetition within one doc and ignores unique text") {
    // doc 8 repeats a 13-gram twice within itself (starts 0 and 20, gap
    // 20 > 13 → two runs, both rep_doc 8); doc 9 is all-unique → no rows
    val g = (1 to 13).map(i => f"r$i%02d").mkString(" ")
    val mid = (1 to 7).map(i => s"m8-$i").mkString(" ")
    val dir = plantDocs(Seq(
      8L -> s"$g $mid $g",
      9L -> (1 to 30).map(i => s"q9-$i").mkString(" ")))
    val got = runs(dir)
    assert(got === Seq(
      (8L, 0L, 12L, 13L, 1L, 8L),
      (8L, 20L, 32L, 13L, 1L, 8L)))
  }

  test("x298 is deterministic and linear-shaped on the smoke corpus") {
    val a = runs(sfSmoke)
    val b = runs(sfSmoke)
    assert(a === b)
    // structural invariants on real data: 0-based starts, end = start +
    // n_tokens - 1, window count == n_tokens - 12 for a contiguous run of
    // fully-covered tokens is NOT an identity (runs may have interior
    // flagged starts), but bounds hold: 1 <= n_windows <= n_tokens - 12
    assert(a.forall { case (_, s, e, nt, nw, rep) =>
      s >= 0 && e == s + nt - 1 && nt >= 13 && nw >= 1 && nw <= nt - 12 &&
        rep >= 0
    })
  }

  test("x287 pair-domain guard fails loudly past 10^6 and passes below it") {
    val ok = Seq((1L, 2L), (999999L, 3L)).toDF("pa", "pb")
    assert(graft.queries.Graphs.guardPairDomain(ok).count() === 2)
    val bad = Seq((1L, 2L), (1000000L, 3L)).toDF("pa", "pb")
    val e = intercept[Exception] {
      graft.queries.Graphs.guardPairDomain(bad).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packed pair key")), s"got: $e")
  }

  test("x299 DSIR scores equal a full JVM replay of the two smoothed LMs") {
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def tk(t: String) = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val tf = docs.flatMap { case (id, lang, src, t) =>
      tk(t).groupBy(identity).map { case (w, xs) =>
        ((id, lang, src, w), xs.length.toLong) } }.toMap
    val cRaw = tf.groupBy(_._1._4).map { case (w, xs) => w -> xs.values.sum }
    val cTgt = tf.filter(_._1._2 == "en")
      .groupBy(_._1._4).map { case (w, xs) => w -> xs.values.sum }
    val (nRaw, nTgt, v) = (cRaw.values.sum, cTgt.values.sum, cRaw.size.toLong)
    val lam = cRaw.keys.map { w =>
      val num = (cTgt.getOrElse(w, 0L) + 1) * (nRaw + v)
      val den = (cRaw(w) + 1) * (nTgt + v)
      // Spark's round(x, 0) is BigDecimal HALF_UP — replay it exactly
      w -> BigDecimal(math.log(num.toDouble / den.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
    val perDoc = tf.groupBy { case ((id, _, src, _), _) => (id, src) }
      .map { case ((id, src), xs) =>
        (id, src) -> xs.map { case ((_, _, _, w), c) => c * lam(w) }.sum }
    val want = perDoc.groupBy(_._1._2).map { case (src, xs) =>
      val sel = xs.filter(_._2 > 0)
      src -> (xs.size.toLong, sel.size.toLong,
              sel.size.toLong * 1000000L / xs.size, sel.values.sum)
    }
    val got = graft.queries.Curation.x299(spark, sfSmoke).collect().map { r =>
      r.getAs[String]("source") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_sel"), r.getAs[Long]("sel_ppm"),
        r.getAs[Long]("sel_mass_micro"))
    }.toMap
    assert(got === want)
  }

  test("x300 chunking replays the exact stride arithmetic per doc") {
    val W = 32L; val S = 24L
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
                 r.getString(1).toLowerCase.split(" ").count(_.nonEmpty).toLong))
    val want = docs.filter(_._2 >= 1).flatMap { case (id, n) =>
      val k = 1L + (math.max(n - W, 0L) + S - 1) / S
      (0L until k).map { i =>
        val start = i * S
        val end = math.min(start + W, n) - 1
        (id, i, start, end, end - start + 1, W - (end - start + 1),
         if (i == 0) 0L else math.min(W - S, end - start + 1))
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = graft.queries.Organize.x300(spark, sfSmoke).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got === want)
    // coverage theorem: per doc, union of chunk spans is [0, n) with no gap
    got.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 <= a._4 + 1, s"gap between $a and $b")
        case _ => ()
      }
    }
  }

  test("x301 split keeps every dup group whole and flags no_leakage") {
    val dir = plantDocs(Seq(
      1L -> "alpha beta gamma", 11L -> "alpha beta gamma", // group gid=1
      2L -> "delta epsilon",    12L -> "delta epsilon",    // group gid=2
      3L -> "zeta eta",                                     // singleton gid=3
      4L -> "theta iota"))                                  // singleton gid=4
    def split(gid: Long) =
      if ((((gid % 100000000L) * 2654435761L) % 2147483647L) % 10 < 8) "train"
      else "eval"
    val wantGroups = Seq(1L, 2L, 3L, 4L).groupBy(split)
    val rows = graft.queries.Governance.x301(spark, dir).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_groups"),
         r.getAs[Boolean]("no_leakage"))).toMap
    assert(rows.keySet === wantGroups.keySet)
    wantGroups.foreach { case (sp, gids) =>
      val nDocs = gids.map(g => if (g <= 2) 2L else 1L).sum
      assert(rows(sp)._1 === nDocs && rows(sp)._2 === gids.size.toLong)
      assert(rows(sp)._3, "no_leakage flag must hold by construction")
    }
  }

  test("x302 weak labels equal x47's gate per source; readout is consistent") {
    // cross-key consistency theorem: x302's n_keep_label restates x47's
    // n_keep (same gate, same grain) — if either drifts, one of the two
    // keys' tokenization or gate changed without the other
    val gate = graft.queries.Curation.x47(spark, sfSmoke).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_keep")).toMap
    val rows = graft.queries.ModelOps.x302(spark, sfSmoke).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
       r.getAs[Long]("n_keep_label"), r.getAs[Long]("n_keep_pred"),
       r.getAs[Long]("agree_ppm"))
    }
    assert(rows.map(r => r._1 -> r._3).toMap === gate)
    rows.foreach { case (src, n, kl, kp, ppm) =>
      assert(n > 0 && kl >= 0 && kl <= n && kp >= 0 && kp <= n, src)
      assert(ppm >= 0 && ppm <= 1000000, s"$src agree_ppm $ppm")
    }
    // determinism: the fit + transform chain is reproducible run to run
    val again = graft.queries.ModelOps.x302(spark, sfSmoke).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("agree_ppm")) }.toMap
    assert(rows.map(r => r._1 -> r._5).toMap === again)
  }

  test("x303 flags a planted benchmark passage and counts exact hit sites") {
    // doc 0 is the benchmark slice (0 % 97 == 0); doc 1 shares exactly ONE
    // 13-gram with it (G at offset 0 in both, fillers globally unique), so
    // doc 1 is contaminated with hit_sites 1; doc 2 is clean
    val g = (1 to 13).map(i => f"c$i%02d").mkString(" ")
    def u(doc: Int, n: Int) = (0 until n).map(i => s"v$doc-$i").mkString(" ")
    val dir = plantDocs(Seq(
      0L -> s"$g ${u(0, 5)}",
      1L -> s"$g ${u(1, 5)}",
      2L -> (1 to 20).map(i => s"w2-$i").mkString(" ")))
    val rows = graft.queries.LlmExt2.x303(spark, dir).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
       r.getAs[Long]("n_contaminated"), r.getAs[Long]("contam_ppm"),
       r.getAs[Long]("hit_sites"))
    }
    assert(rows === Array(("s0", 2L, 1L, 500000L, 1L)))
  }

  test("x304 audit: zero-error control row, error monotone down in dim") {
    val rows = graft.queries.Clustering.x304(spark, sfSmoke).collect().map { r =>
      (r.getAs[Long]("dim"), r.getAs[Long]("n_pairs"),
       r.getAs[Long]("mean_abs_err_micro"), r.getAs[Long]("max_abs_err_micro"),
       r.getAs[Long]("sign_agree_ppm"))
    }
    assert(rows.map(_._1).toSeq === Seq(8L, 16L, 32L, 64L))
    assert(rows.map(_._2).distinct.length === 1, "same pair set per dim")
    val ctrl = rows.last
    assert(ctrl._3 == 0L && ctrl._4 == 0L && ctrl._5 == 1000000L,
      "d = 64 must be the zero-error control")
    // coarser truncation cannot be more faithful on the same pair set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"mean err must not rise with dim: $a vs $b")
    }
  }

  test("x305 LOSO subtraction IS refitting: control and one ablation equal direct fits") {
    import graft.queries.ModelOps
    val (_, _, rb) = ModelOps.losoCore(spark, sfSmoke)
    def rules(lo: String): Set[(Long, Long, Long, Double)] =
      rb.filter(col("lo") === lo)
        .collect().map(r => (r.getAs[Int]("ra1").toLong,
          r.getAs[Int]("ra2").toLong, r.getAs[Int]("rcls").toLong,
          r.getAs[Double]("rw"))).toSet
    def directFit(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
      new graft.engine.chi.ChiCSClassifier()
        .setFeatureCols(Array("x1", "x2")).setLabelCol("label")
        .setFeatureRanges(Array(10.0, 100.0, 0.0, 100.0))
        .setClassCosts(Array(1.0, 1.0)) // cost-free base Chi, x305's choice
        .fit(df).rules
        .map(r => (r.antecedent(0).toLong, r.antecedent(1).toLong,
                   r.cls.toLong, r.weight)).toSet
    val feats = ModelOps.qualityFeatures(spark, sfSmoke)
    assert(rules("(full)") === directFit(feats),
      "the '(full)' control must equal a direct cost-free fit")
    val someSrc = feats.select("source").distinct().orderBy("source")
      .limit(1).collect().head.getString(0)
    assert(rules(someSrc) === directFit(feats.filter(col("source") =!= someSrc)),
      s"LOSO($someSrc) via subtraction must equal the direct refit without it")
  }

  test("x305 readout: control row has zero changes and valid ppm bounds") {
    val rows = graft.queries.ModelOps.x305(spark, sfSmoke).collect().map { r =>
      (r.getAs[String]("left_out"), r.getAs[Long]("n_rules"),
       r.getAs[Long]("rules_changed"), r.getAs[Long]("n_docs"),
       r.getAs[Long]("agree_ppm"))
    }
    val ctrl = rows.find(_._1 == "(full)").get
    assert(ctrl._3 === 0L, "the control subtracts nothing, so nothing changes")
    assert(rows.forall(r => r._4 > 0 && r._5 >= 0 && r._5 <= 1000000))
    assert(rows.map(_._1).toSet.size === rows.length, "one row per model")
  }

  test("x307 orderings replay exactly in the JVM; sorted beats arrival here") {
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase))
      .map { case (id, t) => (id, t, t.split(" ").filter(_.nonEmpty).toSeq) }
      .filter(_._3.nonEmpty)
    def lcp(a: Seq[String], b: Seq[String]): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    def replay(sorted: Seq[(Long, String, Seq[String])]): (Long, Long, Long) = {
      val pairs = sorted.sliding(2).collect { case Seq(p, c) => (p._3, c._3) }.toSeq
      val shared = pairs.map { case (p, c) => lcp(p, c) }.sum
      val nt = pairs.map(_._2.size.toLong).sum
      (pairs.size.toLong, shared, shared * 1000000L / nt)
    }
    val want = Map(
      "arrival" -> replay(docs.sortBy(_._1).toSeq),
      "sorted" -> replay(docs.sortBy(d => (d._2, d._1)).toSeq))
    val got = graft.queries.Organize.x307(spark, sfSmoke).collect().map { r =>
      r.getAs[String]("ordering") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("shared_tokens"),
         r.getAs[Long]("hit_ppm"))
    }.toMap
    assert(got === want)
    // not a theorem, but the property the operator exists to expose: on a
    // corpus with exact duplicates, lexicographic adjacency finds them
    assert(got("sorted")._2 >= got("arrival")._2)
  }

  test("bench env probe samples loadavg/busy/self/steal with sane bounds") {
    BenchEnvProbe.prime()
    // burn a little CPU so the self share is measurable
    var x = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < 50000000L) { x += 1 }
    assert(x > 0)
    BenchEnvProbe.sample(0)
    val s = BenchEnvProbe.samples
    assert(s.nonEmpty, "expected at least one env sample on Linux /proc")
    val last = s.last
    assert(last.load1 >= 0 && last.busyPct >= 0 && last.busyPct <= 100.001)
    assert(last.selfPct >= 0 && last.stealPct >= 0 && last.otherPct >= 0)
    // other = busy − self by construction (clamped at 0)
    assert(last.otherPct <= last.busyPct + 0.001)
    assert(BenchEnvProbe.summaryJson.contains("other_cpu_pct_max"))
  }
}
