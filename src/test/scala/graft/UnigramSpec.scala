package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x262: the unigram-LM Viterbi scorer equals an independent JVM replay of
  * the exact-integer DP, satisfies the Viterbi optimality theorem against
  * the x256 greedy MaxMatch and the all-single-char baselines, and BEATS
  * greedy on a planted corpus where MaxMatch's longest-prefix commitment is
  * provably suboptimal. */
class UnigramSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import spark.implicits._

  private case class Inv(tri: Seq[(String, Long)], bi: Seq[(String, Long)],
                         ch: Map[String, Long])

  /** Replays the engine's inventory derivation (same order/limit/caps). */
  private def inventory(toks: Seq[(String, Long)]): Inv = {
    def grams(n: Int, k: Int): Seq[(String, Long)] = toks
      .flatMap { case (t, tf) =>
        (0 to math.min(t.length - n, 31)).map(i => (t.substring(i, i + n), tf))
      }
      .groupBy(_._1).map { case (g, xs) => (g, xs.map(_._2).sum) }.toSeq
      .sortBy { case (g, w) => (-w, g) }.take(k)
    val ch = toks.flatMap { case (t, tf) => t.take(32).map(c => (c.toString, tf)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
    Inv(grams(3, 20), grams(2, 30), ch)
  }

  private def w(usage: Long, len: Int): BigInt =
    BigInt(graft.queries.Mining.x262Weight(usage, len))

  /** The DP under explicit FINAL weights (already scaled): best[i] = max
    * over pieces ending at i; ties → longer piece. */
  private def viterbiW(tok: String, ch: Map[String, BigInt],
                       bi: Map[String, BigInt], tri: Map[String, BigInt])
      : (BigInt, Seq[String]) = {
    val best = Array.fill[Option[(BigInt, List[String])]](tok.length + 1)(None)
    best(0) = Some((BigInt(1), Nil))
    for (i <- 1 to tok.length) {
      val cands = Seq(
        (3, if (i >= 3) tri.get(tok.substring(i - 3, i)) else None),
        (2, if (i >= 2) bi.get(tok.substring(i - 2, i)) else None),
        (1, ch.get(tok.substring(i - 1, i)))
      ).collect { case (len, Some(wq)) if best(i - len).isDefined =>
        val (pv, pps) = best(i - len).get
        (pv * wq, pps :+ tok.substring(i - len, i))
      }
      // longer piece listed first; strict > keeps the earlier on ties
      if (cands.nonEmpty) {
        var bv = cands.head
        for (c <- cands.tail) if (c._1 > bv._1) bv = c
        best(i) = Some(bv)
      }
    }
    val (v, ps) = best(tok.length).get
    (v, ps)
  }

  /** Round-0 weight maps (raw gram mass through the quantizer). */
  private def w0Maps(inv: Inv): (Map[String, BigInt], Map[String, BigInt],
                                 Map[String, BigInt]) =
    (inv.ch.map { case (g, u) => g -> w(u, 1) },
     inv.bi.toMap.map { case (g, u) => g -> w(u, 2) },
     inv.tri.toMap.map { case (g, u) => g -> w(u, 3) })

  private def viterbi(tok: String, inv: Inv): (BigInt, Seq[String]) = {
    val (ch, bi, tri) = w0Maps(inv)
    viterbiW(tok, ch, bi, tri)
  }

  /** JVM replay of x282's full hard-EM round. Returns (u0, u1, seg0, seg1,
    * round-1 weight maps). */
  private def emReplay(toks: Seq[(String, Long)])
      : (Map[String, Long], Map[String, Long], Map[String, Seq[String]],
         Map[String, Seq[String]],
         (Map[String, BigInt], Map[String, BigInt], Map[String, BigInt])) = {
    val inv = inventory(toks)
    val (ch0, bi0, tri0) = w0Maps(inv)
    val short = toks.filter(_._1.length <= 8)
    val seg0 = short.map { case (t, tf) =>
      (t, tf, viterbiW(t, ch0, bi0, tri0)._2) }
    def usage(segs: Seq[(String, Long, Seq[String])]): Map[String, Long] =
      segs.flatMap { case (_, tf, ps) => ps.map(_ -> tf) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val u0 = usage(seg0)
    def rew(g: String, len: Int): BigInt = w(u0.getOrElse(g, 0L) + 1L, len)
    val w1 = (inv.ch.map { case (g, _) => g -> rew(g, 1) },
              inv.bi.toMap.map { case (g, _) => g -> rew(g, 2) },
              inv.tri.toMap.map { case (g, _) => g -> rew(g, 3) })
    val seg1 = short.map { case (t, tf) =>
      (t, tf, viterbiW(t, w1._1, w1._2, w1._3)._2) }
    (u0, usage(seg1),
     seg0.map(s => s._1 -> s._3).toMap, seg1.map(s => s._1 -> s._3).toMap, w1)
  }

  /** JVM replay of x283's prune round on top of [[emReplay]]: drop
    * multi-char pieces with round-1 usage < 2, re-weight survivors from
    * round-1 usage, re-segment. Returns (u1, u2, seg2). */
  private def pruneReplay(toks: Seq[(String, Long)])
      : (Map[String, Long], Map[String, Long], Map[String, Seq[String]]) = {
    val inv = inventory(toks)
    val (_, u1, _, _, _) = emReplay(toks)
    def rew(g: String, len: Int): BigInt = w(u1.getOrElse(g, 0L) + 1L, len)
    val ch2 = inv.ch.map { case (g, _) => g -> rew(g, 1) }
    val bi2 = inv.bi.collect {
      case (g, _) if u1.getOrElse(g, 0L) >= 2L => g -> rew(g, 2) }.toMap
    val tri2 = inv.tri.collect {
      case (g, _) if u1.getOrElse(g, 0L) >= 2L => g -> rew(g, 3) }.toMap
    val short = toks.filter(_._1.length <= 8)
    val seg2 = short.map { case (t, tf) => (t, tf, viterbiW(t, ch2, bi2, tri2)._2) }
    val u2 = seg2.flatMap { case (_, tf, ps) => ps.map(_ -> tf) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    (u1, u2, seg2.map(s => s._1 -> s._3).toMap)
  }

  /** x256's greedy MaxMatch, scored under the same weights. */
  private def greedyScore(tok: String, inv: Inv): BigInt = {
    val triS = inv.tri.map(_._1).toSet
    val biS = inv.bi.map(_._1).toSet
    val triM = inv.tri.toMap
    val biM = inv.bi.toMap
    var pos = 0
    var v = BigInt(1)
    while (pos < tok.length) {
      if (pos + 3 <= tok.length && triS(tok.substring(pos, pos + 3))) {
        v *= w(triM(tok.substring(pos, pos + 3)), 3); pos += 3
      } else if (pos + 2 <= tok.length && biS(tok.substring(pos, pos + 2))) {
        v *= w(biM(tok.substring(pos, pos + 2)), 2); pos += 2
      } else {
        v *= w(inv.ch(tok.substring(pos, pos + 1)), 1); pos += 1
      }
    }
    v
  }

  private def corpusToks(dir: String): Seq[(String, Long)] =
    graft.engine.Tables.documents(spark, dir).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }.toSeq

  test("x262 segments equal the independent JVM DP replay at sf0.001") {
    val toks = corpusToks(sfSmoke)
    val inv = inventory(toks)
    val want = toks.filter(_._1.length <= 8).map { case (t, tf) =>
      val (v, ps) = viterbi(t, inv)
      (t, tf, v, ps)
    }.sortBy(_._1)
    val got = graft.queries.Mining.x262Segments(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1),
                 BigInt(r.getDecimal(2).toBigInteger), r.getSeq[String](3).toList))
      .sortBy(_._1).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("Viterbi optimality: >= greedy MaxMatch and >= all-single-chars, per token") {
    val toks = corpusToks(sfSmoke)
    val inv = inventory(toks)
    for ((t, _) <- toks if t.length <= 8) {
      val (v, _) = viterbi(t, inv)
      assert(v >= greedyScore(t, inv),
             s"Viterbi must dominate greedy on '$t'")
      val single = t.map(c => w(inv.ch(c.toString), 1)).product
      assert(v >= single, s"Viterbi must dominate the char baseline on '$t'")
    }
  }

  test("planted corpus: Viterbi beats greedy's longest-prefix commitment") {
    // 50× "ab", 50× "cd", 1× "abcd": greedy on "abcd" takes tri 'abc' then
    // 'd' (score 1·10⁸ · 51 = 51·10⁸); Viterbi takes 'ab'+'cd'
    // (51·10⁴ · 51·10⁴ = 2601·10⁸) — the quantized-likelihood argmax
    // splits where MaxMatch commits.
    val tmp = java.nio.file.Files.createTempDirectory("x262corpus").toString
    val text = (Seq.fill(50)("ab") ++ Seq.fill(50)("cd") :+ "abcd").mkString(" ")
    Seq((1L, text, "en", "planted", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val seg = graft.queries.Mining.x262Segments(spark, tmp).collect()
      .map(r => r.getString(0) ->
        (BigInt(r.getDecimal(2).toBigInteger), r.getSeq[String](3).toList))
      .toMap
    assert(seg("abcd")._2 === List("ab", "cd"))
    assert(seg("abcd")._1 === BigInt("260100000000"))
    val toks = corpusToks(tmp)
    assert(greedyScore("abcd", inventory(toks)) === BigInt(51L) * BigInt(10).pow(8))
    // and the registered key aggregates the planted split
    val usage = graft.queries.Mining.x262(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(usage("ab") === 51L && usage("cd") === 51L && !usage.contains("abc"))
  }

  test("x262 output equals the replay aggregate at sf0.001") {
    val toks = corpusToks(sfSmoke)
    val inv = inventory(toks)
    val want = toks.filter(_._1.length <= 8)
      .flatMap { case (t, tf) => viterbi(t, inv)._2.map(p => (p, tf)) }
      .groupBy(_._1).map { case (p, xs) => (p, p.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy { case (p, _, u) => (-u, p) }.take(30)
    val got = graft.queries.Mining.x262(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("x282 output equals the full JVM hard-EM replay at sf0.001") {
    val toks = corpusToks(sfSmoke)
    val (u0, u1, _, _, _) = emReplay(toks)
    val want = u1.toSeq
      .map { case (p, n1) => (p, p.length.toLong, u0.getOrElse(p, 0L), n1) }
      .sortBy { case (p, _, _, n1) => (-n1, p) }.take(30)
    val got = graft.queries.Mining.x282(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("x282 EM monotonicity theorem: v1(seg1) >= v1(seg0), per token") {
    // add-one smoothing keeps every inventory piece usable, so seg0 stays
    // feasible under the round-1 weights and Viterbi optimality applies
    // to it directly — a per-token theorem, not a statistical claim
    val toks = corpusToks(sfSmoke)
    val (_, _, seg0, _, (ch1, bi1, tri1)) = emReplay(toks)
    def score(ps: Seq[String]): BigInt =
      ps.map(p => p.length match {
        case 1 => ch1(p); case 2 => bi1(p); case _ => tri1(p)
      }).product
    for ((t, _) <- toks if t.length <= 8) {
      val (v1, _) = viterbiW(t, ch1, bi1, tri1)
      assert(v1 >= score(seg0(t)),
        s"round-1 Viterbi must dominate the round-0 segmentation on '$t'")
    }
  }

  test("planted corpus: the EM round provably FLIPS a segmentation") {
    // 50× "abc", 1× "abcd". Round 0 (raw gram mass): on "abcd" the three
    // final candidates tie at 51·10⁸ (abc·d = ab·cd = a·bcd) and the
    // longer-ending-piece rule picks a+bcd. Round 1: d and a were barely
    // used (w₁(d)=1, w₁(a)=2), bcd was used once (w₁=2·10⁸), but abc kept
    // its 50 uses (w₁=51·10⁸) — so abc+d (51·10⁸) now beats a+bcd (4·10⁸)
    // and ab+cd (10⁸): hard EM's rich-get-richer reallocation, pinned
    // end to end through the registered key's output.
    val tmp = java.nio.file.Files.createTempDirectory("x282corpus").toString
    val text = (Seq.fill(50)("abc") :+ "abcd").mkString(" ")
    Seq((1L, text, "en", "planted", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val seg0 = graft.queries.Mining.x262Segments(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getSeq[String](3).toList).toMap
    assert(seg0("abcd") === List("a", "bcd"))
    val got = graft.queries.Mining.x282(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // round 1 re-segments "abcd" as abc+d: only abc and d carry usage
    assert(got === Seq(("abc", 3L, 50L, 51L), ("d", 1L, 0L, 1L)))
    // and the JVM replay agrees with itself on the flip
    val toks = corpusToks(tmp)
    val (_, _, s0, s1, _) = emReplay(toks)
    assert(s0("abcd") === List("a", "bcd") && s1("abcd") === List("abc", "d"))
  }

  test("x283 output equals the JVM prune-round replay at sf0.001") {
    val toks = corpusToks(sfSmoke)
    val (u1, u2, seg2) = pruneReplay(toks)
    // total-coverage theorem: single chars are never pruned, so every
    // ≤8-char token still segments after the prune
    assert(seg2.keySet === toks.filter(_._1.length <= 8).map(_._1).toSet)
    val want = u2.toSeq
      .map { case (p, n2) => (p, p.length.toLong, u1.getOrElse(p, 0L), n2) }
      .sortBy { case (p, _, _, n2) => (-n2, p) }.take(30)
    val got = graft.queries.Mining.x283(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(want.nonEmpty && got === want)
  }

  test("planted corpus: the prune round RE-ROUTES a token off a dropped piece") {
    // 50× "abc", 1× "abcd", 1× "xy". Round 1 keeps 'xy' as a whole-piece
    // segmentation (usage 1), so the prune (< 2 uses) drops the bi 'xy'
    // — and "xy" must RE-ROUTE through the char fallback x+y, while
    // "abcd" stays on abc+d (tri 'abc' survives with 51 uses). The char
    // floor keeps everything segmentable; only the rare piece's user pays.
    val tmp = java.nio.file.Files.createTempDirectory("x283corpus").toString
    val text = (Seq.fill(50)("abc") ++ Seq("abcd", "xy")).mkString(" ")
    Seq((1L, text, "en", "planted", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.Mining.x283(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // u1: abc=51, d=1, xy=1 → prune drops xy (and all unused bis/tris);
    // round 2: "abc"→abc, "abcd"→abc+d, "xy"→x+y
    assert(got === Seq(("abc", 3L, 51L, 51L), ("d", 1L, 1L, 1L),
                       ("x", 1L, 0L, 1L), ("y", 1L, 0L, 1L)))
    val (_, _, seg2) = pruneReplay(corpusToks(tmp))
    assert(seg2("xy") === List("x", "y") && seg2("abcd") === List("abc", "d"))
  }
}
