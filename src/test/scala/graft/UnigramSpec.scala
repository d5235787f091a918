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

  /** The DP: best[i] = max over pieces ending at i; ties → longer piece. */
  private def viterbi(tok: String, inv: Inv): (BigInt, Seq[String]) = {
    val triM = inv.tri.toMap
    val biM = inv.bi.toMap
    val best = Array.fill[Option[(BigInt, List[String])]](tok.length + 1)(None)
    best(0) = Some((BigInt(1), Nil))
    for (i <- 1 to tok.length) {
      val cands = Seq(
        (3, if (i >= 3) triM.get(tok.substring(i - 3, i)) else None),
        (2, if (i >= 2) biM.get(tok.substring(i - 2, i)) else None),
        (1, inv.ch.get(tok.substring(i - 1, i)))
      ).collect { case (len, Some(u)) if best(i - len).isDefined =>
        val (pv, pps) = best(i - len).get
        (pv * w(u, len), pps :+ tok.substring(i - len, i))
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
}
