package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 second batch: x219 edit-distance join, x220 content-defined
  * chunking, x221 erasure propagation, x222 temperature mixing. Each key
  * is replayed naively in the JVM on real corpus data, and each carries
  * its theorem: band completeness (x219), self-synchronization after an
  * edit (x220), zero-residual cascade + conservation (x221), exact budget
  * + share flattening + isqrt correctness (x222). */
class Round10bSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
                         d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x219 equals a naive all-pairs Levenshtein replay (band completeness)") {
    val names = Tables.part(spark, sfSmoke).groupBy("p_name").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // the naive replay has NO length-band filter — agreeing with the
    // banded engine output proves the band never drops a qualifying pair
    val want = (for {
      (na, ca) <- names; (nb, cb) <- names if na < nb
      d = lev(na, nb) if d <= 2
    } yield (na, nb, d.toLong, ca, cb)).toSet
    val got = graft.queries.Wrangle.x219(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
  }

  /** Naive JVM CDC chunker: x13 token codes → 5-token-window Horner fps →
    * boundary at fp % 16 == 0 → per-chunk Horner fp. */
  private def naiveChunks(text: String): Seq[(Long, Long)] = {
    val M = 1000000007L
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).take(256)
    val codes = toks.map(t => (t.charAt(0).toLong * 4096 +
      (if (t.length > 1) t.charAt(1).toLong else 0L) * 64 + t.length))
    val fps = codes.sliding(5).filter(_.length == 5)
      .map(w => w.foldRight(0L)((c, acc) => (acc * 131 + c) % M)).toSeq
    if (fps.isEmpty) return Seq.empty
    val chunks = scala.collection.mutable.Buffer[Seq[Long]]()
    var cur = scala.collection.mutable.Buffer[Long]()
    for (fp <- fps) {
      cur += fp
      if (fp % 16 == 0) { chunks += cur.toSeq; cur = scala.collection.mutable.Buffer() }
    }
    if (cur.nonEmpty) chunks += cur.toSeq
    chunks.map(c => (c.length.toLong,
                     c.foldLeft(0L)((a, x) => (a * 131 + x) % M))).toSeq
  }

  test("x220 equals a naive JVM replay on real corpus data") {
    val docs = Tables.documents(spark, sfSmoke)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val rows = docs.flatMap { case (id, lang, text) =>
      naiveChunks(text).map { case (nw, fp) => (id, lang, nw, fp) } }
    val want = rows.groupBy(_._2).map { case (lang, cs) =>
      val nChunks = cs.length.toLong
      val nDistinct = cs.map(_._4).distinct.length.toLong
      (lang, cs.map(_._1).distinct.length.toLong, cs.map(_._3).sum,
       nChunks, nDistinct, cs.map(_._3).max,
       (nChunks - nDistinct) * 1000000L / nChunks)
    }.toSet
    val got = graft.queries.LlmExt2.x220(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(want.nonEmpty && got === want)
  }

  test("x220 chunk boundaries self-synchronize after a prepended token") {
    import spark.implicits._
    // B prepends one token to A: every window of B past the first equals
    // the previous window of A, so after A's first chunk the chunk-fp
    // SEQUENCES must coincide (fixed-width chunking shifts every chunk).
    val a = Tables.documents(spark, sfSmoke)
      .where(length(col("text")) > 300).select("text").collect()
      .map(_.getString(0)).find(t => naiveChunks(t).length > 2).get
    val b = "zz " + a
    val df = Seq((1L, "en", a), (2L, "en", b)).toDF("doc_id", "lang", "text")
    val out = graft.queries.LlmExt2.cdcChunks(df).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    val fpsA = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    val fpsB = out.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    assert(fpsA.length > 2, "need a doc with several chunks")
    assert(fpsA.tail === fpsB.takeRight(fpsA.length - 1),
           "chunks after the first boundary must realign on the edited twin")
  }

  test("x220 chunk widths conserve the window count per doc") {
    val windows = graft.queries.LlmExt2
      .docFingerprints(Tables.documents(spark, sfSmoke))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunked = graft.queries.LlmExt2
      .cdcChunks(Tables.documents(spark, sfSmoke))
      .groupBy("doc_id").agg(sum("n_windows")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunked === windows.filter(_._2 > 0))
  }

  test("x221 equals a naive cascade replay; residuals zero; rows conserve") {
    val cust = Tables.customer(spark, sfSmoke)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val ords = Tables.orders(spark, sfSmoke)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lis = Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val tomb = cust.collect { case (k, _) if k % 37 == 0 => k }.toSet
    val eo = ords.filter(o => tomb(o._2))
    val eoKeys = eo.map(_._1).toSet
    val el = lis.filter(l => eoKeys(l._1))
    def cents(xs: Seq[Double]) = xs.map(x => math.round(x * 100)).sum
    val want = Map(
      "customer" -> (cust.length.toLong, tomb.size.toLong,
        cents(cust.collect { case (k, b) if k % 37 == 0 => b }.toSeq)),
      "orders" -> (ords.length.toLong, eo.length.toLong, cents(eo.map(_._3).toSeq)),
      "lineitem" -> (lis.length.toLong, el.length.toLong, cents(el.map(_._2).toSeq)))
    val got = graft.queries.Governance.x221(spark, sfSmoke).collect()
    assert(got.length === 3)
    got.foreach { r =>
      val (nb, ne, c) = want(r.getString(0))
      assert(r.getLong(1) === nb && r.getLong(2) === ne)
      assert(r.getLong(3) === nb - ne, "rows_after must conserve")
      assert(r.getLong(4) === c, s"${r.getString(0)} cents receipt")
      assert(r.getLong(5) === 0L && r.getBoolean(6),
             s"${r.getString(0)} must leave zero residual")
    }
  }

  test("x222 equals a naive Hamilton replay; budget exact; tempering flattens") {
    val docs = Tables.documents(spark, sfSmoke)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
                 r.getString(1).toLowerCase.split(" ").count(_.nonEmpty).toLong))
    val mass = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    def isqrt(m: Long): Long = {
      val s = math.sqrt(m.toDouble).toLong
      if ((s + 1) * (s + 1) <= m) s + 1 else if (s * s > m) s - 1 else s
    }
    val wts = mass.map { case (s, m) => (s, m, isqrt(m)) }.toSeq.sortBy(_._1)
    val tw = wts.map(_._3).sum
    val B = 1000000L
    val base = wts.map { case (s, m, w) => (s, m, w, w * B / tw, (w * B) % tw) }
    val leftover = B - base.map(_._4).sum
    val bump = base.sortBy { case (s, _, _, _, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    val want = base.map { case (s, m, w, b, _) =>
      (s, m, w, b, b + (if (bump(s)) 1L else 0L)) }.toSet
    val got = graft.queries.Curation.x222(spark, sfSmoke).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                         r.getLong(3), r.getLong(4))).toSet === want)
    assert(got.map(_.getLong(4)).sum === B, "Hamilton: allocation sums to B")
    got.foreach(r => assert(r.getBoolean(5) && r.getBoolean(6)))
    // isqrt correctness on every mass: wt^2 <= m < (wt+1)^2
    got.foreach { r =>
      val (m, w) = (r.getLong(1), r.getLong(2))
      assert(w * w <= m && m < (w + 1) * (w + 1), s"isqrt($m) != $w")
    }
    // the flatten theorem holds numerically, not just as a flag
    val tm = got.map(_.getLong(1)).sum
    val twG = got.map(_.getLong(2)).sum
    assert(got.map(_.getLong(2)).max * tm <= got.map(_.getLong(1)).max * twG)
  }

  test("x223 equals a naive quantized-LSH replay on the real embeddings") {
    import graft.queries.LlmExt2
    val signs = LlmExt2.qlshSigns
    val vecs = Tables.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
                 r.getSeq[Float](1).map(e => math.floor(e.toDouble * 1024).toLong)))
    val sigs = vecs.map { case (id, q) =>
      val bits = signs.zipWithIndex.map { case (s, p) =>
        val d = q.zipWithIndex.map { case (x, i0) => x * s(i0) }.sum
        if (d > 0) 1L << p else 0L
      }.sum
      (id, bits, q.map(x => x * x).sum)
    }
    val byBand = (for ((id, sig, nrm) <- sigs; band <- 0 to 1)
      yield ((band, if (band == 0) sig % 256 else sig / 256), id)).groupBy(_._1)
    val cand = byBand.values.flatMap { xs =>
      val ids = xs.map(_._2).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j))
    }.toSet
    val qmap = vecs.toMap
    val nrm = sigs.map(s => s._1 -> s._3).toMap
    val want = cand.toSeq.map { case (a, b) =>
      val qdot = qmap(a).zip(qmap(b)).map { case (x, y) => x * y }.sum
      (a, b, qdot, nrm(a), nrm(b))
    }.filter { case (_, _, d, na, nb) => d > 0 && 400 * d * d >= 49 * na * nb }
      .toSet
    val got = LlmExt2.x223(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(want.nonEmpty && got === want)
    // every reported pair satisfies the exact integer cosine bound
    got.foreach { case (_, _, d, na, nb) =>
      assert(d > 0 && 400 * d * d >= 49 * na * nb)
    }
  }

  test("x224 equals a naive replay; planted exact dup scores 1.0; disjoint docs never pair") {
    import spark.implicits._
    import graft.queries.LlmExt2
    // naive replay on the real corpus via the engine's own distinct-fp
    // view (already equivalence-tested against the HOF formulation)
    val fps = LlmExt2.docFingerprints(
        Tables.documents(spark, sfSmoke)).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val df = fps.groupBy(_._2).map { case (fp, xs) => fp -> xs.length }
    val kept = fps.filter { case (_, fp) => df(fp) <= 64 }
    val sizes = kept.groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
    val byFp = kept.groupBy(_._2).values
    val ix = scala.collection.mutable.Map[(Long, Long), Long]()
    for (xs <- byFp; a <- xs.map(_._1); b <- xs.map(_._1) if a < b)
      ix((a, b)) = ix.getOrElse((a, b), 0L) + 1L
    val want = ix.toSeq.collect {
      case ((a, b), i) if 2 * i >= sizes(a) + sizes(b) - i =>
        (a, b, i, sizes(a), sizes(b), i * 1000000L / (sizes(a) + sizes(b) - i))
    }.toSet
    val got = LlmExt2.x224(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSet
    assert(want.nonEmpty && got === want)
    // planted corpus: an exact duplicate pair and a disjoint doc
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c = "one two three four five six seven eight nine ten"
    val planted = Seq((1L, "en", a), (2L, "en", a), (3L, "en", c))
      .toDF("doc_id", "lang", "text")
    val pairs = LlmExt2.jaccardPortable(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(pairs.toSeq === Seq((1L, 2L, 1000000L)),
           "exact dup must score 1.0 ppm-exact; the disjoint doc must not pair")
  }

  test("x225 equals a naive JVM BPE replay; winner counts are monotone") {
    val toks0 = Tables.documents(spark, sfSmoke).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ").filter(_.nonEmpty))
    // Token-length contract (ADVICE r10): both the engine's symbol scan
    // and the oracle's generate_series cap positions at 64; assert the
    // corpus actually stays far under that bound so the cap is provably
    // inactive (the replay below is uncapped, so a violation would also
    // surface as a value mismatch).
    assert(toks0.map(_.length).max <= 64,
           "x225 corpus token length must stay within the shared 64-position cap")
    var toks = toks0.toSeq
    val want = (0 until 4).map { k =>
      val counts = scala.collection.mutable.Map[String, Long]()
      for (t <- toks; i <- 0 until math.min(t.length - 1, 32))
        counts(t.substring(i, i + 2)) = counts.getOrElse(t.substring(i, i + 2), 0L) + 1
      val (bp, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      val ph = (0x100 + k).toChar.toString
      toks = toks.map(_.replace(bp, ph))
      (k + 1L, bp, cnt, toks.flatMap(_.toSeq).distinct.length.toLong)
    }
    val got = graft.queries.Mining.x225(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want)
    // each round's merge removes occurrences and the new symbol's count is
    // bounded by the merges performed, so winner counts never increase
    assert(got.map(_._3).toSeq === got.map(_._3).sortBy(-_).toSeq,
           "BPE winner counts must be monotone nonincreasing")
  }

  test("x226 equals a naive aHash replay; planted duplicate payloads collide") {
    import spark.implicits._
    import graft.queries.MultimodalOps
    val docs = Tables.documents(spark, sfSmoke).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val (hi, lo) = MultimodalOps.ahash(text.getBytes("UTF-8"))
      (id, hi, lo)
    }.groupBy(x => (x._2, x._3)).map { case ((hi, lo), xs) =>
      (hi, lo, xs.map(_._1).min, xs.length.toLong)
    }.toSet
    val got = MultimodalOps.x226(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(want.nonEmpty && got === want)
    // planted media dir: two identical payloads + one distinct, driven
    // through the REGISTERED operator via its real media.parquet path
    val tmp = java.nio.file.Files.createTempDirectory("x226media").toString
    val payloadA = Array.tabulate(200)(i => ((i * 37 + 11) % 251).toByte)
    val payloadB = Array.tabulate(180)(i => ((i * 53 + 7) % 241).toByte)
    Seq((10L, "png", payloadA.length.toLong, payloadA),
        (11L, "png", payloadA.length.toLong, payloadA),
        (12L, "png", payloadB.length.toLong, payloadB))
      .toDF("doc_id", "format", "n_bytes", "content")
      .write.mode("overwrite").parquet(s"$tmp/media.parquet")
    val groups = MultimodalOps.x226(spark, tmp).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(groups.toSeq.sorted === Seq((10L, 2L), (12L, 1L)),
           "identical payloads must share an aHash group; distinct must not")
  }

  test("x227 equals a naive index replay; verbatim re-ingest flags dup; fresh text does not") {
    import spark.implicits._
    import graft.queries.LlmExt2
    val fps = LlmExt2.docFingerprints(Tables.documents(spark, sfSmoke))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val idx = fps.collect { case (d, fp) if d % 2 == 0 => fp }.toSet
    val newDocs = fps.filter(_._1 % 2 == 1).groupBy(_._1)
    val want = newDocs.map { case (d, xs) =>
      val nWin = xs.length.toLong
      val nHit = xs.count(x => idx(x._2)).toLong
      (d, nWin, nHit, nHit * 1000000L / nWin, 2 * nHit >= nWin)
    }.toSet
    val got = LlmExt2.x227(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getBoolean(4))).toSet
    assert(want.nonEmpty && got === want)
    // planted: old corpus doc (even id), its verbatim re-ingest (odd id),
    // and a fresh odd doc sharing nothing
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fresh = "one two three four five six seven eight nine ten"
    val planted = Seq((2L, "en", corpusText), (3L, "en", corpusText),
                      (5L, "en", fresh)).toDF("doc_id", "lang", "text")
    val out = LlmExt2.dedupIncremental(planted).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSeq
    assert(out === Seq((3L, 1000000L, true), (5L, 0L, false)),
           "verbatim re-ingest must flag is_dup at 1.0; fresh text must not")
  }

  test("x228 equals a naive banded-Hamming replay; identical payloads are distance-0 neighbors") {
    import spark.implicits._
    import graft.queries.MultimodalOps
    val hashes = Tables.documents(spark, sfSmoke).select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), MultimodalOps.ahash(r.getString(1).getBytes("UTF-8"))))
    def bytes(hi: Long, lo: Long): Seq[Long] =
      (0 until 4).map(j => (lo >> (8 * j)) & 255) ++
        (0 until 4).map(j => (hi >> (8 * j)) & 255)
    val byBand = (for (((d, (hi, lo))) <- hashes; (bv, b) <- bytes(hi, lo).zipWithIndex)
      yield ((b, bv), (d, hi, lo))).groupBy(_._1)
    val candOf = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    for (xs <- byBand.values; (a, ahi, alo) <- xs.map(_._2); (n, nhi, nlo) <- xs.map(_._2)
         if a != n)
      candOf(a) = candOf.getOrElse(a, Set.empty) + ((n, nhi, nlo))
    val hmap = hashes.toMap
    val want = candOf.map { case (a, cs) =>
      val (ahi, alo) = hmap(a)
      val best = cs.map { case (n, nhi, nlo) =>
        (java.lang.Long.bitCount(ahi ^ nhi) + java.lang.Long.bitCount(alo ^ nlo)
          .toLong, n)
      }.minBy { case (d, n) => (d, n) }
      (a, best._2, best._1.toLong)
    }.toSet
    val got = MultimodalOps.x228(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got === want)
    // identical payloads (the x226 planted dir shape) must be each
    // other's distance-0 neighbors
    val tmp = java.nio.file.Files.createTempDirectory("x228media").toString
    val payloadA = Array.tabulate(200)(i => ((i * 37 + 11) % 251).toByte)
    val payloadB = Array.tabulate(180)(i => ((i * 53 + 7) % 241).toByte)
    Seq((10L, "png", payloadA.length.toLong, payloadA),
        (11L, "png", payloadA.length.toLong, payloadA),
        (12L, "png", payloadB.length.toLong, payloadB))
      .toDF("doc_id", "format", "n_bytes", "content")
      .write.mode("overwrite").parquet(s"$tmp/media.parquet")
    val full = MultimodalOps.x228(spark, tmp).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(full(10L) === ((11L, 0L)) && full(11L) === ((10L, 0L)),
           "identical payloads must be mutual distance-0 nearest neighbors")
  }
}
