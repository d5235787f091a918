package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.{Extras, LlmExt, LlmExt2, MultimodalOps}

/** Property tests for the hash-based / non-oracle LLM-pipeline operators.
  * Uses sf0.1 where the planted exact-duplicate groups exist (FIXTURES.md §2:
  * 8 dup groups at sf0.1, none below). */
class LlmExtSpec extends AnyFunSuite {
  import TestSpark.spark
  private val sfBig = "/root/testdata/sf0.1"

  /** The ground-truth exact-duplicate pairs from q44 (lower(text) groups). */
  private lazy val exactDupPairs: Set[(Long, Long)] = {
    val groups = graft.engine.Tables.documents(spark, sfBig)
      .groupBy(lower(col("text")).as("norm"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .collect().map(_.getSeq[Long](1).sorted)
    groups.flatMap(ids => for (a <- ids; b <- ids if a < b) yield (a, b)).toSet
  }

  test("ground truth: sf0.1 has exact-duplicate documents") {
    assert(exactDupPairs.nonEmpty)
  }

  test("x01 exact pair set contains every exact-duplicate pair at distance 0, " +
       "and the MinHash contract flag holds") {
    val rows = Extras.x01(spark, sfBig).collect()
    val found = rows.filter(_.getLong(2) == 0L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDupPairs.subsetOf(found),
      s"missing: ${exactDupPairs -- found}")
    // lsh_ok = the engine-verified 3-band soundness + exact-dup
    // completeness theorems — must hold on real corpus data
    assert(rows.forall(_.getBoolean(3)), "lsh_ok must hold by construction")
  }

  test("x07 SimHash: exact duplicates share a fingerprint group") {
    val all = LlmExt2.x07(spark, sfBig).collect()
    val groups = all.filter(_.getLong(1) > 1)
    assert(groups.nonEmpty, "the 8 dup groups must collide in SimHash space")
    // every multiset group with >1 doc covers at least the q44 dup docs
    val nDupDocs = exactDupPairs.flatMap(p => Set(p._1, p._2)).size
    assert(groups.map(_.getLong(1)).sum >= nDupDocs)
    // the engine-verified SimHash contract: one fingerprint per multiset
    // group, and fingerprints separate distinct multisets on this corpus
    assert(all.forall(_.getBoolean(2)), "simhash_ok must hold")
  }

  test("x08 n-gram Jaccard: exact duplicates found with jaccard = 1.0") {
    val pairs = LlmExt2.x08(spark, sfBig)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val perfect = pairs.filter(_._3 == 1000000L).map(p => (p._1, p._2)).toSet
    assert(exactDupPairs.subsetOf(perfect), s"missing: ${exactDupPairs -- perfect}")
    // 4-band soundness + completeness + 3⊆4 nesting, engine-verified
    assert(pairs.forall(_._4), "lsh_ok must hold by construction")
  }

  test("x09 banded hyperplane LSH finds every planted near-duplicate") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emb = graft.engine.Tables.embeddings(spark, TestSpark.sfSmoke)
      .select(col("vec_id"), col("embedding"))
    // plant: copies of vec_id 0..9 with one component nudged (cos ≈ 0.9999+)
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"),
              expr("transform(embedding, (x, i) -> IF(i = 0, x + 0.001F, x))")
                .as("embedding"))
    val all = emb.unionByName(planted)
    val found = LlmExt2.nearDupPairs(all, 990000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).map(i => (i, i + 100000)).toSet
    assert(expected.subsetOf(found), s"missing planted pairs: ${expected -- found}")
    // and the confirm stage is exact: nothing below the threshold slips in
    val sims = LlmExt2.nearDupPairs(all, 990000L).collect().map(_.getLong(2))
    assert(sims.forall(_ >= 990000L))
  }

  test("x10 lang-id heuristic beats chance on the synthetic corpus") {
    val cm = LlmExt2.x10(spark, sfBig).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = cm.map(_._3).sum
    val correct = cm.filter(r => r._1 == r._2).map(_._3).sum
    assert(total > 0 && correct * 5 > total,
      s"accuracy ${correct.toDouble / total} should beat the 1/5 chance rate")
  }

  test("corpus is ASCII at every scale factor (x14/x26 oracle precondition)") {
    // the x14/x26 DuckDB oracles index CHARS while the Spark stub hashes
    // BYTES — equivalent only while the corpus is pure ASCII. A data refresh
    // that introduces multi-byte text must fail HERE, not as a silent
    // driver-side hash mismatch. (Pattern: ADVICE r2's session-gap guard.)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/documents.parquet").exists) {
        val nonAscii = graft.engine.Tables.documents(spark, dir)
          .filter(octet_length(col("text")) =!= length(col("text")))
          .count()
        assert(nonAscii === 0, s"$sf has $nonAscii non-ASCII documents — " +
          "retire or re-derive the x14/x26 oracles before trusting them")
      }
    }
  }

  test("x14 multimodal: schema, batch shape, and deterministic stub features") {
    val media = MultimodalOps.mediaTable(spark, TestSpark.sfSmoke)
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(schema("format").dataType.typeName === "string")
    val feats = MultimodalOps.extractFeatures(media)
    val row = feats.orderBy("doc_id").head()
    assert(row.feature.length === 16)
    assert(math.abs(row.feature.sum - 1.0) < 1e-9, "histogram must be normalized")
    // deterministic: two runs agree exactly
    val a = MultimodalOps.x14(spark, TestSpark.sfSmoke).collect().toSeq
    val b = MultimodalOps.x14(spark, TestSpark.sfSmoke).collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(1)).sum === media.count())
  }

  test("x14 plumbing runs a REAL JVM decode (javax.imageio PNG) behind the stub's interface") {
    import spark.implicits._
    import MultimodalOps.MediaRow
    // genuine encoded PNGs, built in-memory: the decoder must recover the
    // TRUE pixel dimensions (the stub derives fake ones from byte length,
    // so agreement cannot be accidental) and a mass-1 luminance histogram
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) * 131071) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, "png", 0L, png(40, 25, 1)),
      MediaRow(2L, "png", 0L, png(17, 9, 2)),
      MediaRow(3L, "png", 0L, png(3, 300, 3)))
    val media = spark.createDataset(rows)
    val out = MultimodalOps
      .extractFeatures(media, MultimodalOps.decodeImage _)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width === 40 && out(1L).height === 25)
    assert(out(2L).width === 17 && out(2L).height === 9)
    assert(out(3L).width === 3 && out(3L).height === 300)
    for (f <- out.values) {
      assert(f.feature.length === 16)
      assert(math.abs(f.feature.sum - 1.0) < 1e-9, "luma histogram mass 1")
    }
    // a non-image payload must fail loudly, not decode garbage
    val bad = spark.createDataset(Seq(MediaRow(9L, "png", 0L, Array[Byte](1, 2, 3))))
    val e = intercept[org.apache.spark.SparkException] {
      MultimodalOps.extractFeatures(bad, MultimodalOps.decodeImage _).collect()
    }
    assert(e.getMessage.contains("ImageIO") || e.getCause != null)
  }

  test("x14 REGISTERED entry decodes real PNGs when media.parquet + codec=imageio are present") {
    import spark.implicits._
    import MultimodalOps.MediaRow
    def png(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) * 131071) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    val rows = Seq(
      MediaRow(1L, "png", 0L, png(40, 25, 1)),
      MediaRow(2L, "png", 0L, png(40, 25, 2)),
      // a non-image modality in the same table: must route to the stub
      MediaRow(3L, "wav", 0L, Array.tabulate[Byte](640)(_.toByte)))
    spark.createDataset(rows).write.parquet(s"$dir/media.parquet")
    val entry = SparkEntry.queries("x14_multimodal_features")
    try {
      spark.conf.set("spark.graft.multimodal.codec", "imageio")
      val out = entry(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      // TRUE pixel dimensions through the registered operator: the stub
      // derives fake dims from byte length (a 40x25 PNG is nowhere near
      // 40 + 25 encoded bytes), so agreement cannot be accidental
      assert(out("png").getDouble(3) === 40.0 && out("png").getDouble(4) === 25.0)
      // the wav row still gets the stub's size-derived dims (mixed dispatch)
      val wavBytes = 640
      assert(out("wav").getDouble(3) === (64 + wavBytes % 64).toDouble)
      // default codec on the same dir: fake dims everywhere, not 40x25
      spark.conf.unset("spark.graft.multimodal.codec")
      val stub = entry(spark, dir).collect().map(r => r.getString(0) -> r).toMap
      assert(stub("png").getDouble(3) !== 40.0)
      // unknown codec names fail loudly
      spark.conf.set("spark.graft.multimodal.codec", "nope")
      intercept[IllegalArgumentException] { entry(spark, dir) }
    } finally spark.conf.unset("spark.graft.multimodal.codec")
  }

  test("x26 frame sampling: bounded fan-out, mass-preserving resize, deterministic") {
    val media = MultimodalOps.mediaTable(spark, TestSpark.sfSmoke)
    val frames = MultimodalOps.sampleFrames(media, maxFrames = 8).collect()
    assert(frames.nonEmpty)
    val perDoc = frames.groupBy(_.doc_id).values.map(_.length)
    assert(perDoc.max <= 8, "fan-out must be capped at maxFrames")
    // resize halves 16 bins into 8 preserving total mass exactly
    val f0 = frames.head
    val (w, h, half) = MultimodalOps.resizeStub(64, 48, f0.feature, 32)
    assert(w === 32 && h === 24 && half.length === 8)
    assert(math.abs(half.sum - f0.feature.sum) < 1e-12)
    // deterministic end-to-end
    val a = MultimodalOps.x26(spark, TestSpark.sfSmoke).collect().toSeq
    val b = MultimodalOps.x26(spark, TestSpark.sfSmoke).collect().toSeq
    assert(a === b && a.nonEmpty)
    assert(a.map(_.getLong(1)).sum === frames.length.toLong)
  }

  test("x45/x46 exact kernels agree: q45 top-1 is the max-cosine neighbor") {
    val top = LlmExt.q45(spark, TestSpark.sfSmoke).head()
    assert(top.getDouble(1) <= 1.000001 && top.getDouble(1) >= -1.0)
  }

  test("native rolling_fps equals the interpreted HOF formulation (incl. unicode)") {
    import spark.implicits._
    val corpus = graft.engine.Tables.documents(spark, TestSpark.sfSmoke)
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (9001L, ""), (9002L, "one two three four"),          // < 5 tokens
      (9003L, "a b c d e"), (9004L, "  double  spaced  x y z w v  "),
      (9005L, "\u00e9clair caf\u00e9 na\u00efve \u20acuro \u65e5\u672c\u8a9e tokens seven"),
      (9006L, ("tok " * 300).trim)                          // > 256 tokens
    ).toDF("doc_id", "text")
    val docs = corpus.unionByName(edge)
    val native = graft.queries.LlmExt2.docFingerprints(docs)
      .groupBy("doc_id", "fp").count()
    val hof = graft.queries.LlmExt2.docFingerprintsHof(docs)
      .groupBy("doc_id", "fp").count()
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native rolling_fps diverges from the HOF reference")
  }

  test("x24 components: every exact-duplicate pair shares a component") {
    val comp = graft.queries.Pipeline.x24(spark, sfBig)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size === graft.engine.Tables.documents(spark, sfBig).count())
    for ((a, b) <- exactDupPairs)
      assert(comp(a) === comp(b), s"dup pair ($a,$b) split across components")
    assert(comp.values.toSet.size < comp.size, "sf0.1 must have non-trivial clusters")
  }

  test("x24 star edges: edge count is linear in bucket size (hot fingerprint)") {
    import spark.implicits._
    // planted boilerplate: 200 docs all sharing fingerprint 42 (one ubiquitous
    // 5-gram), plus a few singleton fingerprints. Round 1's all-pairs self-join
    // made 200*199 = 39800 edge rows from the hot bucket; the star builder
    // must emit 2*(200-1) and still connect the whole bucket to its min doc.
    val hot = (1L to 200L).map(id => (id, 42L))
    val cold = Seq((301L, 7L), (302L, 8L), (303L, 9L))
    val fp = (hot ++ cold).toDF("doc_id", "fp")
    val edges = graft.queries.Pipeline.fingerprintStarEdges(fp).collect()
    assert(edges.length === 2 * 199, s"expected linear edges, got ${edges.length}")
    // connectivity identical to the clique: every hot doc reaches min doc 1
    val toMin = edges.map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 == 1L).map(_._1).toSet
    assert(toMin === (2L to 200L).toSet, "every bucket member must link to the min doc")
    // symmetric edges so min-label propagation flows both directions
    val es = edges.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es.forall { case (u, v) => es.contains((v, u)) })
    // singleton buckets contribute no edges
    assert(!es.exists { case (u, v) => u > 300 || v > 300 })
  }

  test("x31 n-gram decontamination subsumes exact-text decontamination on fingerprintable docs") {
    val docs = graft.engine.Tables.documents(spark, sfBig)
    val fp = LlmExt2.x13(spark, sfBig).select(col("doc_id")) // docs with ≥1 fingerprint
      .collect().map(_.getLong(0)).toSet
    // exact-contaminated: lower(text) matches some benchmark doc's text
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(lower(col("text")).as("b")).distinct()
    val exactDropped = docs.join(bench, lower(col("text")) === col("b"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // n-gram-contaminated = all docs minus x31 survivors
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val ngramClean = graft.queries.Pipeline.x31(spark, sfBig)
      .agg(sum(col("n_clean"))).head().getLong(0)
    val ngramDroppedCount = all.size - ngramClean
    // every exact-dropped doc that CAN be fingerprinted must be n-gram-dropped
    val mustDrop = exactDropped.intersect(fp)
    assert(mustDrop.nonEmpty, "sf0.1 benchmark slice must hit some exact dups")
    assert(ngramDroppedCount >= mustDrop.size,
      s"n-gram dropped $ngramDroppedCount < exact-dropped-and-fingerprintable ${mustDrop.size}")
  }

  test("x30 corpus mix: achieved keep-rate tracks the per-language target") {
    val targets = Map("en" -> 0.5, "de" -> 0.8, "fr" -> 0.7, "zh" -> 0.9, "es" -> 1.0)
    for (r <- graft.queries.Pipeline.x30(spark, sfBig).collect()) {
      val (lang, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val achieved = kept.toDouble / total
      // multiplicative-hash buckets are near-uniform: ±7pp at sf0.1 counts
      assert(math.abs(achieved - targets(lang)) <= 0.07,
        s"$lang: achieved $achieved vs target ${targets(lang)} ($kept/$total)")
    }
  }

  test("native shingles == interpreted HOF chain on real docs and edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "  ", "a", "a b", "A  b C", "x y z w", "a b c",
                   "tab\there", "multi  space  runs ", " leading").toDF("text")
    val real = graft.engine.Tables.documents(spark, sfBig).select(col("text"))
    for (df <- Seq(edge, real); n <- Seq(2, 3)) {
      val both = df
        .withColumn("nat", call_function("shingles", col("text"), lit(n)))
        .withColumn("toks", split(lower(col("text")), " "))
        .withColumn("hof", array_distinct(expr(
          s"transform(sequence(0, greatest(size(toks)-$n, 0)), " +
          s"i -> concat_ws(' ', slice(toks, i+1, $n)))")))
      assert(both.filter(not(col("nat") === col("hof"))).count() === 0,
        s"n=$n mismatch: " + both.filter(not(col("nat") === col("hof")))
          .select("text", "nat", "hof").take(3).mkString("; "))
    }
  }

  test("x109 prefix-filter containment catches the quotation pair x102's LSH bands miss") {
    import spark.implicits._
    // Planted corpus: doc 1 is a 10-token sentence quoted VERBATIM inside
    // doc 2's ~120 tokens of unrelated text → containment C(1→2) = 1.0 but
    // symmetric Jaccard ≈ 6/116 ≪ 0.5, the regime x86/x102's
    // Jaccard-tuned bands are not built to catch. Filler docs give the LSH
    // hashes a realistic corpus.
    val quote = "zephyr quantum marble octopus vivid lantern crimson saddle nebula forge"
    val junk = (0 until 55).map(i => s"filler${i}a common${i}b").mkString(" ")
    val junk2 = (0 until 55).map(i => s"pad${i}x word${i}y").mkString(" ")
    val docs = Seq(
      (1L, quote, "en", "web", quote.length.toLong),
      (2L, s"$junk $quote $junk2", "en", "web", 1L),
      (3L, junk, "en", "web", 1L),
      (4L, junk2, "en", "web", 1L),
      (5L, (0 until 40).map(i => s"other$i").mkString(" "), "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("x109corpus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // x102 (banded-LSH candidates) does NOT see the pair...
    val x102Pairs = LlmExt2.x102(spark, dir).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!x102Pairs.contains((1L, 2L)),
      "fixture invalid: the LSH bands caught the quotation — replant with lower Jaccard")
    // ...the exhaustive prefix-filter path MUST (and at exactly 1.0: every
    // 5-token window of doc 1 appears in doc 2)
    val x109Rows = LlmExt2.x109(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(x109Rows.exists(r => r._1 == 1L && r._2 == 2L && r._3 === 1.0),
      s"planted (1 contained-in 2) missing from ${x109Rows.toSeq}")
    // direction is semantic: the huge doc is NOT contained in the quote
    assert(!x109Rows.exists(r => r._1 == 2L && r._2 == 1L))
  }
}
