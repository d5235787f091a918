package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 operators: x217 small-file compaction. The driver's hash
  * compare proves engine↔DuckDB parity of the conservation columns; this
  * proves the PHYSICAL claims the oracle cannot see — the on-disk file
  * counts before/after the rewrite, and that the audit flag is derived
  * from them rather than hard-coded. */
class Round10Spec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  test("x217 conserves rows and cents through both rewrite stages") {
    val src = Tables.orders(spark, sfSmoke)
      .agg(count(lit(1)), sum(round(col("o_totalprice") * 100, 0).cast("long")))
      .head()
    val (nRows, cents) = (src.getLong(0), src.getLong(1))
    val out = graft.queries.Layout.x217(spark, sfSmoke).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("compacted", "fragmented"))
    out.foreach { r =>
      assert(r.getLong(1) === nRows, s"${r.getString(0)} lost/duplicated rows")
      assert(r.getLong(2) === cents, s"${r.getString(0)} changed the cents total")
      assert(r.getBoolean(3), s"${r.getString(0)} audit flag must hold")
    }
  }

  test("x218 portable simhash equals a naive in-JVM replay on real corpus data") {
    import graft.queries.LlmExt2
    val docs = Tables.documents(spark, sfSmoke).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).take(256)
      if (toks.isEmpty) None else {
        val votes = Array.fill(LlmExt2.simhashBits)(0L)
        for (t <- toks) {
          val c = (if (t.nonEmpty) t.charAt(0).toLong else 0L) * 4096 +
                  (if (t.length > 1) t.charAt(1).toLong else 0L) * 64 + t.length
          LlmExt2.simhashCoeffs.zipWithIndex.foreach { case ((a, b), i) =>
            votes(i) += (if ((c * a + b) % LlmExt2.simhashP % 2 == 1) 1 else -1)
          }
        }
        val fp = (0 until LlmExt2.simhashBits)
          .map(b => if (votes(b) > 0) 1L << b else 0L).sum
        Some(id -> fp)
      }
    }.toMap
    // per-doc parity via the collision-group view: rebuild the expected
    // groups and compare (simhash, rep, n_docs) triples exactly
    val wantGroups = want.groupBy(_._2).map { case (fp, m) =>
      (fp, m.keys.min, m.size.toLong) }.toSet
    val gotGroups = LlmExt2.x218(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(wantGroups.nonEmpty && gotGroups === wantGroups)
  }

  test("x218 planted exact duplicates collide; a perturbed twin stays Hamming-close") {
    import spark.implicits._
    import graft.queries.LlmExt2
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    val twin = base.replace("lazy", "idle") // one token class changed
    val df = Seq((1L, base), (2L, base), (3L, twin))
      .toDF("doc_id", "text")
    val fps = LlmExt2.simhashPortable(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps(1L) === fps(2L), "identical texts must collide exactly")
    // SimHash's locality THEOREM (not a data-luck constant): replacing one
    // token class with k occurrences shifts each bit's vote total by at
    // most 2k (the old token's ±1s leave, the new one's enter), so only
    // bits whose pre-change majority margin is ≤ 2k can flip. Compute the
    // margin-derived bound from the base text's votes and assert it.
    val baseToks = base.toLowerCase.split(" ").filter(_.nonEmpty).take(256)
    val k = baseToks.count(_ == "lazy")
    val votes = Array.fill(LlmExt2.simhashBits)(0L)
    for (t <- baseToks) {
      val c = t.charAt(0).toLong * 4096 +
              (if (t.length > 1) t.charAt(1).toLong else 0L) * 64 + t.length
      LlmExt2.simhashCoeffs.zipWithIndex.foreach { case ((a, b), i) =>
        votes(i) += (if ((c * a + b) % LlmExt2.simhashP % 2 == 1) 1 else -1)
      }
    }
    val flippable = votes.count(v => math.abs(v) <= 2L * k)
    val hamming = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(hamming <= flippable,
      s"only margin-≤${2 * k} bits may flip: hamming $hamming > bound $flippable")
    assert(flippable < LlmExt2.simhashBits,
      "the fixture must leave some bits unflippable or the bound is vacuous")
  }

  test("x217 physically packs: 64 data files before, monotonically fewer after") {
    graft.queries.Layout.x217(spark, sfSmoke).collect() // (re)write both stages
    val root = new java.io.File("/tmp").listFiles()
      .filter(_.getName.startsWith("graft_compact_"))
      .maxBy(_.lastModified)
    def files(stage: String) =
      new java.io.File(root, stage).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files("fragmented").length === 64)
    val after = files("compacted")
    assert(after.length < 64 && after.length >= 1,
      s"bin-pack must reduce the file count, got ${after.length}")
    // packing, not re-fragmenting: mean bytes per file strictly grows
    val meanBefore = files("fragmented").map(_.length).sum.toDouble / 64
    val meanAfter = after.map(_.length).sum.toDouble / after.length
    assert(meanAfter > meanBefore,
      f"mean bytes/file must grow ($meanBefore%.0f -> $meanAfter%.0f)")
  }
}
