package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-10 fourth batch: x234 dictionary-encoding advisor, x235
  * deletion-vector merge-on-read, x236 A/V track alignment. Naive JVM
  * replays on real corpus data plus the structural theorems: ⌈log₂⌉
  * ladder correctness + a discriminating recommendation (x234), mass
  * conservation + MOR ≡ COW (x235), and binding monotonicity + the
  * non-terminal fan-in ceiling (x236).
  */
class Round10dSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import graft.engine.Tables

  // ---------------------------------------------------------------- x234

  test("x234 equals a naive JVM replay over the shared column list") {
    val loaders: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "orders" -> Tables.orders(spark, sfSmoke),
      "lineitem" -> Tables.lineitem(spark, sfSmoke),
      "part" -> Tables.part(spark, sfSmoke),
      "customer" -> Tables.customer(spark, sfSmoke),
      "documents" -> Tables.documents(spark, sfSmoke))
    val want = graft.queries.Layout.encodingAuditCols.flatMap {
      case (t, cols) => cols.map { c =>
        val vals = loaders(t).select(col(c).cast("string")).collect()
          .map(_.getString(0)).filter(_ != null)
        val n = vals.length.toLong
        val ndv = vals.distinct.length.toLong
        val plain = vals.map(_.getBytes("UTF-8").length.toLong).sum
        val maxLen = vals.map(_.getBytes("UTF-8").length.toLong).max
        val bits = if (ndv <= 1) 0L else BigInt(ndv - 1).bitLength.toLong
        val dict = ndv * maxLen + (n * bits + 7) / 8
        (t, c, n, ndv, plain, dict, dict * 1000000L / plain,
         if (dict < plain) "dict" else "plain")
      }
    }.toSet
    val got = graft.queries.Layout.x234(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
      .toSet
    assert(want.nonEmpty && got === want)
  }

  test("x234 theorem: the CASE ladder IS ceil(log2), and the advice discriminates") {
    val rows = graft.queries.Layout.x234(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getString(7)))
    // ladder vs arithmetic ceil(log2) on every audited ndv
    rows.foreach { case (_, _, ndv, _) =>
      val ladder = (0 until 31).map(k => if (ndv > (1L << k)) 1L else 0L).sum
      val arith = if (ndv <= 1) 0L else BigInt(ndv - 1).bitLength.toLong
      assert(ladder === arith, s"ladder/log2 mismatch at ndv=$ndv")
    }
    val byCol = rows.map { case (t, c, _, e) => (t, c) -> e }.toMap
    assert(byCol(("documents", "text")) === "plain",
      "unique long texts must NOT be dictionary-encoded")
    assert(byCol(("orders", "o_orderstatus")) === "dict")
  }

  // ---------------------------------------------------------------- x235

  test("x235 equals a naive replay; mass conserves; MOR == COW") {
    val rows = graft.queries.Layout.x235(spark, sfSmoke).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getBoolean(5))).toMap
    val ord = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey").cast("long"),
              round(col("o_totalprice") * 100, 0).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val del = ord.filter(_._1 % 13 == 0)
    val keep = ord.filter(_._1 % 13 != 0)
    assert(rows("base") ._1 === ord.length.toLong)
    assert(rows("deleted")._1 === del.length.toLong)
    assert(rows("merge_on_read")._1 === keep.length.toLong)
    assert(rows("base")._2 === ord.map(_._2).sum)
    assert(rows("deleted")._2 === del.map(_._2).sum)
    assert(rows("merge_on_read")._2 === keep.map(_._2).sum)
    // conservation: the DV splits the store exactly in two
    assert(rows("base")._1 === rows("deleted")._1 + rows("merge_on_read")._1)
    assert(rows("base")._2 === rows("deleted")._2 + rows("merge_on_read")._2)
    // the masked scan provably returns the copy-on-write survivor set
    assert(rows.values.forall(_._5), "mor_eq_cow must hold on every row")
    // DV compactness: buckets never exceed deleted keys, and the density
    // accounting is the replayed formula
    val buckets = del.map(_._1 / 32).distinct.length.toLong
    assert(rows("base")._3 === buckets)
    assert(rows("base")._4 === del.length.toLong * 1000000L / (buckets * 32))
  }

  // ---------------------------------------------------------------- x236

  private def naiveAlign(len: Long): (Long, Long, Seq[Long]) = {
    val nFrames = math.min(8L, math.max(1L, len / 256))
    val nWindows = (len + 511) / 512
    val matched = (0L until nWindows).map(i =>
      math.min(i * 32000 / 250000, nFrames - 1))
    (nFrames, nWindows, matched)
  }

  test("x236 equals the closed-form replay binding for binding") {
    val docs = Tables.documents(spark, sfSmoke).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) =>
        id % 4 == 3 && t.getBytes("UTF-8").length > 0 }
    val want = docs.map { case (id, t) =>
      val (nf, nw, m) = naiveAlign(t.getBytes("UTF-8").length.toLong)
      (id, nf, nw, m.max + 1,
       m.groupBy(identity).values.map(_.size).max.toLong,
       m.zipWithIndex.map { case (f, i) => (i + 1) * (f + 1) }.sum)
    }.toSet
    val got = graft.queries.MultimodalOps.x236(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5))).toSet
    assert(want.nonEmpty && got === want)
  }

  test("x236 theorems: bindings are monotone; non-terminal fan-in <= 8") {
    val docs = Tables.documents(spark, sfSmoke).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) =>
        id % 4 == 3 && t.getBytes("UTF-8").length > 0 }
    assert(docs.nonEmpty)
    docs.foreach { case (_, t) =>
      val (nf, _, m) = naiveAlign(t.getBytes("UTF-8").length.toLong)
      // as-of bindings never move backwards in time
      assert(m.zip(m.tail).forall { case (a, b) => b >= a })
      // every frame except the last absorbs at most ceil(250/32) = 8
      // windows (the terminal frame absorbs the open-ended tail)
      m.groupBy(identity).foreach { case (f, xs) =>
        if (f < nf - 1) assert(xs.size <= 8) }
    }
    // frame 0 at t=0 catches window 0 everywhere
    val hit = graft.queries.MultimodalOps.x236(spark, sfSmoke).collect()
    hit.foreach(r => assert(r.getLong(3) >= 1L))
  }
}
