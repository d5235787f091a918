package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Curation

/** x44–x48 semantic properties (the oracle compare pins exact values; these
  * pin the math's invariants so a refactor that stays repr-identical but
  * breaks semantics still fails fast). */
class CurationSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x44 entropy is bounded by [0, ln(n_tokens)] and exact on a hand case") {
    val rows = Curation.x44(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, h) = (r.getLong(1), r.getDouble(2))
      // ±5e-7 slack: the output is rounded to 6 decimals, so a uniform doc
      // sits up to half an ulp-of-rounding above the exact ln(n) ceiling
      assert(h >= -5e-7, s"doc ${r.getLong(0)}: negative entropy $h")
      assert(h <= math.log(n.toDouble) + 5e-7,
        s"doc ${r.getLong(0)}: H=$h exceeds ln($n)")
    }
    // hand case: uniform distribution hits the ln(k) ceiling exactly
    import spark.implicits._
    val one = Seq((0L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(log(sum(col("c"))) -
                 sum(col("c") * log(col("c"))) / sum(col("c")), 6).as("h"))
      .head().getDouble(1)
    assert(math.abs(one - math.log(4.0)) < 1e-5)
  }

  test("native token_stats equals the explode/groupBy formulation exactly") {
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
    val tk = filter(split(lower(col("text")), " "), t => t =!= "")
    val viaExplode = docs.select(col("doc_id"), explode(tk).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"), max(col("c")).as("mx"),
           sum(col("c") * log(col("c"))).as("clnc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val viaNative = docs
      .select(col("doc_id"), call_function("token_stats", col("text")).as("ts"))
      .filter(col("ts.n_tokens") > 0)
      .collect().map { r =>
        val s = r.getStruct(1)
        r.getLong(0) -> (s.getLong(0), s.getLong(1), s.getDouble(2))
      }.toMap
    assert(viaNative.keySet === viaExplode.keySet)
    for ((id, (n, mx, clnc)) <- viaExplode) {
      val (nn, nmx, nclnc) = viaNative(id)
      assert(nn === n && nmx === mx, s"doc $id integer stats diverge")
      // float sums may differ only by summation order (~1e-14 relative)
      assert(math.abs(nclnc - clnc) <= 1e-9 * math.max(1.0, math.abs(clnc)),
        s"doc $id: sum_clnc $nclnc vs $clnc")
    }
  }

  test("x45 quantization error is bounded by scale/2 and codes by ±127·dim") {
    val rows = Curation.x45(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (dim, scale, codeSum, err) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      // symmetric rounding guarantees |x - q·s| ≤ s/2 (+ rounding of the
      // 8-digit scale repr)
      assert(err <= scale / 2 + 1e-7, s"vec ${r.getLong(0)}: err $err > s/2")
      assert(math.abs(codeSum) <= 127L * dim, s"vec ${r.getLong(0)}")
    }
  }

  test("x46 per-doc uniques never exceed bigram count; df averages ≥ 1") {
    val rows = Curation.x46(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) <= r.getLong(1), s"doc ${r.getLong(0)}")
      assert(r.getDouble(2) >= 1.0, s"doc ${r.getLong(0)}")
    }
    // corpus-wide: Σ n_unique = number of df=1 bigrams = Σ df=1 groups
    val totalUnique = rows.map(_.getLong(3)).sum
    assert(totalUnique >= 0 && totalUnique <= rows.map(_.getLong(1)).sum)
  }

  test("x47 admission counts are consistent and rates reproduce n_keep/n_docs") {
    val rows = Curation.x47(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nDocs, nKeep, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nKeep <= nDocs, s"source ${r.getString(0)}")
      assert(math.abs(rate - nKeep.toDouble / nDocs) < 5e-5,
        s"source ${r.getString(0)}: rate $rate != $nKeep/$nDocs")
    }
    // every document lands in exactly one source bucket
    val total = rows.map(_.getLong(1)).sum
    val docs = graft.engine.Tables.documents(spark, sfSmoke).count()
    assert(total === docs)
  }

  test("x49 caps every source at 20 and kept mass never exceeds source mass") {
    val rows = Curation.x49(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    val chars = graft.engine.Tables.documents(spark, sfSmoke)
      .groupBy("source").agg(sum(col("n_chars")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val (src, nDocs, nKept, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept === math.min(nDocs, 20L), s"$src kept $nKept of $nDocs")
      assert(kept <= chars(src), s"$src kept-chars exceed total")
    }
  }

  test("x50 bins partition the corpus and bracket their own lengths") {
    val rows = Curation.x50(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (bin, mn, mx) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(mn >= bin * 50 && mx < (bin + 1) * 50 && mn <= mx,
        s"bin $bin holds lengths outside [${bin * 50},${bin * 50 + 49}]")
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.engine.Tables.documents(spark, sfSmoke).count())
  }

  test("x48 mean cosine to own centroid is in [-1,1] and vectors all counted") {
    val rows = Curation.x48(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val cos = r.getDouble(2)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9, s"label ${r.getLong(0)}")
    }
    val total = rows.map(_.getLong(1)).sum
    val vecs = graft.engine.Tables.embeddings(spark, sfSmoke).count()
    assert(total === vecs)
  }
}
