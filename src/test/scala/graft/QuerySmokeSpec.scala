package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query executes at sf0.001 and returns plausible shapes.
  * (Value-level correctness is the DuckDB oracle compare — scripts/compare.py
  * / the driver's t2 gate; this spec catches runtime regressions fast.) */
class QuerySmokeSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  private val expectedRows: Map[String, Long] = Map(
    "q02_filter_pushdown" -> 1, "q04_join_inner" -> 5, "q10_join_multiway_tpch_q5" -> 5,
    "q12_agg_tpch_q1" -> 6, "q15_agg_cube" -> 12, "q24_topk_global" -> 100,
    "q26_set_intersect" -> 10, "q38_ml_class_costs" -> 2, "q40_ml_chi_rulegen" -> 18,
    "q43_ml_metrics" -> 1, "q45_similarity_cosine_topk" -> 20, "q46_knn_label_vote" -> 100,
    "q47_text_tokenize_topk" -> 31)

  // one test per registered operator (the "spec per operator" gate)
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sfSmoke)
      val n = df.count()
      assert(n >= 0)
      expectedRows.get(name).foreach(e => assert(n === e, s"row count for $name"))
      if (!Set("q08_join_anti", "q27_set_except", "x08_dedup_ngram_jaccard",
               "x09_embedding_neardup_lsh").contains(name))
        assert(n > 0, s"$name should be non-trivial at sf0.001")
    }
  }

  test("entry flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry and names match") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("compact bench keys (prefix before first underscore) are unique") {
    // Bench emits per-query detail under "q12"/"x110"-style prefixes so the
    // full map fits the driver's ~4 KB tail capture; a colliding prefix
    // would silently overwrite a timing in the emitted JSON object
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size === prefixes.size,
      prefixes.groupBy(identity).collect { case (p, v) if v.size > 1 => p }.mkString(","))
  }
}
