package graft

import org.scalatest.funsuite.AnyFunSuite

/** x170–x172 structural invariants: join-free skip-gram counts equal the
  * positional self-join, the two-phase median equals a full sort — with
  * the bucket-straddle edge case exercised on crafted data — and the
  * range checksums recompute row-by-row. */
class Round8dSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Organize3

  test("x170 map-side pairs equal the positional self-join rebuild") {
    val got = Organize3.x170(spark, sfSmoke).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // naive: explode with positions, self-join on (doc, pos window)
    val toks = Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
    val naive = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
        col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 2)
      .groupBy(col("a.tok").as("w1"), col("b.tok").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2")).limit(20)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("x171 matches a full-sort median on the harness data") {
    val row = Organize3.x171(spark, sfSmoke).head()
    val cents = Tables.orders(spark, sfSmoke)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    val expected = cents((n - 1) / 2) + cents(n / 2)
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === expected)
  }

  test("x171 straddle case: the two middles in DIFFERENT histogram buckets") {
    // craft an orders table whose two middle cents values are 4095.00*100?
    // no — bucket width is 4096 cents, so values 4095 and 4097 cents sit
    // in buckets 0 and 1: the k1/k2 lookups must offset per-bucket
    val dir = java.nio.file.Files.createTempDirectory("x171straddle").toString
    import spark.implicits._
    Seq(10.00, 40.95, 40.97, 90.00) // cents: 1000, 4095, 4097, 9000
      .toDF("o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val row = Organize3.x171(spark, dir).head()
    assert(row.getLong(0) === 4L)
    assert(row.getLong(1) === 4095L + 4097L,
      "middles straddling a bucket boundary must both be found")
  }

  test("x172 checksums recompute row-by-row; counts partition the table") {
    val got = Organize3.x172(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .collect()
    val naive = rows.groupBy(_.getLong(0) / 1000).view.mapValues { rs =>
      (rs.length.toLong,
       rs.map(r => (r.getLong(0) * 2654435761L + r.getLong(1) * 40503L +
                    r.getLong(2)) % 9007199254740881L).sum)
    }.toMap
    assert(got === naive)
    assert(got.values.map(_._1).sum === rows.length.toLong)
  }

  test("x181 LPA: labels are attained node ids, sizes partition the graph") {
    val out = Organize3.x181(spark, sfSmoke).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length > 1, "graph collapsed to one community — support filter broken")
    // nodes of the support>=2 graph
    val op = Tables.lineitem(spark, sfSmoke)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = op.groupBy(_._1).values.toSeq.flatMap { os =>
      val ps = os.map(_._2).toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).collect { case (e, g) if g.size >= 2 => e }.toSeq
    val nodes = pairs.flatMap(e => Seq(e._1, e._2)).toSet
    assert(out.map(_._2).sum === nodes.size.toLong,
      "community sizes must partition the node set")
    assert(out.forall(kv => nodes.contains(kv._1)),
      "every community label is an attained node id")
  }
}
