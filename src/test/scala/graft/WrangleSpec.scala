package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Wrangle

/** x57–x60 semantic properties (the oracle compare pins exact values; these
  * pin the math's invariants so a refactor that stays repr-identical but
  * breaks semantics still fails fast). */
class WrangleSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}

  test("x57 chunks tile every document: stride 150, len = min(200, rest), full coverage") {
    val docs = graft.engine.Tables.documents(spark, sfSmoke)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Wrangle.x57(spark, sfSmoke).collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet === docs.keySet, "every non-empty doc is chunked")
    for ((id, cs) <- byDoc) {
      val n = docs(id)
      val sorted = cs.sortBy(_.getLong(1))
      // chunk_idx is dense from 0; start = idx*150; expected count
      assert(sorted.map(_.getLong(1)).toSeq === sorted.indices.map(_.toLong))
      assert(sorted.length === ((n - 1) / 150 + 1),
        s"doc $id: ${sorted.length} chunks for $n chars")
      for (c <- sorted) {
        val (idx, off, len) = (c.getLong(1), c.getLong(2), c.getLong(3))
        assert(off === idx * 150)
        assert(len === math.min(200L, n - off))
      }
      // the last chunk reaches the end of the document exactly
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) === n)
    }
  }

  test("x58 keeps exactly one row per live (user, type) key and is idempotent") {
    val ev = graft.engine.Tables.events(spark, sfSmoke)
    val liveKeys = ev.select(col("user_id"), col("event_type"))
      .distinct().groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Wrangle.x58(spark, sfSmoke).collect()
    assert(out.map(_.getString(0)).toSet === liveKeys.keySet)
    for (r <- out)
      assert(r.getLong(1) === liveKeys(r.getString(0)),
        s"${r.getString(0)}: n_keys != distinct live keys")
    // the newest surviving timestamp per type can never precede the newest
    // raw event of ANY of its keys (latest-wins picks the max per key)
    val maxRaw = ev.groupBy("event_type").agg(max(unix_micros(col("ts"))).as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- out) assert(r.getLong(3) === maxRaw(r.getString(0)),
      s"${r.getString(0)}: max surviving ts must equal max raw ts")
  }

  test("x59 PMI matches the closed form on a recomputed pair and respects support") {
    val rows = Wrangle.x59(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 5), "support filter b >= 5")
    // recompute one pair end-to-end from the raw corpus
    val d = graft.engine.Tables.documents(spark, sfSmoke)
      .select(filter(split(lower(col("text")), " "), t => t =!= "").as("tk"))
    val toksFlat = d.select(explode(col("tk")).as("tok"))
    val n = toksFlat.count()
    val uni = toksFlat.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bg = d.collect().iterator
      .flatMap(_.getSeq[String](0).sliding(2).filter(_.length == 2))
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = bg.valuesIterator.sum
    val probe = rows.head
    val (a, b) = (probe.getString(0), probe.getString(1))
    val expect = math.log(bg(Seq(a, b)).toDouble * n * n /
                          (m.toDouble * uni(a) * uni(b)))
    assert(math.abs(probe.getDouble(3) - expect) < 1e-5,
      s"pmi($a,$b): ${probe.getDouble(3)} vs $expect")
  }

  test("x60 KL is non-negative per source and zero for a uniform corpus") {
    val rows = Wrangle.x60(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    // Gibbs: KL(p||q) >= 0, up to the 6-digit output rounding
    for (r <- rows)
      assert(r.getDouble(3) >= -5e-7, s"${r.getString(0)}: KL ${r.getDouble(3)} < 0")
    // a source whose distribution IS the corpus distribution has KL = 0:
    // total n_tokens across sources equals the corpus total used in terms
    val totalTokens = rows.map(_.getLong(1)).sum
    val corpusTokens = graft.engine.Tables.documents(spark, sfSmoke)
      .select(explode(filter(split(lower(col("text")), " "), t => t =!= "")))
      .count()
    assert(totalTokens === corpusTokens)
  }

  test("x61 equals the plain (bloom-free) semi join exactly") {
    val plain = graft.engine.Tables.customer(spark, sfSmoke)
      .join(graft.engine.Tables.orders(spark, sfSmoke)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           sum(round(col("c_acctbal") * 100, 0).cast("long")).as("acctbal_cents"))
      .orderBy("c_mktsegment").collect().toSeq
    val pruned = Wrangle.x61(spark, sfSmoke).collect().toSeq
    assert(pruned === plain, "bloom pre-filter must never change the result")
  }

  test("freq_sketch honors the Misra-Gries survivor guarantee and weight bounds") {
    val tok = graft.engine.Tables.documents(spark, sfSmoke)
      .select(explode(filter(split(lower(col("text")), " "), t => t =!= ""))
                .as("tok"))
      .repartition(8) // force real partial buffers + merges
    val exact = tok.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cap = 4 // far below vocab so compression genuinely fires
    val sk = tok.agg(call_function("freq_sketch", col("tok"), lit(cap)))
      .head().getMap[String, Long](0)
    assert(sk.size <= cap, s"sketch holds ${sk.size} > capacity $cap")
    val bound = n / (cap + 1)
    for ((k, c) <- exact if c > bound)
      assert(sk.contains(k), s"heavy key $k (count $c > N/${cap + 1}=$bound) evicted")
    for ((k, w) <- sk) {
      assert(w <= exact(k), s"$k: sketch weight $w exceeds true count ${exact(k)}")
      assert(w >= exact(k) - bound, s"$k: weight $w under-estimates beyond N/(cap+1)")
    }
  }

  test("x62 equals the exact full top-20 (sketch candidates lose nothing here)") {
    val exact = graft.engine.Tables.documents(spark, sfSmoke)
      .select(explode(filter(split(lower(col("text")), " "), t => t =!= ""))
                .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20).collect().toSeq
    assert(Wrangle.x62(spark, sfSmoke).collect().toSeq === exact)
  }

  test("x63 keeps at most 30 docs per language and never more than exist") {
    for (r <- Wrangle.x63(spark, sfSmoke).collect()) {
      val (nDocs, nKept) = (r.getLong(1), r.getLong(2))
      assert(nKept === math.min(30L, nDocs),
        s"${r.getString(0)}: kept $nKept of $nDocs")
    }
  }

  test("x64 audit is all-zero on the shipped data and each check fires on planted rot") {
    import spark.implicits._
    val clean = Wrangle.x64(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.keySet === Set("customer_dup_key", "lineitem_nonpositive_price",
      "lineitem_orphan", "order_dup_key", "order_no_customer"))
    assert(clean.values.forall(_ === 0L), s"shipped data must audit clean: $clean")
    // planted violations: 2 orphan lineitems, 1 bad price, dup order key,
    // dup customer key, 1 order pointing at a missing customer
    val cust = Seq((1L, 0), (2L, 0), (2L, 0)).toDF("c_custkey", "pad")
    val ord = Seq((10L, 1L), (11L, 1L), (11L, 2L), (12L, 99L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 5.0), (10L, -1.0), (77L, 5.0), (78L, 5.0))
      .toDF("l_orderkey", "l_extendedprice")
    val rotten = Wrangle.audit(li, ord, cust).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rotten("lineitem_orphan") === 2L)
    assert(rotten("lineitem_nonpositive_price") === 1L)
    assert(rotten("order_dup_key") === 1L, "one KEY is duplicated")
    assert(rotten("customer_dup_key") === 1L)
    assert(rotten("order_no_customer") === 1L)
  }

  test("x65 interval identities: rows = events, opens = users, closed mass = user spans") {
    val out = Wrangle.x65(spark, sfSmoke).collect()
    val ev = graft.engine.Tables.events(spark, sfSmoke)
    assert(out.map(_.getLong(1)).sum === ev.count(), "one interval per event")
    assert(out.map(_.getLong(3)).sum === ev.select("user_id").distinct().count(),
      "exactly one open interval per user")
    // consecutive closed intervals telescope: total closed duration equals
    // the sum over users of (max ts - min ts)
    val spans = ev.groupBy("user_id")
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span"))
      .agg(sum(col("span"))).head().getLong(0)
    assert(out.map(_.getLong(2)).sum === spans)
  }

  test("x66 surprisal is non-negative and covers every multi-token doc's bigrams") {
    val out = Wrangle.x66(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    // ln(H(a)/B(a,b)) >= 0 termwise since B <= H; mean inherits it
    for (r <- out)
      assert(r.getDouble(2) >= -5e-7, s"doc ${r.getLong(0)}: surprisal < 0")
    // per-doc bigram count = token count - 1 (multi-token docs only)
    val expect = graft.engine.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"),
              size(filter(split(lower(col("text")), " "), t => t =!= ""))
                .cast("long").as("n"))
      .filter(col("n") >= 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) - 1)).toMap
    assert(out.map(_.getLong(0)).toSet === expect.keySet)
    for (r <- out) assert(r.getLong(1) === expect(r.getLong(0)))
  }

  test("x67 PageRank conserves mass and respects the teleport floor") {
    val out = Wrangle.x67(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    val n = out.length
    // every node keeps at least the teleport mass (1-d)/N
    for (r <- out)
      assert(r.getDouble(1) >= 0.15 / n - 5e-7,
        s"${r.getString(0)}: pr ${r.getDouble(1)} below teleport floor")
    // symmetrized graph has no dangling nodes, so total mass stays 1
    val total = out.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < n * 5e-7 + 1e-9,
      s"PageRank mass $total != 1")
  }

  test("x68 fills exactly the error rows that have a prior valid reading") {
    val out = Wrangle.x68(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // only nulled (error) rows can be filled; non-error types never are
    for ((t, (_, filled, _)) <- out if t != "error")
      assert(filled === 0L, s"$t: non-error rows must not be filled")
    val (errRows, errFilled, errUnfilled) = out("error")
    assert(errFilled + errUnfilled === errRows,
      "every error row is either filled or a leading gap")
    assert(errFilled > 0, "the data has errors after valid readings")
    // unfilled = error rows with NO prior non-error event for the user
    val ev = graft.engine.Tables.events(spark, sfSmoke)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Long.MinValue, -1)
    val expectUnfilled = ev
      .withColumn("priorValid",
        max(when(col("event_type") =!= "error", 1).otherwise(0)).over(w))
      .filter(col("event_type") === "error" &&
              (col("priorValid").isNull || col("priorValid") === 0))
      .count()
    assert(errUnfilled === expectUnfilled)
  }

  test("x69 spine is dense and conserves order count and revenue mass") {
    val rows = Wrangle.x69(spark, sfSmoke).collect()
    // dense daily spine: row count == days between min and max inclusive
    val days = rows.map(r => java.time.LocalDate.parse(r.getString(0)))
    val expected = java.time.temporal.ChronoUnit.DAYS
      .between(days.min, days.max) + 1
    assert(rows.length.toLong === expected, "spine must have no gaps")
    assert(days.distinct.length === rows.length)
    // zero-filled days exist in this data, and totals are conserved
    val ord = graft.engine.Tables.orders(spark, sfSmoke)
    assert(rows.map(_.getLong(2)).sum === ord.count())
    val cents = ord.select(sum(round(col("o_totalprice") * 100, 0).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getLong(3)).sum === cents)
    // weekend flag matches the calendar
    for (r <- rows.take(30)) {
      val dow = java.time.LocalDate.parse(r.getString(0)).getDayOfWeek
      val isWe = dow == java.time.DayOfWeek.SATURDAY || dow == java.time.DayOfWeek.SUNDAY
      assert(r.getLong(1) === (if (isWe) 1L else 0L), s"${r.getString(0)}: weekend flag")
    }
  }
}
