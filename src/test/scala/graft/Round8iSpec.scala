package graft

import org.scalatest.funsuite.AnyFunSuite

/** x198 5-fold Chi-CS cross-validation pinned by a full naive in-JVM
  * replay at smoke scale: fold hash, per-model cost vector, CS-PCF rule
  * weights (exact BigDecimal sums of the same 12-dp-rounded terms),
  * conflict resolution, winning-rule classification of the held-out fold,
  * and the per-fold confusion — the complete reference protocol run
  * sequentially and compared cell by cell. Double ops mirror the engine's
  * operation order (x−c, abs, /w, 1−·, max 0; round via scala BigDecimal
  * HALF_UP — the same call Spark's Round makes), so equality is exact. */
class Round8iSpec extends AnyFunSuite {
  import TestSpark.{spark, sfSmoke}
  import org.apache.spark.sql.functions._
  import graft.engine.Tables
  import graft.queries.Crossval

  private val HALF_UP = BigDecimal.RoundingMode.HALF_UP

  private def mu(x: Double, c: Double, w: Double): Double =
    math.max(0.0, 1.0 - math.abs(x - c) / w)
  private val C1 = Array(1.0, 25.5, 50.0); private val W1 = 24.5
  private val C2 = Array(0.0, 0.05, 0.1);  private val W2 = 0.05
  private def argmax(ms: Array[Double]): Int =
    if (ms(0) >= ms(1) && ms(0) >= ms(2)) 0 else if (ms(1) >= ms(2)) 1 else 2

  private case class Ex(x1: Double, x2: Double, cls: Int, a1: Int, a2: Int, fold: Int)

  private lazy val examples: Seq[Ex] =
    Tables.lineitem(spark, sfSmoke)
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
              col("l_quantity"), col("l_discount"), col("l_extendedprice"))
      .collect().toSeq.map { r =>
        val (ok, ln) = (r.getLong(0), r.getLong(1))
        val (x1, x2) = (r.getDouble(2), r.getDouble(3))
        val cls = if (r.getDouble(4) > 95000) 1 else 0
        val fold = (((ok % 100000000L) * 8L + ln) * 2654435761L % 1000000007L % 5L).toInt
        Ex(x1, x2, cls,
           argmax(C1.map(c => mu(x1, c, W1))), argmax(C2.map(c => mu(x2, c, W2))), fold)
      }

  /** Naive rule base (R3–R7) on an explicit training set. */
  private def naiveRuleBase(train: Seq[Ex], useCost: Boolean): Seq[(Int, Int, Int, Double)] = {
    val n1 = train.count(_.cls == 1).toLong
    val n0 = train.size - n1
    val (mn, mx) = (math.min(n0, n1), math.max(n0, n1))
    def cost(cls: Int): Double =
      if (!useCost) 1.0
      else { val n = if (cls == 1) n1 else n0; if (n == mn) mx * 1.0 / n else 1.0 }
    val ants = train.map(e => (e.a1, e.a2, e.cls)).distinct
    ants.groupBy { case (a1, a2, _) => (a1, a2) }.toSeq.flatMap {
      case ((a1, a2), cands) =>
        val weighted = cands.map { case (_, _, rcls) =>
          var wMatch = BigDecimal(0); var wAll = BigDecimal(0)
          for (e <- train) {
            val t = BigDecimal(cost(e.cls) * mu(e.x1, C1(a1), W1) * mu(e.x2, C2(a2), W2))
              .setScale(12, HALF_UP)
            wAll += t; if (e.cls == rcls) wMatch += t
          }
          (rcls, wMatch, wAll)
        }.filter(_._3 > 0).map { case (rcls, wm, wa) =>
          (rcls, (wm * 2 - wa).setScale(6, HALF_UP).toDouble / wa.setScale(6, HALF_UP).toDouble)
        }
        if (weighted.isEmpty) Nil
        else {
          val (rcls, rw) = weighted.minBy { case (c, w) => (-w, c) }
          if (rw > 0) Seq((a1, a2, rcls, rw)) else Nil
        }
    }
  }

  /** Winning (rule, score) for one example under the x201 total tie order
    * (score desc, rcls, a1, a2). */
  private def naiveWin(rb: Seq[(Int, Int, Int, Double)], e: Ex): ((Int, Int, Int, Double), Double) =
    rb.map { case r @ (a1, a2, _, rw) =>
      (r, BigDecimal(mu(e.x1, C1(a1), W1) * mu(e.x2, C2(a2), W2) * rw)
            .setScale(12, HALF_UP).toDouble)
    }.minBy { case ((a1, a2, rcls, _), s) => (-s, rcls, a1, a2) }

  /** Naive Chi-CS chain on explicit train/test sets: per-test-example
    * winning-class predictions in input order. */
  private def naivePredict(train: Seq[Ex], test: Seq[Ex], useCost: Boolean): Seq[Int] = {
    val rb = naiveRuleBase(train, useCost)
    test.map(e => naiveWin(rb, e)._1._3)
  }

  /** Naive per-model chain: returns (tp, tn, fp, fn) of the held-out fold. */
  private def naiveFold(m: Int): (Long, Long, Long, Long) = {
    val train = examples.filter(_.fold != m)
    val test = examples.filter(_.fold == m)
    var (tp, tn, fp, fn) = (0L, 0L, 0L, 0L)
    for ((e, pred) <- test.zip(naivePredict(train, test, useCost = true))) {
      (e.cls, pred) match {
        case (1, 1) => tp += 1; case (0, 0) => tn += 1
        case (0, 1) => fp += 1; case _ => fn += 1
      }
    }
    (tp, tn, fp, fn)
  }

  private lazy val got: Map[Long, (Long, Long, Long, Long, Long, Double, Double)] =
    Crossval.x198(spark, sfSmoke).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
                       r.getLong(5), r.getDouble(6), r.getDouble(7))
    }.toMap

  test("x198 reads the fact table once — the checkpoint discipline holds") {
    val df = graft.queries.Crossval.x198(spark, sfSmoke)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the one parquet scan happens inside the eager localCheckpoint job;
    // the returned plan must read ONLY the checkpointed aggregate (a
    // regression here re-scans lineitem once per consumer — measured 8x)
    assert(!plan.contains("FileScan") && !plan.toLowerCase.contains("scan parquet"),
      s"fact-table scan leaked back into the CV plan:\n${plan.take(2000)}")
  }

  test("x198 covers all five folds and partitions the example set") {
    assert(got.keySet === (0L until 5L).toSet)
    val total = Tables.lineitem(spark, sfSmoke).count()
    assert(got.values.map(_._1).sum === total)
    // the prime-mod hash must spread folds roughly evenly (±25% of n/5)
    val per = total / 5.0
    got.values.foreach(v => assert(math.abs(v._1 - per) < per * 0.25, s"unbalanced: $v"))
  }

  test("x198 equals the naive sequential 5-fold Chi-CS protocol") {
    for (m <- 0 until 5) {
      val (tp, tn, fp, fn) = naiveFold(m)
      val (nTest, gtp, gtn, gfp, gfn, acc, gm) = got(m.toLong)
      assert((gtp, gtn, gfp, gfn) === ((tp, tn, fp, fn)), s"fold $m confusion")
      assert(nTest === tp + tn + fp + fn, s"fold $m n_test")
      val accN = BigDecimal((tp + tn) * 1.0 / (tp + tn + fp + fn)).setScale(6, HALF_UP).toDouble
      val gmN = BigDecimal(math.sqrt((tp * 1.0 / (tp + fn)) * (tn * 1.0 / (tn + fp))))
        .setScale(6, HALF_UP).toDouble
      assert(acc === accN, s"fold $m accuracy")
      assert(gm === gmN, s"fold $m gm")
    }
  }

  test("x199 equals the naive paired McNemar recount") {
    val predsCs = naivePredict(examples, examples, useCost = true)
    val predsBase = naivePredict(examples, examples, useCost = false)
    var (n11, n10, n01, n00) = (0L, 0L, 0L, 0L)
    for (((e, pc), pb) <- examples.zip(predsCs).zip(predsBase)) {
      (pc == e.cls, pb == e.cls) match {
        case (true, true)  => n11 += 1; case (true, false) => n10 += 1
        case (false, true) => n01 += 1; case _ => n00 += 1
      }
    }
    val r = graft.queries.ChiMl.x199(spark, sfSmoke).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
           ((n11, n10, n01, n00)))
    val num = (math.abs(n10 - n01) - 1L) * (math.abs(n10 - n01) - 1L)
    val chi2 = BigDecimal(num * 1.0 / (n10 + n01)).setScale(6, HALF_UP).toDouble
    assert(r.getDouble(4) === chi2)
    assert(r.getBoolean(5) === (num * 1.0 / (n10 + n01) > 3.841))
    // the discordant mass must be non-empty at smoke scale, or the test
    // (and the operator) would be vacuous
    assert(n10 + n01 > 0)
  }

  test("x200 equals the naive nested-training learning curve") {
    val test = examples.filter(_.fold == 0)
    val rows = Crossval.x200(spark, sfSmoke).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    for (r <- rows) {
      val t = r.getLong(0).toInt
      val train = examples.filter(e => e.fold >= 1 && e.fold <= t)
      var (tp, tn, fp, fn) = (0L, 0L, 0L, 0L)
      for ((e, pred) <- test.zip(naivePredict(train, test, useCost = true))) {
        (e.cls, pred) match {
          case (1, 1) => tp += 1; case (0, 0) => tn += 1
          case (0, 1) => fp += 1; case _ => fn += 1
        }
      }
      assert(r.getLong(1) === train.size.toLong, s"tier $t n_train")
      assert(r.getLong(2) === test.size.toLong, s"tier $t n_test")
      assert((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ===
             ((tp, tn, fp, fn)), s"tier $t confusion")
    }
    // nested training sets: n_train strictly increases along the curve
    assert(rows.map(_.getLong(1)).toSeq === rows.map(_.getLong(1)).toSeq.sorted)
  }

  test("x201 equals the naive per-rule coverage recount") {
    val rb = naiveRuleBase(examples, useCost = true)
    val won = examples.map(e => (naiveWin(rb, e)._1, e))
      .groupBy(_._1).view.mapValues { es =>
        (es.size.toLong, es.count { case (r, e) => r._3 == e.cls }.toLong)
      }.toMap
    val rows = graft.queries.ChiMl.x201(spark, sfSmoke).collect()
    assert(rows.length === rb.size, "one report row per rule")
    val totalWon = won.values.map(_._1).sum
    for (r <- rows) {
      val key = rb.find(t => t._1 == r.getLong(0) && t._2 == r.getLong(1)).get
      assert(r.getLong(2) === key._3.toLong, s"rule $key class")
      val (nWon, nCorrect) = won.getOrElse(key, (0L, 0L))
      assert(r.getLong(4) === nWon, s"rule $key n_won")
      assert(r.getLong(5) === nCorrect, s"rule $key n_correct")
      if (nWon == 0) assert(r.isNullAt(6), s"rule $key precision must be null")
      else assert(r.getDouble(6) ===
        BigDecimal(nCorrect * 1.0 / nWon).setScale(6, HALF_UP).toDouble)
      assert(r.getDouble(7) ===
        BigDecimal(nWon * 1.0 / totalWon).setScale(6, HALF_UP).toDouble)
    }
    // every example is won by exactly one rule
    assert(rows.map(_.getLong(4)).sum === examples.size.toLong)
  }

  test("x202 equals the naive calibration recount") {
    val rb = naiveRuleBase(examples, useCost = true)
    val scored = examples.map { e =>
      val (r, _) = naiveWin(rb, e)
      val act = BigDecimal(mu(e.x1, C1(r._1), W1) * mu(e.x2, C2(r._2), W2))
        .setScale(12, HALF_UP).toDouble
      val bucket = math.min(math.floor(act * 10).toLong, 9L)
      val p6 = BigDecimal(act * 1e6).setScale(0, HALF_UP).toLong
      (bucket, p6, if (r._3 == e.cls) 1L else 0L)
    }
    val expect = scored.groupBy(_._1).view.mapValues { g =>
      val n = g.size.toLong
      val sp6 = g.map(_._2).sum
      val nc = g.map(_._3).sum
      (n, BigDecimal(sp6 * 1.0 / (n * 1e6)).setScale(6, HALF_UP).toDouble, nc,
       BigDecimal(nc * 1.0 / n).setScale(6, HALF_UP).toDouble)
    }.toMap
    val rows = graft.queries.ChiMl.x202(spark, sfSmoke).collect()
    assert(rows.map(_.getLong(0)).toSet === expect.keySet)
    for (r <- rows) {
      val (n, ms, nc, acc) = expect(r.getLong(0))
      assert(r.getLong(1) === n); assert(r.getDouble(2) === ms)
      assert(r.getLong(3) === nc); assert(r.getDouble(4) === acc)
    }
  }

  test("x204 save/load and x205 keel-train equal the x06 batch twin exactly") {
    val batch = graft.queries.Extras.x06(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((name, df) <- Seq(
        "x204" -> graft.queries.ModelOps.x204(spark, sfSmoke),
        "x205" -> graft.queries.ModelOps.x205(spark, sfSmoke))) {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === batch, s"$name != x06")
    }
    // the x205 artifact really is a KEEL .dat: header present on disk
    // (the keel sink coalesces to ONE flat file — KEEL tools read a file,
    // not a part directory)
    val keelFile = new java.io.File(s"/tmp/graft_keel_${sfSmoke.replaceAll("[^A-Za-z0-9]", "_")}")
    val head = scala.io.Source.fromFile(keelFile).getLines().take(1).toList.head
    assert(head.startsWith("@relation"), s"not a KEEL header: $head")
  }

  test("x206 equals the naive generalized-L chain at L=3 and L=5") {
    // generalized naive Chi-CS: centers/widths computed with the SAME IEEE
    // arithmetic as TriPartition (lo + k*((hi-lo)/(L-1))), majority-class
    // fallback for zero-activation examples (the estimator's policy)
    def runL(l: Int): (Long, Double, Double) = {
      val (lo1, hi1, lo2, hi2) = (1.0, 50.0, 0.0, 0.1)
      val w1 = (hi1 - lo1) / (l - 1); val w2 = (hi2 - lo2) / (l - 1)
      val c1 = Array.tabulate(l)(k => lo1 + k * w1)
      val c2 = Array.tabulate(l)(k => lo2 + k * w2)
      def amax(ms: Array[Double]): Int = {
        for (k <- 0 until l - 1)
          if ((k + 1 until l).forall(j => ms(k) >= ms(j))) return k
        l - 1
      }
      val exs = examples.map(e =>
        (e.x1, e.x2, e.cls, amax(c1.map(c => mu(e.x1, c, w1))),
         amax(c2.map(c => mu(e.x2, c, w2)))))
      val n1 = exs.count(_._3 == 1).toLong; val n0 = exs.size - n1
      val (mn, mx) = (math.min(n0, n1), math.max(n0, n1))
      def cost(cls: Int): Double = {
        val n = if (cls == 1) n1 else n0
        if (n == mn && mn != mx) mx * 1.0 / n else 1.0
      }
      val majority = if (n1 > n0) 1 else 0
      val ants = exs.map(t => (t._4, t._5, t._3)).distinct
      val rb = ants.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((a1, a2), cands) =>
        val weighted = cands.map { case (_, _, rcls) =>
          var wMatch = BigDecimal(0); var wAll = BigDecimal(0)
          for ((x1, x2, cls, _, _) <- exs) {
            val t = BigDecimal(cost(cls) * mu(x1, c1(a1), w1) * mu(x2, c2(a2), w2))
              .setScale(12, HALF_UP)
            wAll += t; if (cls == rcls) wMatch += t
          }
          (rcls, wMatch, wAll)
        }.filter(_._3 > 0).map { case (rcls, wm, wa) =>
          (rcls, (wm * 2 - wa).setScale(6, HALF_UP).toDouble / wa.setScale(6, HALF_UP).toDouble)
        }
        if (weighted.isEmpty) Nil
        else {
          val (rcls, rw) = weighted.minBy { case (c, w) => (-w, c) }
          if (rw > 0) Seq((a1, a2, rcls, rw)) else Nil
        }
      }
      var (tp, tn, fp, fn) = (0L, 0L, 0L, 0L)
      for ((x1, x2, cls, _, _) <- exs) {
        val (bc, bs) = rb.map { case (a1, a2, rcls, rw) =>
          (rcls, BigDecimal(mu(x1, c1(a1), w1) * mu(x2, c2(a2), w2) * rw)
                   .setScale(12, HALF_UP).toDouble)
        }.minBy { case (c, s) => (-s, c) }
        val pred = if (bs > 0) bc else majority
        (cls, pred) match {
          case (1, 1) => tp += 1; case (0, 0) => tn += 1
          case (0, 1) => fp += 1; case _ => fn += 1
        }
      }
      val acc = BigDecimal((tp + tn) * 1.0 / (tp + tn + fp + fn)).setScale(6, HALF_UP).toDouble
      val gm = BigDecimal(math.sqrt((tp * 1.0 / (tp + fn)) * (tn * 1.0 / (tn + fp))))
        .setScale(6, HALF_UP).toDouble
      (rb.size.toLong, acc, gm)
    }
    val rows = graft.queries.ModelOps.x206(spark, sfSmoke).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L, 5L))
    for (r <- rows) {
      val (nr, acc, gm) = runL(r.getLong(0).toInt)
      assert(r.getLong(1) === nr, s"L=${r.getLong(0)} n_rules")
      assert(r.getDouble(2) === acc, s"L=${r.getLong(0)} accuracy")
      assert(r.getDouble(3) === gm, s"L=${r.getLong(0)} gm")
    }
    // finer grid must grow the rule base (9 -> 25 on this data)
    assert(rows(1).getLong(1) > rows(0).getLong(1))
  }

  /** Generic naive Chi-CS train+classify over arbitrary class labels,
    * ranges, and class counts: per-class IR costs (only exact-minimum
    * classes weighted, and only when imbalanced), majority fallback. */
  private def naiveConfusion(exs: Seq[(Double, Double, Int)],
                             lo1: Double, hi1: Double,
                             lo2: Double, hi2: Double): Map[(Long, Long), Long] = {
    val l = 3
    val w1 = (hi1 - lo1) / (l - 1); val w2 = (hi2 - lo2) / (l - 1)
    val c1 = Array.tabulate(l)(k => lo1 + k * w1)
    val c2 = Array.tabulate(l)(k => lo2 + k * w2)
    def amax(ms: Array[Double]): Int = {
      for (k <- 0 until l - 1)
        if ((k + 1 until l).forall(j => ms(k) >= ms(j))) return k
      l - 1
    }
    val lab = exs.map { case (x1, x2, cls) =>
      (x1, x2, cls, amax(c1.map(c => mu(x1, c, w1))), amax(c2.map(c => mu(x2, c, w2))))
    }
    val counts = lab.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (mn, mx) = (counts.values.min, counts.values.max)
    def cost(cls: Int): Double =
      if (counts(cls) == mn && mn != mx) mx * 1.0 / counts(cls) else 1.0
    val majority = counts.toSeq.maxBy { case (c, n) => (n, -c) }._1
    val ants = lab.map(t => (t._4, t._5, t._3)).distinct
    val rb = ants.groupBy(t => (t._1, t._2)).toSeq.flatMap { case ((a1, a2), cands) =>
      val weighted = cands.map { case (_, _, rcls) =>
        var wMatch = BigDecimal(0); var wAll = BigDecimal(0)
        for ((x1, x2, cls, _, _) <- lab) {
          val t = BigDecimal(cost(cls) * mu(x1, c1(a1), w1) * mu(x2, c2(a2), w2))
            .setScale(12, HALF_UP)
          wAll += t; if (cls == rcls) wMatch += t
        }
        (rcls, wMatch, wAll)
      }.filter(_._3 > 0).map { case (rcls, wm, wa) =>
        (rcls, (wm * 2 - wa).setScale(6, HALF_UP).toDouble / wa.setScale(6, HALF_UP).toDouble)
      }
      if (weighted.isEmpty) Nil
      else {
        val (rcls, rw) = weighted.minBy { case (c, w) => (-w, c) }
        if (rw > 0) Seq((a1, a2, rcls, rw)) else Nil
      }
    }
    val out = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for ((x1, x2, cls, _, _) <- lab) {
      val (bc, bs) = rb.map { case (a1, a2, rcls, rw) =>
        (rcls, BigDecimal(mu(x1, c1(a1), w1) * mu(x2, c2(a2), w2) * rw)
                 .setScale(12, HALF_UP).toDouble)
      }.minBy { case (c, s) => (-s, c) }
      val pred = if (bs > 0) bc else majority
      out((cls.toLong, pred.toLong)) += 1L
    }
    out.toMap
  }

  test("x207 equals the naive 3-class chain") {
    val exs = examples.map { e =>
      (e.x1, e.x2, if (e.x1 > 42) 2 else if (e.x1 > 18) 1 else 0)
    }
    val expect = naiveConfusion(exs, 1.0, 50.0, 0.0, 0.1)
    val got = graft.queries.ModelOps.x207(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.keys.map(_._1).toSet === Set(0L, 1L, 2L), "all three classes present")
    assert(got.exists { case ((a, p), _) => a != p }, "confusion must be non-diagonal")
  }

  test("x208 equals the naive auto-ranged chain") {
    val exs = examples.map(e => (e.x1, e.x2, e.cls))
    val (lo1, hi1) = (exs.map(_._1).min, exs.map(_._1).max)
    val (lo2, hi2) = (exs.map(_._2).min, exs.map(_._2).max)
    val expect = naiveConfusion(exs, lo1, hi1, lo2, hi2)
    val got = graft.queries.ModelOps.x208(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("x203 streaming serving equals the x06 batch twin exactly") {
    val streamed = graft.streaming.StreamingOps.x203(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.queries.Extras.x06(spark, sfSmoke).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed.values.sum === examples.size.toLong)
  }
}
