package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact q-quantile boundaries via the two-phase histogram order statistic —
  * x171/x176's shape factored for reuse (x190 takes quintiles of three
  * metrics through it). boundary_d = smallest value whose ascending
  * cumulative count reaches ⌈d·n/q⌉, d = 1..q−1. Phase 1 buckets values
  * into W-wide ranges and locates the ≤(q−1) buckets holding any target by
  * cumulative count; phase 2 rescans ONLY those buckets and reads every
  * boundary off one bounded per-value cumulative. Everything BIGINT.
  *
  * 100 TB: one histogram aggregate + one bucket-pruned rescan serve all q−1
  * boundaries — no global sort, no percentile_approx inexactness. The
  * unpartitioned windows run over the ≤⌈range/W⌉-row bucket aggregate and
  * the ≤(q−1)·W-value selected set, never over rows (RegistryGuardSpec's
  * bounded-window rule).
  *
  * Caller contract: `values` exposes ONE non-negative BIGINT column `v`
  * (non-negative because Spark's `DIV` truncates toward zero while the
  * oracle's `//` floors — they only agree on non-negatives).
  */
object Quantiles {
  /** (d, boundary) rows, d = 1..q−1. */
  def boundaries(values: DataFrame, w: Long, q: Int): DataFrame = {
    val h1 = values.groupBy(expr(s"v DIV $w").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = h1
      .withColumn("before", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
    val targets = cum.select(col("n")).limit(1)
      .select(explode(sequence(lit(1), lit(q - 1))).as("d"), col("n"))
      .select(col("d").cast(LongType).as("d"),
              expr(s"(d * n + ${q - 1}) DIV $q").as("target"))
    val selected = cum.join(broadcast(targets),
        col("before") < col("target") &&
        col("target") <= col("before") + col("cnt"))
      .select("b", "before").distinct()
    val wv = Window.partitionBy("b").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    values.join(broadcast(selected), expr(s"v DIV $w") === col("b"))
      .groupBy("b", "v", "before")
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("cum", col("before") + sum(col("vcnt")).over(wv))
      .join(broadcast(targets), col("cum") >= col("target"))
      .groupBy("d")
      .agg(min(col("v")).as("boundary"))
  }

  /** Driver-side literal vector (exactly q−1 values — the x180
    * bounded-collect discipline: the result is quantile-count-sized, never
    * data-sized, so it inlines into the task binary as map arithmetic). */
  def boundaryArray(values: DataFrame, w: Long, q: Int): Array[Long] =
    boundaries(values, w, q).orderBy("d").collect().map(_.getLong(1))

  /** MULTI-METRIC variant: `values` exposes (g: metric key, v: BIGINT ≥ 0);
    * each metric gets its own bucket width from `widths`. ONE histogram
    * shuffle and ONE bucket-pruned rescan serve every metric's q−1
    * boundaries — x190 runs its three RFM metrics through a single pass
    * instead of three sequential boundary jobs (measured: the three
    * single-metric runs were the slowest key in the whole bench; sharing
    * the scan cuts the driver round trips from 3 collects + 6 jobs to 1
    * collect + 2 jobs). Same order statistic per metric, digit-identical
    * boundaries. */
  def boundariesMulti(values: DataFrame, widths: Map[String, Long],
                      q: Int): DataFrame = {
    val ws = widths.toSeq
    val wExpr = ws.tail
      .foldLeft(when(col("g") === ws.head._1, lit(ws.head._2))) {
        case (acc, (g, w)) => acc.when(col("g") === g, lit(w))
      }.otherwise(lit(1L))
    val h1 = values.withColumn("w", wExpr)
      .groupBy(col("g"), expr("v DIV w").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = h1
      .withColumn("before", coalesce(sum(col("cnt")).over(wc), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val targets = cum.select("g", "n").distinct()
      .select(col("g").as("tg"),
              explode(sequence(lit(1), lit(q - 1))).as("d"), col("n"))
      .select(col("tg"), col("d").cast(LongType).as("d"),
              expr(s"(d * n + ${q - 1}) DIV $q").as("target"))
    val selected = cum.join(broadcast(targets),
        col("g") === col("tg") &&
        col("before") < col("target") &&
        col("target") <= col("before") + col("cnt"))
      .select(col("g").as("sg"), col("b").as("sb"), col("before")).distinct()
    val wv = Window.partitionBy("g", "sb").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    values.withColumn("w", wExpr)
      .join(broadcast(selected),
        col("g") === col("sg") && expr("v DIV w") === col("sb"))
      .groupBy(col("g"), col("sb"), col("v"), col("before"))
      .agg(count(lit(1)).as("vcnt"))
      .withColumn("cum", col("before") + sum(col("vcnt")).over(wv))
      .join(broadcast(targets),
        col("g") === col("tg") && col("cum") >= col("target"))
      .groupBy("g", "d")
      .agg(min(col("v")).as("boundary"))
  }

  /** One collect for every metric's literal boundary vector. */
  def boundaryArrays(values: DataFrame, widths: Map[String, Long],
                     q: Int): Map[String, Array[Long]] =
    boundariesMulti(values, widths, q).orderBy("g", "d").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2))).toMap
}
