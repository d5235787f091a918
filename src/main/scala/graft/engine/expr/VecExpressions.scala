package graft.engine.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst vector kernels over `array<float>` columns.
  *
  * These replace the 64-term unrolled `element_at` chains in
  * [[graft.engine.VectorKernels]]: one expression node whose codegen is a
  * tight primitive loop over the underlying `ArrayData` — no per-element
  * expression-tree cost at optimization time (the unrolled form made
  * Catalyst chew through 192-node trees per kernel) and a straight-line
  * float loop at runtime inside whole-stage codegen.
  *
  * Numeric parity: the loop accumulates in ascending index order with a
  * double accumulator starting at 0.0 — exactly the left-associative sum the
  * unrolled chain, the `aggregate(zip_with(...))` fold, and DuckDB's
  * ascending list evaluation produce, so oracle hashes are unchanged.
  */
abstract class FloatVecFold extends BinaryExpression with ImplicitCastInputTypes {
  // Seq[DataType] refines Seq[AbstractDataType] (AbstractDataType is
  // private[sql] in Spark 4, so it cannot be named here)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for one loop step: accumulate into `acc` from `x`/`y` at `i`. */
  protected def stepCode(x: String, y: String): String
  /** Scala evaluation of one step (interpreted fallback — same math). */
  protected def step(a: ArrayData, b: ArrayData, i: Int): Double

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += step(x, y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${stepCode(s"((double)$x.getFloat($i))", s"((double)$y.getFloat($i))")};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σᵢ aᵢ·bᵢ (dot product; `fvec_dot(a, a)` is the squared norm). */
case class FVecDot(left: Expression, right: Expression) extends FloatVecFold {
  override protected def stepCode(x: String, y: String): String = s"$x * $y"
  override protected def step(a: ArrayData, b: ArrayData, i: Int): Double =
    a.getFloat(i).toDouble * b.getFloat(i).toDouble
  override def prettyName: String = "fvec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ (aᵢ−bᵢ)² (squared L2 distance). */
case class FVecL2Sq(left: Expression, right: Expression) extends FloatVecFold {
  override protected def stepCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def step(a: ArrayData, b: ArrayData, i: Int): Double = {
    val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
    d * d
  }
  override def prettyName: String = "fvec_l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension installing the kernels as SQL functions (`fvec_dot`,
  * `fvec_l2sq`) — callable from `functions.call_function` and `spark.sql`. */
object GraftExtensions {
  def install(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FVecDot].getName, "fvec_dot"),
      (args: Seq[Expression]) => FVecDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("fvec_l2sq"),
      new ExpressionInfo(classOf[FVecL2Sq].getName, "fvec_l2sq"),
      (args: Seq[Expression]) => FVecL2Sq(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => PqAdc.fromArgs(args)))
    e.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => Shingles(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_fps"),
      new ExpressionInfo(classOf[RollingHashFps].getName, "rolling_fps"),
      (args: Seq[Expression]) =>
        if (args.length == 1) RollingHashFps(args(0))
        else RollingHashFps(args(0), args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"rolling_fps window must be an integer literal, got $other")
        })))
    e.injectFunction((
      FunctionIdentifier("lcp_count"),
      new ExpressionInfo(classOf[LcpCount].getName, "lcp_count"),
      (args: Seq[Expression]) => LcpCount(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "intersect_count"),
      (args: Seq[Expression]) => IntersectCount(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(
        classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (args: Seq[Expression]) => TokenStats(args(0))))
    e.injectFunction((
      FunctionIdentifier("freq_sketch"),
      new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
      (args: Seq[Expression]) => FreqSketch.fromArgs(args)))
    e.injectFunction((
      FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (args: Seq[Expression]) => TopKPairs.fromArgs(args)))
    // whole-operator extension: native as-of join (graft.plans.AsOfJoinPlan)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
