package graft.engine.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(text, n)` — the distinct word n-gram shingles of `lower(text)`
  * split on single spaces, as one native expression.
  *
  * Replaces the interpreted chain
  * `array_distinct(transform(sequence(0, greatest(size(toks)-n, 0)),
  * i -> concat_ws(' ', slice(toks, i+1, n))))` over
  * `toks = split(lower(text), " ")`, which Spark evaluates per element with a
  * lambda interpreter and three intermediate arrays per row. Semantics are
  * replicated exactly, including the edge cases the chain implies:
  * split keeps leading/internal/trailing empty tokens (regex limit -1), a
  * document with fewer than n tokens yields its single shorter shingle, and
  * distinct keeps first-occurrence order.
  *
  * The fused loop is what a 100 TB dedup pass spends its CPU on, so it runs
  * as straight-line Java inside whole-stage codegen (the generated code calls
  * [[Shingles.compute]] — one virtual call per row, zero lambda dispatch).
  */
case class Shingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    Shingles.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"${ev.value} = graft.engine.expr.Shingles.compute($t, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Shingles {
  private val emptyShingle: ArrayData =
    new GenericArrayData(Array[Any](UTF8String.fromString("")))

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // n = 0 mirrors the HOF chain (every slice is empty → one "" shingle);
    // negative n is an error there too, just a clearer one here
    if (n == 0) return emptyShingle
    require(n > 0, s"shingles: n must be non-negative, got $n")
    // UTF8String.toLowerCase is exactly Spark's lower(); splitting on the
    // single byte 0x20 equals regex-split " " with limit -1 (a space byte
    // never occurs inside a multi-byte UTF-8 sequence).
    val s = text.toLowerCase.toString
    var tokCount = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') tokCount += 1; i += 1 }
    val starts = new Array[Int](tokCount + 1)
    var t = 1
    i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(tokCount) = s.length + 1
    val seen = new java.util.LinkedHashSet[String]()
    val last = math.max(tokCount - n, 0)
    var g = 0
    while (g <= last) {
      val end = math.min(g + n, tokCount)
      // tokens g..end-1 joined with ' ' are exactly the substring between the
      // first token's start and the last token's end (separators included)
      seen.add(s.substring(starts(g), starts(end) - 1))
      g += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}
