package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd `|distinct(a) ∩ distinct(b)|` over two `array<string>`
  * columns — the exact-verify kernel of every shingle-overlap operator
  * (Jaccard and containment dedup: `Dedup.nGramJaccardPairs`,
  * `Dedup.lshContainmentPairs`).
  *
  * Replaces the `size(array_intersect(a, b))` spelling, which materializes
  * the intersection as a fresh array (one allocation + copy per candidate
  * pair, thrown away by `size`) and evaluates `array_intersect`'s generic
  * eval on the hot path. This expression counts in place: hash-set the
  * smaller side, probe the larger, no result array. Semantics are
  * IDENTICAL to the composed form — the count is over DISTINCT common
  * values (array_intersect dedups), a null element present on both sides
  * counts once (array_intersect keeps one null), and a null ARRAY yields
  * null — so the DuckDB oracles' `COUNT(*)` over the joined distinct
  * shingle sets replay unchanged. */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"intersect_count needs array<string> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountKernel.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCountKernel.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_count"
}

object IntersectCount {
  def apply(a: Column, b: Column): Column =
    Native.column(IntersectCount(Native.expression(a), Native.expression(b)))
}

object IntersectCountKernel {
  /** See [[IntersectCount]]. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val (s, l) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = s.numElements()
    if (ns == 0) return 0L
    val set = new java.util.HashSet[AnyRef](ns * 2)
    var sNull = false
    var i = 0
    while (i < ns) {
      if (s.isNullAt(i)) sNull = true else set.add(s.getUTF8String(i))
      i += 1
    }
    var cnt = 0L
    var lNull = false
    val nl = l.numElements()
    var j = 0
    while (j < nl) {
      if (l.isNullAt(j)) lNull = true
      else {
        val v = l.getUTF8String(j)
        // remove-on-hit = count each distinct common value once
        if (set.remove(v)) cnt += 1
      }
      j += 1
    }
    if (sNull && lNull) cnt += 1
    cnt
  }
}
