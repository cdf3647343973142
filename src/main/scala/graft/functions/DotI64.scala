package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd i64 dot product over two `array<bigint>` columns —
  * the hot kernel of every quantized-vector operator (ANN cosine/dot,
  * embedding near-dup, PQ assignment).
  *
  * The `functions`-composed form (`aggregate(zip_with(a, b, _*_), 0, _+_)`)
  * is correct but falls out of whole-stage codegen: higher-order functions
  * are `CodegenFallback`, so every row pays interpreted-eval dispatch plus
  * an intermediate product array. This expression generates a primitive
  * `long` loop over the two `ArrayData` buffers inside the stage — no
  * allocation, no virtual calls — which is exactly the brief's preference
  * ladder: a native `Expression` with `doGenCode` beating both the HOF
  * chain and any UDF.
  *
  * Null semantics match the HOF form exactly: a null array, ANY null
  * element, or a LENGTH MISMATCH yields null (zip_with pads the shorter
  * array with nulls, and the null products poison aggregate's running
  * sum). Matching the mismatch case too is what makes the session-wide
  * [[graft.RewriteHofDot]] rewrite unconditionally sound.
  */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  // manual type check: ExpectsInputTypes' AbstractDataType is private[sql]
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 needs array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_i64"
}

object DotI64 {
  /** Column-level entry point: `dotI64(a, b)`. */
  def apply(a: Column, b: Column): Column =
    Native.column(DotI64(Native.expression(a), Native.expression(b)))

  /** Squared L2 norm as a self-dot. */
  def normSq(a: Column): Column = apply(a, a)
}
