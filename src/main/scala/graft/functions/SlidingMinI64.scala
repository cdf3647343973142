package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sliding-window minimum over an `array<bigint>`: element `j` of the
  * result is `min(arr[j .. j+w-1])`, for the full windows
  * `j ∈ [0, max(n−w, 0)]` (an input shorter than one window degenerates to
  * its global minimum) — the winnowing kernel.
  *
  * The HOF spelling `transform(sequence(0, n−w), j → array_min(slice(...)))`
  * is CodegenFallback: every window pays interpreted dispatch plus a slice
  * allocation, and it was the dominant cost of the winnowing gate. This
  * generates one primitive nested loop, no allocation beyond the output
  * buffer. Input elements must be non-null (the hash arrays it serves are);
  * a null INPUT yields null.
  */
case class SlidingMinI64(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_min_i64 needs array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val m = math.max(n - w, 0) + 1
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var min = Long.MaxValue
      var t = j
      val end = math.min(j + w, n)
      while (t < end) {
        val v = arr.getLong(t)
        if (v < min) min = v
        t += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val end = ctx.freshName("end")
      val min = ctx.freshName("min")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final int $m = java.lang.Math.max($n - $w, 0) + 1;
         |final long[] $out = new long[$n == 0 ? 0 : $m];
         |for (int $j = 0; $j < $out.length; $j++) {
         |  long $min = Long.MAX_VALUE;
         |  final int $end = java.lang.Math.min($j + $w, $n);
         |  for (int $t = $j; $t < $end; $t++) {
         |    final long $v = $a.getLong($t);
         |    if ($v < $min) $min = $v;
         |  }
         |  $out[$j] = $min;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SlidingMinI64 =
    copy(child = newChild)

  override def prettyName: String = "sliding_min_i64"
}

object SlidingMinI64 {
  def apply(arr: Column, w: Int): Column =
    Native.column(SlidingMinI64(Native.expression(arr), w))
}
