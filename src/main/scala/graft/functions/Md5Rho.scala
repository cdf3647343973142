package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The HLL register derivation — bucket = first `p` md5 hex digits, ρ =
  * leading-zero bit count of the remaining nibble stream + 1, clamped at
  * `rMax` — as one codegen'd primitive over the digest bytes.
  *
  * Replaces the composed per-row pipeline
  * `substring(h,1,p)` / `substring(h,p+1,32-p)` /
  * `length(regexp_extract(tail, "^(0*)", 1))` /
  * `instr('123456789abcdef', …)` / CASE arithmetic — a REGEX engine pass
  * plus four string ops per key — with one digest and a bit walk. The
  * DuckDB oracles keep the hex derivation; value identity is fuzz-pinned
  * in Md5SlicesSpec. Returns struct<bucket: string, rho: int>. */
case class Md5Rho(child: Expression, p: Int, rMax: Int)
    extends UnaryExpression {
  require(p >= 1 && p <= 8, s"bucket hex digits p must be in [1,8], got $p")
  require(rMax >= 1, s"rMax must be positive, got $rMax")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_rho needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", StringType, nullable = false),
    StructField("rho", IntegerType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5RhoKernel.rho(input.asInstanceOf[UTF8String], p, rMax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5RhoKernel.rho($a, $p, $rMax);")

  override protected def withNewChildInternal(newChild: Expression): Md5Rho =
    copy(child = newChild)

  override def prettyName: String = "md5_rho"
}

object Md5Rho {
  def apply(s: Column, p: Int, rMax: Int): Column =
    Native.column(Md5Rho(Native.expression(s), p, rMax))
}

object Md5RhoKernel {

  private val HexChars = "0123456789abcdef".toCharArray

  /** See [[Md5Rho]]. */
  def rho(s: UTF8String, p: Int, rMax: Int): InternalRow = {
    val d = Md5Kernel.digest(s)
    val bucketChars = new Array[Char](p)
    var i = 0
    while (i < p) {
      val b = d(i >> 1) & 0xff
      bucketChars(i) = HexChars(if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    // ρ = leading zero BITS of the nibble stream after the bucket, + 1;
    // all-zero tail (or past-rMax zeros) clamps to rMax — exactly the
    // lead0/instr CASE ladder over hex digits
    var zeros = 0
    var found = false
    i = p
    while (i < 32 && !found) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      if (nib == 0) zeros += 4
      else {
        zeros += (if (nib >= 8) 0 else if (nib >= 4) 1 else if (nib >= 2) 2 else 3)
        found = true
      }
      i += 1
    }
    val r = if (!found) rMax else math.min(zeros + 1, rMax)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(new String(bucketChars)), r))
  }
}
