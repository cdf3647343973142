package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** md5-MinHash signature kernel: from a document's shingle array, the `k`
  * signature components `sig_i = min over shingles of (h1 XOR (h2 >>> i))`,
  * where h1/h2 are the two 60-bit halves of the shingle's md5 (hex digits
  * 1–15 and 17–31 — exactly what the composed
  * `conv(substring(md5(sh), …), 16, 10)` form parses, so the DuckDB
  * oracles' derivation is untouched). One md5 and `k` long ops per shingle
  * in a single primitive pass; the HOF chain this replaces evaluated an
  * interpreted struct per shingle plus `k` separate array scans, and was
  * the dominant CPU of every MinHash gate. Empty input → empty output (the
  * callers' shingle-less-doc filter contract). */
case class MinhashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 60, s"signature size k must be in [1, 60], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.signatures(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashKernel.signatures($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinhashSigs {
  def apply(shingles: Column, k: Int): Column =
    Native.column(MinhashSigs(Native.expression(shingles), k))
}

object MinhashKernel {
  /** See [[MinhashSigs]]. Null shingle elements are skipped. */
  def signatures(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var s = 0
    var any = false
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        any = true
        md.reset()
        md.update(shingles.getUTF8String(s).getBytes)
        val d = md.digest()
        // h1 = hex digits 1..15  = unsigned BE bytes 0..7  >>> 4
        // h2 = hex digits 17..31 = unsigned BE bytes 8..15 >>> 4
        var hi = 0L; var lo = 0L
        var b = 0
        while (b < 8) { hi = (hi << 8) | (d(b) & 0xffL); b += 1 }
        while (b < 16) { lo = (lo << 8) | (d(b) & 0xffL); b += 1 }
        val h1 = hi >>> 4
        val h2 = lo >>> 4
        var i = 0
        while (i < k) {
          val v = h1 ^ (h2 >>> i)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      s += 1
    }
    if (!any) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(mins)
  }
}
