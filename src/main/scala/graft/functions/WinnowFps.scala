package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole winnowing kernel as one native expression: k-gram md5 hashes (top
  * 60 bits), sliding w-window minima over full windows, first-occurrence
  * dedup — `array<bigint>` of the document's fingerprints in a single
  * primitive pass.
  *
  * Semantically identical to the composed form
  * `array_distinct(sliding_min(transform(sequence, i → conv(md5(substr)))))`
  * — pinned by spec — but the transform chain is CodegenFallback: every
  * position pays interpreted dispatch through a 6-node expression tree plus
  * a UTF8String slice and hex-string round trip. Here codegen emits ONE
  * call to [[WinnowKernel.fingerprints]] per row; the kernel walks the
  * text's code-point boundaries (Spark's `substr` counts code points, so
  * surrogate pairs must not split), reuses a single MessageDigest, and
  * reads the top 60 bits straight from the digest bytes (= the first 15
  * hex digits the conv() form parses).
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"need positive k/w, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowKernel.fingerprints($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFps {
  def apply(text: Column, k: Int, w: Int): Column =
    Native.column(WinnowFps(Native.expression(text), k, w))
}

object WinnowKernel {

  /** See [[WinnowFps]]. Returns an empty array for texts shorter than k
    * code points (the caller filters those anyway). */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    // code-point boundaries: boundary(i) = UTF-16 offset of code point i
    val cpCount = s.codePointCount(0, s.length)
    if (cpCount < k) return new GenericArrayData(Array.empty[Long])
    val bounds = new Array[Int](cpCount + 1)
    var off = 0
    var i = 0
    while (i < cpCount) {
      bounds(i) = off
      off += Character.charCount(s.codePointAt(off))
      i += 1
    }
    bounds(cpCount) = off
    val nPos = cpCount - (k - 1)
    val hs = new Array[Long](nPos)
    val md = java.security.MessageDigest.getInstance("MD5")
    var p = 0
    while (p < nPos) {
      md.reset()
      md.update(s.substring(bounds(p), bounds(p + k))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      // first 15 hex digits == unsigned big-endian first 8 bytes >>> 4
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      hs(p) = h >>> 4
      p += 1
    }
    // full-window sliding minima (clamped to a single window for short
    // docs), deduped to first occurrence — same contract as
    // array_distinct(SlidingMinI64(...))
    val m = math.max(nPos - w, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < m) {
      var min = Long.MaxValue
      var t = j
      val end = math.min(j + w, nPos)
      while (t < end) { if (hs(t) < min) min = hs(t); t += 1 }
      seen.add(min)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
