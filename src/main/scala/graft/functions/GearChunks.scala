package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries by gear rolling hash (the FastCDC /
  * LBFS family): per code point `h = (2·h + gear(c)) mod 2^62`, and a chunk
  * ends after position i when `h_i mod 2^maskBits == 0`. Returns the sorted
  * 1-based END positions of every chunk (the final position `len` always
  * closes the last chunk).
  *
  * Unlike fixed-grid chunking, an insertion only reshuffles boundaries
  * inside one chunk — every later chunk re-aligns, which is what makes
  * chunk-hash dedup robust to edits (the storage-dedup counterpart of the
  * dd9/dd13 token-grid operators).
  *
  * The gear value of code point c is the top 60 bits of md5(decimal string
  * of c) — the repo-wide md5-derived randomness convention, reproduced
  * verbatim by the DuckDB oracle. Because 2^k·g ≡ 0 (mod 2^62) for k ≥ 62,
  * the rolling recurrence equals a pure 62-term windowed sum
  * `h_i = Σ_k g_{i−k}·2^k mod 2^62` — a per-position closed form with no
  * running state, which is exactly how the oracle replays it (a bounded
  * window join), and why boundaries need no reset: the hash forgets bytes
  * 62 positions back on its own.
  */
case class GearChunks(child: Expression, maskBits: Int) extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 32,
    s"maskBits must be in [1,32], got $maskBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_chunks needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GearKernel.chunkEnds(input.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GearKernel.chunkEnds($s, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)

  override def prettyName: String = "gear_chunks"
}

object GearChunks {
  def apply(text: Column, maskBits: Int): Column =
    Native.column(GearChunks(Native.expression(text), maskBits))
}

object GearKernel {

  private val Mask62 = (1L << 62) - 1

  /** gear(c) for code points 0..255 precomputed; larger code points (rare —
    * the corpora here are ASCII) fall back to a per-call digest. */
  private val gearTable: Array[Long] = Array.tabulate(256)(gearOf)

  private def gearOf(c: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(String.valueOf(c)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    // top 60 bits == the first 15 hex digits the oracle's conv() parses
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** See [[GearChunks]]. Positions are 1-based code-point indexes; the
    * final `cpCount` end is always present; empty text → empty array. */
  def chunkEnds(text: UTF8String, maskBits: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val chunkMask = (1L << maskBits) - 1
    val ends = new java.util.ArrayList[Integer]()
    var h = 0L
    var off = 0   // UTF-16 offset
    var cp = 0    // code-point index
    while (off < n) {
      val c = s.codePointAt(off)
      off += Character.charCount(c)
      cp += 1
      val g = if (c < 256) gearTable(c) else gearOf(c)
      h = (((h << 1) & Mask62) + g) & Mask62
      if ((h & chunkMask) == 0L && off < n) ends.add(cp)
    }
    ends.add(cp) // the last chunk always closes at the end of the text
    val out = new Array[Int](ends.size)
    var i = 0
    while (i < out.length) { out(i) = ends.get(i); i += 1 }
    new GenericArrayData(out)
  }
}
