package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the engine's md5-hex-slice idiom.
  *
  * The composed form `conv(substring(md5(x), pos, len), 16, 10)` is the
  * oracle-replicable hash derivation used by the KMV/CMS/Bloom/AMS sketches,
  * the DSIR bucket hash and the split/cap/shard slot hashes. Its cost per row
  * is one md5 PLUS hex-encoding the digest to a 32-char string PLUS one
  * generic-base `conv` parse per slice — for the d-slice sketches (CMS d=4,
  * Bloom k=3, AMS d=16) the string machinery dominates the arithmetic.
  *
  * These expressions compute the identical values straight from the digest
  * bytes (hex digit i is nibble i of the digest, so the slice value is a
  * shift-or over nibbles): one md5, zero string allocation, whole-stage
  * codegen. Value-identity with the composed form is pinned by fuzz tests
  * (Md5SlicesSpec) so the DuckDB oracles stay untouched.
  *
  * Null semantics match the composed form: NULL in → NULL out (md5, substring
  * and conv all propagate null).
  */
object Md5Kernel {

  private val tlMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5 digest of the UTF-8 bytes of `s` (thread-local digest instance). */
  def digest(s: UTF8String): Array[Byte] = {
    val md = tlMd.get()
    md.reset()
    md.update(s.getBytes)
    md.digest()
  }

  /** hex digits [pos, pos+len) of the digest (1-based pos), parsed base-16.
    * len <= 15 keeps the value positive in a long — same as the conv form. */
  def hexSlice(d: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = pos - 1
    val end = pos - 1 + len
    while (i < end) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  def md5HexLong(s: UTF8String, pos: Int, len: Int): Long =
    hexSlice(digest(s), pos, len)

  def md5HexLongs(s: UTF8String, poss: Array[Int], lens: Array[Int]): GenericArrayData = {
    val d = digest(s)
    val out = new Array[Long](poss.length)
    var i = 0
    while (i < poss.length) { out(i) = hexSlice(d, poss(i), lens(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** bit i of the result = parity of hex digit i+1 (i in 0..31) — the AMS
    * sign source: `1 - 2 * ((mask >> d) & 1)` ==
    * `1 - 2 * (conv(substring(md5(x), d+1, 1), 16, 10) % 2)`. */
  def md5ParityMask(s: UTF8String): Long = {
    val d = digest(s)
    var mask = 0L
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      // hex digit 2i (0-based) = high nibble, 2i+1 = low nibble
      mask |= ((b >>> 4) & 1L) << (2 * i)
      mask |= (b & 1L) << (2 * i + 1)
      i += 1
    }
    mask
  }
}

/** `conv(substring(md5(x), pos, len), 16, 10)` as one codegen'd primitive. */
case class Md5HexLong(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {
  require(pos >= 1 && len >= 1 && pos - 1 + len <= 32,
    s"slice [$pos, +$len) must stay inside the 32 md5 hex digits")
  require(len <= 15, s"len $len would overflow a positive long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hex_long needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5Kernel.md5HexLong(input.asInstanceOf[UTF8String], pos, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Kernel.md5HexLong($a, $pos, $len);")

  override protected def withNewChildInternal(newChild: Expression): Md5HexLong =
    copy(child = newChild)

  override def prettyName: String = "md5_hex_long"
}

object Md5HexLong {
  def apply(s: Column, pos: Int, len: Int): Column =
    Native.column(Md5HexLong(Native.expression(s), pos, len))
}

/** k slices of ONE md5 digest → array<long> — the multi-probe sketches
  * (CMS row hashes, Bloom probe positions) pay one digest instead of a
  * 32-char hex string plus k `conv` parses. */
case class Md5HexLongs(child: Expression, slices: Seq[(Int, Int)])
    extends UnaryExpression {
  slices.foreach { case (pos, len) =>
    require(pos >= 1 && len >= 1 && pos - 1 + len <= 32 && len <= 15,
      s"slice ($pos, $len) invalid")
  }

  private val poss = slices.map(_._1).toArray
  private val lens = slices.map(_._2).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hex_longs needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5Kernel.md5HexLongs(input.asInstanceOf[UTF8String], poss, lens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("poss", poss, "int[]")
    val lRef = ctx.addReferenceObj("lens", lens, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Kernel.md5HexLongs($a, $pRef, $lRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5HexLongs =
    copy(child = newChild)

  override def prettyName: String = "md5_hex_longs"
}

object Md5HexLongs {
  def apply(s: Column, slices: Seq[(Int, Int)]): Column =
    Native.column(Md5HexLongs(Native.expression(s), slices))
}

/** Parity mask of all 32 md5 hex digits — the AMS sign source (see
  * [[Md5Kernel.md5ParityMask]]). */
case class Md5ParityMask(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_parity_mask needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    Md5Kernel.md5ParityMask(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Kernel.md5ParityMask($a);")

  override protected def withNewChildInternal(newChild: Expression): Md5ParityMask =
    copy(child = newChild)

  override def prettyName: String = "md5_parity_mask"
}

object Md5ParityMask {
  def apply(s: Column): Column = Native.column(Md5ParityMask(Native.expression(s)))
}
