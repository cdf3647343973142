package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's tokenizer — `filter(split(lower(c), "[^a-z0-9]+"), len>0)` —
  * as one codegen'd primitive: lowercase once (the same
  * `UTF8String.toLowerCase` the `lower()` expression applies under the
  * default collation), then a single byte walk emitting maximal `[a-z0-9]`
  * runs as zero-copy `UTF8String` slices. No regex engine, no empty-string
  * intermediates, no separate filter pass.
  *
  * Byte-walk ≡ the codepoint regex because token characters are pure ASCII:
  * every byte of a multi-byte UTF-8 codepoint is ≥ 0x80 and therefore a
  * separator byte, exactly as the codepoint itself is a separator under
  * `[^a-z0-9]`. Unicode lowercasings that PRODUCE ASCII letters (e.g.
  * U+0130 → "i"+U+0307, U+212A → "k") behave identically because the
  * lowercase happens first in both forms. Value identity is fuzz-pinned in
  * AsciiTokensSpec (ASCII, unicode, empties, separators-only), so the
  * oracles' tokenization contract is untouched.
  *
  * This expression sits under EVERY token consumer — the FTS postings
  * build, the tx/qf text-quality gates, the shingle derivations of the
  * dedup family — so at 100 TB it is the single hottest projection in the
  * engine. */
case class AsciiTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ascii_tokens needs string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    AsciiTokensKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AsciiTokensKernel.tokens($a);")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)

  override def prettyName: String = "ascii_tokens"
}

object AsciiTokens {
  def apply(s: Column): Column = Native.column(AsciiTokens(Native.expression(s)))
}

object AsciiTokensKernel {

  /** See [[AsciiTokens]]. */
  def tokens(s: UTF8String): GenericArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes // may copy when the UTF8String is offset
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val c = bytes(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
