package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Whole-document SimHash in one pass: term frequencies from the token
  * array, each distinct token hashed once (top 60 md5 bits — the same
  * `conv(substring(md5(tok), 1, 15), 16, 10)` derivation the oracle
  * replicates), tf-weighted bit votes, fingerprint = the positive-vote
  * bits. NULL for an empty/all-null token array (the caller drops those
  * rows — a doc with no tokens must stay absent, exactly like the
  * explode+groupBy formulation it replaces).
  *
  * The dataflow win is structural, not just constant-factor: the composed
  * form shuffles twice per corpus (tf on (doc, token), votes on doc);
  * this is a zero-shuffle map-side projection, so at 100 TB the SimHash
  * pass costs one scan. */
case class SimhashOf(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"simhash bits must be in [1, 60], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_of needs array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |java.lang.Long ${ev.value}Box = graft.functions.SimhashKernel.simhash($a, $bits);
      |if (${ev.value}Box == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}Box.longValue(); }
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimhashOf =
    copy(child = newChild)

  override def prettyName: String = "simhash_of"
}

object SimhashOf {
  def apply(tokens: Column, bits: Int): Column =
    Native.column(SimhashOf(Native.expression(tokens), bits))
}

object SimhashKernel {
  /** See [[SimhashOf]]. Null token elements are skipped; returns null when
    * no usable token exists. */
  def simhash(tokens: ArrayData, bits: Int): java.lang.Long = {
    val n = tokens.numElements()
    if (n == 0) return null
    val tf = new java.util.HashMap[String, Array[Int]]()
    var i = 0
    var any = false
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        any = true
        val t = tokens.getUTF8String(i).toString
        val c = tf.get(t)
        if (c == null) tf.put(t, Array(1)) else c(0) += 1
      }
      i += 1
    }
    if (!any) return null
    val votes = new Array[Long](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      md.update(e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4 // top 60 bits = first 15 hex digits
      val w = e.getValue()(0).toLong
      var bit = 0
      while (bit < bits) {
        if (((h >> bit) & 1L) == 1L) votes(bit) += w else votes(bit) -= w
        bit += 1
      }
    }
    var fp = 0L
    var bit = 0
    while (bit < bits) {
      if (votes(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
