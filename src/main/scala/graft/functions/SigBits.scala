package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftnative.Native
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-hyperplane (sign-LSH) signature kernel: the `nBits`-bit signature
  * of a quantized embedding, bit p = (v · signs_p > 0), where `signs_p` is
  * the deterministic md5-parity hyperplane the DuckDB oracles replay in SQL
  * (sign of dim i in plane p = parity of the 60-bit md5 prefix of "p|i").
  *
  * This is the hottest dedup/ANN primitive (every LSH band join starts
  * here). History of the spelling, per the round-11 profile: the
  * one-column-per-plane expression tree (`DotI64(v, slice(typedlit(...)))`
  * summed across `when` terms) cost 10.8 s of dd18's 12.6 s at sf1 in
  * per-plane literal-slice allocations; the round-11 plain-UDF loop fixed
  * that but boxed every element through `Seq[Long]`. This expression keeps
  * the one-primitive-loop shape AND stays inside whole-stage codegen: the
  * generated code calls [[SigBitsKernel.signature]] directly on the
  * unboxed `ArrayData` buffer, no row-level boxing, no interpreted-eval
  * dispatch — the same ladder step `DotI64`/`MinhashSigs`/`WinnowFps`
  * already occupy.
  *
  * The sign matrix is a pure function of (nBits) so the kernel caches it
  * per JVM keyed by nBits — no driver-serialized state rides the plan.
  * Semantics match the UDF it replaces bit-for-bit: vectors wider than
  * [[SigBitsKernel.MaxDims]] raise a per-row error (silent zip-against-
  * nulls would collapse wide vectors into signature 0 and degenerate the
  * band join to n²); null elements contribute 0 to the plane dot, and a
  * null array yields null.
  */
case class SigBits(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sig_bits needs array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SigBitsKernel.signature(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SigBitsKernel.signature($a, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): SigBits =
    copy(child = newChild)

  override def prettyName: String = "sig_bits"
}

object SigBits {
  def apply(v: Column, nBits: Int): Column =
    Native.column(SigBits(Native.expression(v), nBits))
}

object SigBitsKernel {
  /** Vector width the derived hyperplanes cover (= `Ann.MaxLshDims`). */
  val MaxDims = 1024

  /** Deterministic hyperplane signs for plane p — identical derivation to
    * the original driver-side builder (md5 of "p|i", 15-hex-digit prefix
    * parity), so every existing LSH oracle hash-matches unchanged. */
  private def planeSigns(p: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(MaxDims) { i =>
      md.reset()
      val hex = md.digest(s"$p|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L else -1L
    }
  }

  // per-JVM matrix cache: executors derive each nBits-matrix once
  // (nBits ≤ 63 planes × 1024 dims = at most ~516 KB per distinct nBits)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Long]]]()

  private def matrix(nBits: Int): Array[Array[Long]] =
    cache.computeIfAbsent(nBits, n => Array.tabulate(n)(planeSigns))

  /** See [[SigBits]]. */
  def signature(v: ArrayData, nBits: Int): Long = {
    val n = v.numElements()
    if (n > MaxDims)
      throw new IllegalArgumentException(
        s"embedding wider than $MaxDims dims (got $n) " +
          "unsupported by the precomputed LSH planes")
    val signs = matrix(nBits)
    var sig = 0L
    var p = 0
    while (p < nBits) {
      val s = signs(p)
      var acc = 0L
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) acc += v.getLong(i) * s(i)
        i += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}
