package graft.layout

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; Beyer et al.
  * 2007's unbiased estimator) — the third rung of the deterministic sketch
  * family next to [[Sketches]]' HLL and Count-Min. Where HLL keeps a
  * register MAX per bucket, KMV keeps the `k` smallest DISTINCT key hashes;
  * its bonus over HLL is that the sketch doubles as a uniform sample of the
  * key space, which is what the `ks1` quantile gate exploits.
  *
  * Engine-exactness contract (the family discipline):
  *  - randomness = first 15 hex digits of `md5(key)` as a 60-bit integer,
  *    identical in Spark (`conv(hex,16,10)`) and DuckDB (`'0x'||hex` cast);
  *  - the sketch is a deterministic SET (the k smallest distinct hashes),
  *    so any insertion/merge order yields the same array;
  *  - the estimate (k−1)·2^60 / h_k is ONE big-integer division (exact
  *    DECIMAL/HUGEINT in both engines); a sketch smaller than k IS the
  *    distinct hash set, so the estimate degrades to its exact size.
  *
  * Distribution story: [[KmvAgg]] is a typed `Aggregator` registered with
  * `functions.udaf`, so Spark plans it as an ObjectHashAggregate with a
  * map-side partial — every partition reduces its rows into one ≤k-long
  * array locally and the shuffle carries ONE sketch per partition (8·k
  * bytes), never the keys. Merging two sketches = bottom-k of the
  * concatenation, which is why re-applying the same aggregate to exploded
  * sketch values is exactly the distributed merge (`kmv2`) and the
  * incremental fold (`kmv3`, [[graft.Store.kmvIncr]]).
  */
object Kmv {

  /** Default sketch size: relative stderr ≈ 1/√(k−2) ≈ 3.1%. 8 KB a sketch. */
  val K = 1024

  /** 60-bit hash domain size. */
  val Dom: BigInt = BigInt(1) << 60

  /** 60-bit md5-prefix hash of a key, as a non-negative BIGINT. Native
    * digest-slice kernel ([[graft.functions.Md5HexLong]] ≡ the composed
    * `conv(substring(md5(k), 1, 15), 16, 10)` the oracle replicates,
    * fuzz-pinned in Md5SlicesSpec). */
  def hash(key: Column): Column =
    graft.functions.Md5HexLong(key.cast("string"), 1, 15)

  /** DuckDB text of [[hash]]. */
  def hashSql(keyExpr: String): String =
    s"CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Estimate column from a sorted sketch-array column named `skCol`:
    * exact size below k, else (k−1)·2^60 div max-hash. */
  def estimate(skCol: String, k: Int = K): Column = {
    val num = BigInt(k - 1) * Dom
    expr(s"""CASE WHEN size($skCol) < $k THEN CAST(size($skCol) AS BIGINT)
            | ELSE CAST(CAST('$num' AS DECIMAL(38,0)) div
            |           CAST(element_at($skCol, -1) AS DECIMAL(38,0)) AS BIGINT)
            | END""".stripMargin)
  }

  /** DuckDB estimate from `(sz, hk)` = (sketch size, k-th smallest hash). */
  def estimateSql(k: Int = K): String = {
    val num = BigInt(k - 1) * Dom
    s"""CASE WHEN sz < $k THEN sz
       | ELSE CAST(CAST('$num' AS HUGEINT) // CAST(hk AS HUGEINT) AS BIGINT)
       | END""".stripMargin
  }

  /** DuckDB CTE body for the sketch of `keyExpr` over `rel`:
    * `(SELECT DISTINCT h ... ORDER BY h LIMIT k)`. */
  def sketchSql(rel: String, keyExpr: String, k: Int = K): String =
    s"""SELECT DISTINCT ${hashSql(keyExpr)} AS h
       |FROM $rel ORDER BY h LIMIT $k""".stripMargin

  /** The UDAF handle (input = the 60-bit hash column). */
  def agg(k: Int = K): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new KmvAgg(k), Encoders.scalaLong)
}

/** Typed-Aggregator buffer: the k smallest distinct hashes so far, sorted
  * ascending (a case class so the buffer/output ride the public product
  * encoder — the result column is `struct<values: array<bigint>>`). */
final case class KmvBuffer(values: Array[Long])

/** Bottom-k-distinct aggregator. `reduce` is O(1) for the common case (full
  * buffer, hash above the current max — at corpus scale virtually every row
  * after warm-up) and O(k) arraycopy for the rare insert; `merge` is one
  * linear merge-dedup-trim of two sorted arrays. */
final class KmvAgg(k: Int) extends Aggregator[Long, KmvBuffer, KmvBuffer] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: KmvBuffer = KmvBuffer(Array.emptyLongArray)

  override def reduce(b: KmvBuffer, v: Long): KmvBuffer = {
    val a = b.values
    val n = a.length
    if (n == k && v >= a(n - 1)) return b
    val i = java.util.Arrays.binarySearch(a, v)
    if (i >= 0) return b // distinct set: already present
    val ins = -i - 1
    if (ins >= k) return b
    val outLen = math.min(n + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(a, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(a, ins, out, ins + 1, outLen - ins - 1)
    KmvBuffer(out)
  }

  override def merge(x: KmvBuffer, y: KmvBuffer): KmvBuffer = {
    val a = x.values; val b = y.values
    if (a.isEmpty) return y
    if (b.isEmpty) return x
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (b(j) < a(i)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      out(o) = take; o += 1
    }
    KmvBuffer(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }

  override def finish(b: KmvBuffer): KmvBuffer = b
  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
}
