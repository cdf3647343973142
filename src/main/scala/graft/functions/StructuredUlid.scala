package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aruna Structured ULID (reference `core/src/structured_id/layout.rs` —
  * Appendix A.1): `timestamp_ms(48) | placement_handle(20) | bucket(12) |
  * nonce(48)` packed into a 128-bit ULID, canonically encoded as 26-char
  * Crockford base32.
  *
  * Pinned rules:
  *  - canonical decode (`mod.rs:128-139`): strict Crockford alphabet (no
  *    I/L/O/U aliases — the reference's `ulid` crate is strict),
  *    case-insensitive on parse here via uppercase normalization, 26
  *    chars exactly, and the FIRST character must be `0..=7` — the crate
  *    silently truncates the 130th bit, so a canonical encoding never
  *    starts above `7` (overflow otherwise);
  *  - handle zero is reserved and must never be allocated
  *    (REQ-META-ID-FORMAT-001, `layout.rs:24-25`);
  *  - `BucketId::in_strategy_range` (`mod.rs:116-125`): the bucket field
  *    must be `< bucket_count` for the owning strategy.
  */
object StructuredUlid {

  val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private val Digit: Map[Char, Int] =
    Alphabet.zipWithIndex.toMap

  val TimestampShift = 80
  val HandleShift = 60
  val BucketShift = 48
  val ReservedHandle = 0

  def pack(timestampMs: Long, handle: Int, bucket: Int,
      nonce: Long): BigInt =
    (BigInt(timestampMs & ((1L << 48) - 1)) << TimestampShift) |
      (BigInt(handle & ((1 << 20) - 1)) << HandleShift) |
      (BigInt(bucket & 0xfff) << BucketShift) |
      BigInt(nonce & ((1L << 48) - 1))

  def encode(value: BigInt): String = {
    val sb = new StringBuilder(26)
    var k = 25
    while (k >= 0) {
      sb.append(Alphabet(((value >> (5 * k)) & 31).toInt))
      k -= 1
    }
    sb.toString
  }

  /** Canonical decode: Left(error) | Right(value). */
  def decode(s: String): Either[String, BigInt] = {
    if (s == null || s.length != 26) return Left("invalid_length")
    val up = s.toUpperCase
    var v = BigInt(0)
    var i = 0
    while (i < 26) {
      Digit.get(up(i)) match {
        case Some(d) => v = (v << 5) | BigInt(d)
        case None => return Left("invalid_char")
      }
      i += 1
    }
    if (up(0) > '7') Left("overflow") else Right(v)
  }

  def unpack(value: BigInt): (Long, Int, Int, Long) = (
    (value >> TimestampShift).toLong,
    ((value >> HandleShift) & 0xfffff).toInt,
    ((value >> BucketShift) & 0xfff).toInt,
    (value & ((BigInt(1) << 48) - 1)).toLong)

  private val parseUdf = udf { (s: String) =>
    decode(s) match {
      case Left(err) => (err, null.asInstanceOf[java.lang.Long],
        null.asInstanceOf[java.lang.Integer],
        null.asInstanceOf[java.lang.Integer],
        null.asInstanceOf[java.lang.Long])
      case Right(v) =>
        val (t, h, b, n) = unpack(v)
        (null.asInstanceOf[String], java.lang.Long.valueOf(t),
          java.lang.Integer.valueOf(h), java.lang.Integer.valueOf(b),
          java.lang.Long.valueOf(n))
    }
  }

  private val encodeUdf =
    udf { (t: Long, h: Int, b: Int, n: Long) => encode(pack(t, h, b, n)) }

  /** Column: encode fields to the canonical 26-char form. */
  def encodeCol(t: Column, h: Column, b: Column, n: Column): Column =
    encodeUdf(t, h, b, n)

  /** Parse + validate a sid batch: `requests(req_id, sid, bucket_count)`
    * → per-row verdict (invalid_length | invalid_char | overflow |
    * reserved_handle | bucket_out_of_range | ok) and the unpacked
    * fields on ok rows. */
  def validate(requests: DataFrame): DataFrame = {
    val p = parseUdf(col("sid"))
    val parsed = requests.withColumn("__p", p)
    val err = col("__p").getField("_1")
    val h = col("__p").getField("_3")
    val b = col("__p").getField("_4")
    val verdict = when(err.isNotNull, err)
      .when(h === ReservedHandle, "reserved_handle")
      .when(b >= col("bucket_count"), "bucket_out_of_range")
      .otherwise("ok")
    parsed.select(col("req_id"), verdict.as("verdict"),
      when(verdict === "ok", col("__p").getField("_2"))
        .as("timestamp_ms"),
      when(verdict === "ok", h).as("handle"),
      when(verdict === "ok", b).as("bucket"),
      when(verdict === "ok", col("__p").getField("_5")).as("nonce"))
  }
}
