package graft.functions

/** ULID codec (26-char Crockford base32: 48-bit timestamp ms + 80-bit
  * randomness). The reference uses ULIDs for documents/events/versions
  * everywhere (sortable, encode creation time) — string sort order must
  * match byte order, which Crockford base32 guarantees.
  */
object Ulid {

  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private val Decode: Array[Byte] = {
    val d = Array.fill[Byte](128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) =>
      d(c) = i.toByte
      d(c.toLower) = i.toByte
    }
    // Crockford aliases
    Seq('O' -> 0, 'o' -> 0, 'I' -> 1, 'i' -> 1, 'L' -> 1, 'l' -> 1).foreach {
      case (c, v) => d(c) = v.toByte
    }
    d
  }

  /** Deterministic ULID from (timestampMs, entropy) — entropy supplied by the
    * caller so ids are reproducible in tests and idempotent pipelines. */
  def apply(timestampMs: Long, entropy: BigInt): String = {
    require(timestampMs >= 0 && timestampMs < (1L << 48), "timestamp out of range")
    val value = (BigInt(timestampMs) << 80) | (entropy & ((BigInt(1) << 80) - 1))
    val sb = new StringBuilder
    var v = value
    var i = 0
    while (i < 26) {
      sb.append(Alphabet(((v >> ((25 - i) * 5)) & 0x1f).toInt))
      i += 1
    }
    sb.toString
  }

  def timestampMs(ulid: String): Long = {
    require(ulid.length == 26, s"bad ULID length: $ulid")
    require(decodeChar(ulid.charAt(0)) <= 7, s"ULID timestamp out of range: $ulid")
    var v = 0L
    var i = 0
    while (i < 10) { // first 10 chars decode to the 48-bit ms value
      val d = decodeChar(ulid.charAt(i))
      v = (v << 5) | d
      i += 1
    }
    v
  }

  def entropy(ulid: String): BigInt = {
    require(ulid.length == 26, s"bad ULID length: $ulid")
    var v = BigInt(0)
    var i = 10
    while (i < 26) {
      v = (v << 5) | BigInt(decodeChar(ulid.charAt(i)).toInt)
      i += 1
    }
    v
  }

  private def decodeChar(c: Char): Long = {
    val d = if (c < 128) Decode(c) else -1
    require(d >= 0, s"invalid ULID char '$c'")
    d.toLong
  }

  def isValid(s: String): Boolean =
    s.length == 26 && s.forall(c => c < 128 && Decode(c) >= 0) &&
      decodeChar(s.charAt(0)) <= 7 // 2^48 ms cap ⇒ first char ≤ '7'
}
