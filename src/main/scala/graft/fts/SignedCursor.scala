package graft.fts

import graft.fts.Search.{CursorException, Watermark}

import java.nio.ByteBuffer
import java.security.{KeyFactory, KeyPair, PrivateKey, PublicKey, Signature}
import java.security.interfaces.EdECPublicKey
import java.security.spec.{EdECPoint, EdECPublicKeySpec, NamedParameterSpec}

/** Ed25519-signed search cursors (reference `search_cursor.rs:17-166`):
  * version 2, a 32-byte signer key, a 32-byte query fingerprint, the
  * watermark, up to 64 per-node resume positions (deepest kept on
  * overflow), and a signature over a domain-separated payload
  * (`aruna.metadata.search.cursor.v2` context || 0 || payload). Decode
  * rejects: malformed base64, version mismatch, resume overflow,
  * unauthorized signer, bad signature, fingerprint mismatch — in the
  * reference's order.
  *
  * Crypto is the JDK's Ed25519 (Java 17); the raw 32-byte key form is the
  * RFC 8032 little-endian y with the x-parity bit in the top bit.
  */
object SignedCursor {

  val Version: Int = 2 // search_cursor.rs:17
  val SignatureContext: Array[Byte] =
    "aruna.metadata.search.cursor.v2".getBytes("UTF-8") // search_cursor.rs:18
  val MaxResumeNodes: Int = 64 // search_cursor.rs:21

  final case class Cursor(version: Int, signer: Seq[Byte], fingerprint: Seq[Byte],
      wm: Watermark, resume: Seq[(Seq[Byte], Int)])

  def generateKeyPair(): KeyPair =
    java.security.KeyPairGenerator.getInstance("Ed25519").generateKeyPair()

  /** RFC 8032 raw form: little-endian y, top bit = x parity. */
  def rawPublicKey(pk: PublicKey): Array[Byte] = {
    val point = pk.asInstanceOf[EdECPublicKey].getPoint
    val le = point.getY.toByteArray.reverse // big-endian -> little-endian
    val out = new Array[Byte](32)
    System.arraycopy(le, 0, out, 0, math.min(32, le.length))
    if (point.isXOdd) out(31) = (out(31) | 0x80).toByte
    out
  }

  def publicKeyFromRaw(raw: Array[Byte]): PublicKey = {
    require(raw.length == 32, "ed25519 public key must be 32 bytes")
    val b = raw.clone()
    val xOdd = (b(31) & 0x80) != 0
    b(31) = (b(31) & 0x7f).toByte
    val y = new java.math.BigInteger(1, b.reverse)
    KeyFactory.getInstance("Ed25519")
      .generatePublic(new EdECPublicKeySpec(NamedParameterSpec.ED25519, new EdECPoint(xOdd, y)))
  }

  // ----- byte layout (length-prefixed, deterministic) ------------------

  private def putBytes(buf: java.io.ByteArrayOutputStream, b: Array[Byte]): Unit = {
    buf.write(ByteBuffer.allocate(4).putInt(b.length).array())
    buf.write(b)
  }

  /** version | signer | fingerprint | watermark | resume — the signed part. */
  private def payloadBytes(version: Int, signer: Array[Byte], fp: Array[Byte],
      wm: Watermark, resume: Seq[(Array[Byte], Int)]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(version)
    buf.write(signer)
    buf.write(fp)
    buf.write(ByteBuffer.allocate(8).putLong(wm.scoreKey).array())
    putBytes(buf, wm.graphIri.getBytes("UTF-8"))
    putBytes(buf, wm.subjectIri.getBytes("UTF-8"))
    buf.write(ByteBuffer.allocate(4).putInt(resume.length).array())
    resume.foreach { case (node, posn) =>
      buf.write(node)
      buf.write(ByteBuffer.allocate(4).putInt(posn).array())
    }
    buf.toByteArray
  }

  /** context || 0 || payload (search_cursor.rs:161-165). */
  private def signingBytes(payload: Array[Byte]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(SignatureContext)
    buf.write(0)
    buf.write(payload)
    buf.toByteArray
  }

  /** Sign and encode. Resume overflow keeps the deepest-progress nodes
    * (search_cursor.rs:76-79). `fingerprintHex` is [[Search.fingerprint]]. */
  def encodeSigned(fingerprintHex: String, wm: Watermark,
      resume: Seq[(Array[Byte], Int)], keys: KeyPair): String = {
    val signer = rawPublicKey(keys.getPublic)
    val fp = hexToBytes(fingerprintHex)
    val capped =
      if (resume.length > MaxResumeNodes)
        resume.sortBy(-_._2).take(MaxResumeNodes)
      else resume
    val payload = payloadBytes(Version, signer, fp, wm, capped)
    val sig = signEd25519(keys.getPrivate, signingBytes(payload))
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(payload)
    buf.write(sig)
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(buf.toByteArray)
  }

  /** Decode + authenticate (search_cursor.rs:104-133 order): structure,
    * version, resume cap, authorized signer, signature, then the
    * query-fingerprint binding. */
  def decodeSigned(raw: String, authorizedSigners: Seq[Array[Byte]],
      expectedFingerprintHex: String): Cursor = {
    val bytes =
      try java.util.Base64.getUrlDecoder.decode(raw)
      catch { case _: IllegalArgumentException => throw new CursorException("invalid search cursor") }
    val cur =
      try parse(bytes)
      catch { case _: Exception => throw new CursorException("invalid search cursor") }
    if (cur.version != Version || cur.resume.length > MaxResumeNodes)
      throw new CursorException("invalid search cursor")
    val signerRaw = cur.signer.toArray
    if (!authorizedSigners.exists(_.sameElements(signerRaw)))
      throw new CursorException("invalid search cursor")
    val payload = payloadBytes(cur.version, signerRaw, cur.fingerprint.toArray,
      cur.wm, cur.resume.map { case (n, p) => (n.toArray, p) })
    val sig = bytes.drop(bytes.length - 64)
    val ok =
      try {
        val v = Signature.getInstance("Ed25519")
        v.initVerify(publicKeyFromRaw(signerRaw))
        v.update(signingBytes(payload))
        v.verify(sig)
      } catch { case _: Exception => false }
    if (!ok) throw new CursorException("invalid search cursor")
    if (!cur.fingerprint.toArray.sameElements(hexToBytes(expectedFingerprintHex)))
      throw new CursorException("search cursor does not match query")
    cur
  }

  private def parse(bytes: Array[Byte]): Cursor = {
    val bb = ByteBuffer.wrap(bytes)
    val version = bb.get() & 0xff
    val signer = new Array[Byte](32); bb.get(signer)
    val fp = new Array[Byte](32); bb.get(fp)
    val scoreKey = bb.getLong
    def str(): String = {
      val n = bb.getInt
      require(n >= 0 && n <= bb.remaining())
      val b = new Array[Byte](n); bb.get(b); new String(b, "UTF-8")
    }
    val graph = str()
    val subject = str()
    val nResume = bb.getInt
    require(nResume >= 0 && nResume.toLong * 36 <= bb.remaining().toLong)
    val resume = Seq.fill(nResume) {
      val node = new Array[Byte](32); bb.get(node)
      (node.toSeq, bb.getInt)
    }
    require(bb.remaining() == 64) // exactly the signature left
    Cursor(version, signer.toSeq, fp.toSeq, Watermark(scoreKey, graph, subject), resume)
  }

  private def signEd25519(key: PrivateKey, msg: Array[Byte]): Array[Byte] = {
    val s = Signature.getInstance("Ed25519")
    s.initSign(key)
    s.update(msg)
    s.sign()
  }

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
}
