package graft.fts

import graft.fts.Search.{CursorException, Watermark}
import org.scalatest.funsuite.AnyFunSuite

class SignedCursorSpec extends AnyFunSuite {

  private val keys = SignedCursor.generateKeyPair()
  private val me = SignedCursor.rawPublicKey(keys.getPublic)
  private val fp = Search.fingerprint("spark merge", "grp-1")
  private val wm = Watermark(123456L, "graph:7", "doc:7")

  private def node(b: Int): Array[Byte] = Array.fill(32)(b.toByte)

  test("sign/encode/decode roundtrip preserves every field") {
    val enc = SignedCursor.encodeSigned(fp, wm, Seq((node(1), 10), (node(2), 20)), keys)
    val cur = SignedCursor.decodeSigned(enc, Seq(me), fp)
    assert(cur.version == SignedCursor.Version)
    assert(cur.signer.toArray.sameElements(me))
    assert(cur.wm == wm)
    assert(cur.resume.map(_._2) == Seq(10, 20))
  }

  test("raw public key form roundtrips through the JDK key factory") {
    val back = SignedCursor.rawPublicKey(SignedCursor.publicKeyFromRaw(me))
    assert(back.sameElements(me))
  }

  test("any tampered byte invalidates the signature") {
    val enc = SignedCursor.encodeSigned(fp, wm, Seq((node(1), 10)), keys)
    val bytes = java.util.Base64.getUrlDecoder.decode(enc)
    // flip one byte in the watermark region and in the resume region
    for (idx <- Seq(1 + 32 + 32 + 3, bytes.length - 70)) {
      val t = bytes.clone(); t(idx) = (t(idx) ^ 0x01).toByte
      val bad = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(t)
      intercept[CursorException] { SignedCursor.decodeSigned(bad, Seq(me), fp) }
    }
  }

  test("unauthorized signer and wrong-query fingerprint are rejected") {
    val enc = SignedCursor.encodeSigned(fp, wm, Nil, keys)
    intercept[CursorException] {
      SignedCursor.decodeSigned(enc, Seq(node(9)), fp) // signer not in realm
    }
    val other = Search.fingerprint("other query", "grp-1")
    val ex = intercept[CursorException] { SignedCursor.decodeSigned(enc, Seq(me), other) }
    assert(ex.getMessage.contains("does not match query"))
  }

  test("a cursor signed by a different key than claimed fails verification") {
    val mallory = SignedCursor.generateKeyPair()
    // mallory signs but the cursor claims our signer key: authorized, bad sig
    val enc = SignedCursor.encodeSigned(fp, wm, Nil, mallory)
    val bytes = java.util.Base64.getUrlDecoder.decode(enc)
    System.arraycopy(me, 0, bytes, 1, 32) // overwrite signer field
    val forged = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)
    intercept[CursorException] { SignedCursor.decodeSigned(forged, Seq(me), fp) }
  }

  test("resume overflow keeps the 64 deepest-progress nodes") {
    val resume = (0 until 70).map(i => (node(i), i))
    val enc = SignedCursor.encodeSigned(fp, wm, resume, keys)
    val cur = SignedCursor.decodeSigned(enc, Seq(me), fp)
    assert(cur.resume.length == SignedCursor.MaxResumeNodes)
    assert(cur.resume.map(_._2).min == 6) // positions 6..69 survive
  }
}
