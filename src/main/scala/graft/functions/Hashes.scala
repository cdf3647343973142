package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Content-hash family (reference `blob/src/hash.rs:10-76`): every blob is
  * multi-digested on write. Implemented: BLAKE3 (the reference's primary
  * content key — pure-JVM [[Blake3]], validated against the official test
  * vectors), MD5, SHA1, SHA256, CRC32, CRC32C, CRC64/NVME — the CRCs
  * validated against the reference's known-answer vector for b"123456789"
  * (`hash.rs:95-110`).
  *
  * MD5/SHA1/SHA256 prefer the built-in codegen'd `functions.md5/sha1/sha2`;
  * the UDFs below are for BLAKE3 and the CRC family Spark lacks.
  */
object Hashes {

  /** CRC64/NVME (a.k.a. CRC-64/Rocksoft, polynomial 0xAD93D23594C93659,
    * reflected, init/xorout 0xFFFFFFFFFFFFFFFF). KAT("123456789") =
    * 0xae8b14860a799888. */
  val Crc64NvmePoly = 0x9A6C9329AC4BC9B5L // reflected 0xAD93D23594C93659
  val Crc32Poly = 0xEDB88320L // reflected IEEE 802.3 (java.util.zip.CRC32)
  val Crc32cPoly = 0x82F63B78L // reflected Castagnoli (java.util.zip.CRC32C)

  /** 256-entry lookup table of a reflected CRC — shared by the JVM kernels
    * and the DuckDB oracle generator (which embeds the entries as literals
    * so both engines fold the identical table). */
  def reflectedCrcTable(poly: Long): Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var crc = i.toLong
      var k = 0
      while (k < 8) {
        crc = if ((crc & 1L) != 0L) (crc >>> 1) ^ poly else crc >>> 1
        k += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  private lazy val crc64Table: Array[Long] = reflectedCrcTable(Crc64NvmePoly)

  def crc64nvme(bytes: Array[Byte]): Long = {
    var crc = -1L // init all-ones
    var i = 0
    while (i < bytes.length) {
      crc = crc64Table(((crc ^ bytes(i)) & 0xff).toInt) ^ (crc >>> 8)
      i += 1
    }
    ~crc // xorout all-ones
  }

  def crc32(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue
  }

  def crc32c(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes)
    c.getValue
  }

  def digestHex(algo: String, bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance(algo).digest(bytes)
      .map("%02x".format(_)).mkString

  // --- UDFs over binary payloads (use functions.md5/sha1/sha2 for strings) —
  val crc32Udf: UserDefinedFunction = udf((b: Array[Byte]) => crc32(b))
  val crc32cUdf: UserDefinedFunction = udf((b: Array[Byte]) => crc32c(b))
  val crc64nvmeUdf: UserDefinedFunction = udf((b: Array[Byte]) => crc64nvme(b))
  val blake3Udf: UserDefinedFunction = udf((b: Array[Byte]) => Blake3.hex(b))

  /** All digests of a binary column at once — the PutObject multi-digest
    * ingest shape (`blob/src/hash.rs:56-63`). */
  def multiDigest(bytes: Column): Seq[(String, Column)] = Seq(
    "blake3" -> blake3Udf(bytes),
    "md5" -> md5(bytes),
    "sha1" -> sha1(bytes),
    "sha256" -> sha2(bytes, 256),
    "crc32" -> crc32Udf(bytes),
    "crc32c" -> crc32cUdf(bytes),
    "crc64nvme" -> crc64nvmeUdf(bytes))
}
