package graft.functions

/** Pure-JVM BLAKE3 (hash mode), implemented from the public BLAKE3
  * specification (Section 2 of the BLAKE3 paper: 7-round compression on a
  * 16-word state, 1 KiB chunks chained into a binary tree whose left subtree
  * holds the largest power-of-two number of full chunks).
  *
  * This is the reference's PRIMARY content key: every blob row is addressed
  * by its BLAKE3 digest (`blob/src/hash.rs:10-18`, `BlobLocationKey.blake3`
  * `core/src/structs/blob.rs:253-366`). Validated in FunctionsSpec against
  * the official test vectors (input bytes `i % 251`) for lengths 0, 1, 1024
  * (16-block single chunk) and 1025 (first parent node) — covering the
  * single-block, block-chaining and tree paths.
  *
  * Scale: the hot path is [[hash]] on byte arrays inside a UDF; allocation
  * per block is one 16-int array, no boxing.
  */
object Blake3 {

  private val IV = Array(
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

  private val MsgPerm = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  private val ChunkStart = 1
  private val ChunkEnd = 2
  private val Parent = 4
  private val Root = 8

  private val ChunkLen = 1024
  private val BlockLen = 64

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
    v(a) = v(a) + v(b) + mx
    v(d) = Integer.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + my
    v(d) = Integer.rotateRight(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 7)
  }

  /** Full 16-word compression output: words 0-7 are the chaining value,
    * words 8-15 feed extended output. */
  private def compress(cv: Array[Int], block: Array[Int], counter: Long,
      blockLen: Int, flags: Int): Array[Int] = {
    val v = new Array[Int](16)
    System.arraycopy(cv, 0, v, 0, 8)
    v(8) = IV(0); v(9) = IV(1); v(10) = IV(2); v(11) = IV(3)
    v(12) = counter.toInt
    v(13) = (counter >>> 32).toInt
    v(14) = blockLen
    v(15) = flags
    var m = block
    var round = 0
    while (round < 7) {
      g(v, 0, 4, 8, 12, m(0), m(1))
      g(v, 1, 5, 9, 13, m(2), m(3))
      g(v, 2, 6, 10, 14, m(4), m(5))
      g(v, 3, 7, 11, 15, m(6), m(7))
      g(v, 0, 5, 10, 15, m(8), m(9))
      g(v, 1, 6, 11, 12, m(10), m(11))
      g(v, 2, 7, 8, 13, m(12), m(13))
      g(v, 3, 4, 9, 14, m(14), m(15))
      round += 1
      if (round < 7) {
        val nm = new Array[Int](16)
        var i = 0
        while (i < 16) { nm(i) = m(MsgPerm(i)); i += 1 }
        m = nm
      }
    }
    var i = 0
    while (i < 8) {
      v(i) ^= v(i + 8)
      v(i + 8) ^= cv(i)
      i += 1
    }
    v
  }

  /** Little-endian words of `len` bytes at `off`, zero-padded to one block. */
  private def blockWords(input: Array[Byte], off: Int, len: Int): Array[Int] = {
    val w = new Array[Int](16)
    var i = 0
    while (i < len) {
      w(i >> 2) |= (input(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    w
  }

  /** The deferred final compression: ROOT is OR'd in only at the top. */
  private final case class Output(cv: Array[Int], block: Array[Int],
      blockLen: Int, counter: Long, flags: Int) {

    def chainingValue: Array[Int] = {
      val v = compress(cv, block, counter, blockLen, flags)
      java.util.Arrays.copyOf(v, 8)
    }

    /** Root output bytes (XOF: the counter becomes the output-block index). */
    def rootBytes(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var written = 0
      var c = 0L
      while (written < n) {
        val v = compress(cv, block, c, blockLen, flags | Root)
        var i = 0
        while (i < 64 && written < n) {
          out(written) = (v(i >> 2) >>> ((i & 3) << 3)).toByte
          i += 1
          written += 1
        }
        c += 1
      }
      out
    }
  }

  /** One ≤1 KiB chunk: blocks chain through the chunk; the last block's
    * compression is deferred. The empty input is one zero-length block. */
  private def chunkOutput(input: Array[Byte], off: Int, len: Int,
      counter: Long): Output = {
    var cv = IV
    val nBlocks = math.max(1, (len + BlockLen - 1) / BlockLen)
    var i = 0
    var out: Output = null
    while (i < nBlocks) {
      val start = i * BlockLen
      val bl = if (len == 0) 0 else math.min(BlockLen, len - start)
      val block = blockWords(input, off + start, bl)
      var flags = 0
      if (i == 0) flags |= ChunkStart
      if (i == nBlocks - 1) {
        flags |= ChunkEnd
        out = Output(cv, block, bl, counter, flags)
      } else {
        val v = compress(cv, block, counter, BlockLen, flags)
        cv = java.util.Arrays.copyOf(v, 8)
      }
      i += 1
    }
    out
  }

  private def parentOutput(l: Array[Int], r: Array[Int]): Output = {
    val block = new Array[Int](16)
    System.arraycopy(l, 0, block, 0, 8)
    System.arraycopy(r, 0, block, 8, 8)
    Output(IV, block, BlockLen, 0L, Parent)
  }

  /** CV of a subtree spanning whole chunks starting at chunk `counter`. */
  private def subtreeCv(input: Array[Byte], off: Int, len: Int,
      counter: Long): Array[Int] =
    if (len <= ChunkLen) chunkOutput(input, off, len, counter).chainingValue
    else {
      val leftLen = leftSubtreeLen(len)
      parentOutput(
        subtreeCv(input, off, leftLen, counter),
        subtreeCv(input, off + leftLen, len - leftLen,
          counter + leftLen / ChunkLen)).chainingValue
    }

  /** Largest power-of-two number of FULL chunks that leaves ≥1 byte right. */
  private def leftSubtreeLen(len: Int): Int = {
    val fullChunks = (len - 1) / ChunkLen
    Integer.highestOneBit(fullChunks) * ChunkLen
  }

  /** BLAKE3 hash of `input`, `outLen` bytes (default 32). */
  def hash(input: Array[Byte], outLen: Int = 32): Array[Byte] = {
    val root =
      if (input.length <= ChunkLen) chunkOutput(input, 0, input.length, 0L)
      else {
        val leftLen = leftSubtreeLen(input.length)
        parentOutput(
          subtreeCv(input, 0, leftLen, 0L),
          subtreeCv(input, leftLen, input.length - leftLen,
            (leftLen / ChunkLen).toLong))
      }
    root.rootBytes(outLen)
  }

  def hex(input: Array[Byte]): String =
    hash(input).map("%02x".format(_)).mkString

  /** Pure hex encoder — does NOT hash. For values that are already
    * digests (e.g. [[graft.catalog.ShardVerify.entrySetDigest]]). */
  def toHex(digest: Array[Byte]): String =
    digest.map("%02x".format(_)).mkString
}
