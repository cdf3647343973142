package graft.layout

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical data-layout planning operators — the pieces a 100 TB deployment
  * uses to decide *where rows live* so that scans prune instead of read:
  *
  *  - **Z-order (Morton) clustering**: interleave the bits of two scan
  *    dimensions into one cluster key; files cut along z-prefixes get tight
  *    per-file bounding boxes on BOTH dimensions, so a 2-D predicate skips
  *    most files (the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *    All map-side integer bit arithmetic — the only shuffle in a real
  *    rewrite is the final `repartitionByRange(zvalue)` write.
  *  - **Compaction planning**: pack small files into target-sized bins with
  *    one window pass over the file *metadata* relation (inherently small:
  *    100 TB / 128 MB files = ~800 k rows) — no driver loop.
  *  - **Range-partition planning**: exact split boundaries + per-range row
  *    counts from a key-histogram cumsum. The gate pins the exact contract;
  *    at full scale the same plan is produced from a sample (Spark's
  *    `RangePartitioner` does reservoir sampling and accepts the same
  *    boundary relation).
  *
  * These mirror the reference's LSM layout decisions (key-order clustering,
  * `operations/src/s3/listing.rs` prefix scans rely on it) re-expressed as
  * Spark relational passes over table/file metadata.
  */
object Layout {

  /** Spread the low 16 bits of `c` onto the even bit positions of a 32-bit
    * word (classic magic-mask Morton spread; long domain throughout). */
  def spread16(c: Column): Column = {
    val a = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val e = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (e.bitwiseOR(shiftleft(e, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton z-value of two dimensions, each taken mod 2^16. */
  def zValue(x: Column, y: Column): Column =
    spread16(x % 65536).bitwiseOR(shiftleft(spread16(y % 65536), 1))

  /** Reference bit-interleave (bit-at-a-time), for property tests. */
  def zValueRef(x: Long, y: Long): Long = {
    val xm = x & 0xFFFFL; val ym = y & 0xFFFFL
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((xm >> i) & 1L) << (2 * i)
      z |= ((ym >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** SQL text of the same 16-bit Morton spread (for the DuckDB oracle).
    * Nested substitution duplicates `v` 16×; inputs are short column refs. */
  def spread16Sql(v: String): String = {
    def step(s: String, sh: Int, mask: Long) =
      s"((($s) | (($s) << $sh)) & $mask)"
    step(step(step(step(v, 8, 0x00FF00FFL), 4, 0x0F0F0F0FL),
      2, 0x33333333L), 1, 0x55555555L)
  }

  /** SQL text of the 32-bit z-value over two dimension expressions. */
  def zValueSql(x: String, y: String): String =
    s"(${spread16Sql(s"(($x) % 65536)")} | (${spread16Sql(s"(($y) % 65536)")} << 1))"
}
