package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multipart composite checksums + declared-checksum validation (reference
  * `operations/src/s3/complete_multipart_upload.rs:1465-1503`,
  * `api/src/s3/checksum.rs:261-268,400-422`).
  *
  * Pinned semantics:
  *  - composite digest (`compute_composite_hashes`): concatenate the
  *    per-part BINARY digests in part order and hash the concatenation;
  *    the S3 display form is `hex-digest-N` with the part count. The
  *    classic two-part md5 vector ("hello"+"world" parts →
  *    `065947336a2f2a95ba8899f3675c3be6-2`) pins the raw-bytes path in
  *    [[compositeMd5Hex]] and the spec; the GATE twin hashes the ordered
  *    HEX concatenation instead (DuckDB's md5 is VARCHAR-only) — the
  *    aggregation shape (ordered per-part digests → one digest + `-N`) is
  *    identical.
  *  - `split_composite_part_count`: a declared value splits at the LAST
  *    `-`; an empty or non-digit suffix is `invalid_digest`; no `-` means
  *    a full-object declaration (no count).
  *  - `validate_composite_part_count`: a declared count that does not
  *    match the actual part count is a `checksum_mismatch`.
  *
  * Scale shape: one upload-keyed ordered string_agg (parts per upload are
  * capped at 10k by the reference's own scan limit) + a broadcast-free
  * equi-join of the declaration batch.
  */
object Checksums {

  /** The reference raw-bytes composite md5 (driver-side helper for specs
    * and single objects; the distributed twin is the gate's hex-concat). */
  def compositeMd5Hex(partDigestsHex: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    partDigestsHex.foreach { h =>
      md.update(h.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Composite checksums per upload + declaration verdicts.
    *
    * `parts(upload_id, part_number, digest_hex)`;
    * `declarations(upload_id, declared)` (`digest[-N]` form). Emits one
    * row per declaration with the computed composite and the verdict
    * ladder: invalid_digest (bad `-N` suffix) | checksum_mismatch (count
    * or digest mismatch) | ok.
    */
  /** One upload-keyed pass: the ordered digest concat → composite. */
  def composites(parts: DataFrame): DataFrame =
    parts.groupBy("upload_id").agg(
      md5(concat_ws("",
        transform(
          array_sort(collect_list(struct(col("part_number"),
            col("digest_hex")))),
          p => p.getField("digest_hex")))).as("composite"),
      count(lit(1)).cast("int").as("n_parts"))

  def verify(parts: DataFrame, declarations: DataFrame): DataFrame = {
    val comps = composites(parts)

    val suffix = regexp_extract(col("declared"), "^(.*)-([^-]*)$", 2)
    val hasDash = col("declared").contains("-")
    val digitSuffix = suffix.rlike("^[0-9]+$")
    val declDigest = when(hasDash,
      regexp_extract(col("declared"), "^(.*)-([^-]*)$", 1))
      .otherwise(col("declared"))
    val declCount = when(hasDash && digitSuffix, suffix.cast("int"))

    declarations.join(comps, Seq("upload_id"), "left_outer")
      .select(col("upload_id"), col("declared"),
        col("composite"), col("n_parts"),
        when(col("composite").isNull, "no_such_upload")
          .when(hasDash && !digitSuffix, "invalid_digest")
          .when(declCount.isNotNull && declCount =!= col("n_parts"),
            "checksum_mismatch")
          .when(declDigest =!= col("composite"), "checksum_mismatch")
          .otherwise("ok").as("verdict"))
  }
}
