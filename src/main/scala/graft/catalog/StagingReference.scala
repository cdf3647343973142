package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference materialization from a staging source (reference
  * `operations/src/staging/reference.rs:66-250`).
  *
  * Per request, inside one transaction:
  *  - the bucket must still be the expected one and the resolved
  *    connector unchanged (secret fingerprint) — guards first;
  *  - IDEMPOTENCE: when the current head is already a Reference with the
  *    SAME source binding and matching cached metadata — content_length,
  *    content_type, etag and last_modified all equal
  *    (`source_metadata_matches`, `:244-249`) — the operation commits
  *    without writing: same version id back, nothing changed;
  *  - otherwise a fresh version is written at the next pointer, and the
  *    usage delta counts `objects +1` ONLY when the previous head was not
  *    live (absent or deleted) while `referenced_bytes` always grows by
  *    the new content length (`:186-199`).
  *
  * Scale: request batches fold with one (bucket, key) equi-join against
  * the head pointers and one against the pointed-at versions; no
  * corpus-sized shuffle. */
object StagingReference {

  /** `reqs(bucket, key, src_sig, content_length, content_type, etag,
    * last_modified, bucket_ok, connector_ok)`;
    * `pointers(bucket, key, ptr_version)`; `versions(bucket, key,
    * version_id, state, src_sig, content_length, content_type, etag,
    * last_modified)` with state ∈ reference | materialized | deleted.
    *
    * Returns `(bucket, key, verdict, changed, objects_delta,
    * referenced_bytes_delta)` with verdict ∈ bucket_guard | connector_changed |
    * unchanged | created. */
  def materialize(reqs: DataFrame, pointers: DataFrame,
      versions: DataFrame): DataFrame = {
    val ptr = pointers.select(col("bucket"), col("key"), col("ptr_version"))
    val ver = versions.select(col("bucket"), col("key"),
      col("version_id").as("ptr_version"), col("state").as("ex_state"),
      col("src_sig").as("ex_src"), col("content_length").as("ex_len"),
      col("content_type").as("ex_type"), col("etag").as("ex_etag"),
      col("last_modified").as("ex_lm"))
    reqs
      .join(ptr, Seq("bucket", "key"), "left_outer")
      .join(ver, Seq("bucket", "key", "ptr_version"), "left_outer")
      .withColumn("same_source", coalesce(
        col("ex_state") === "reference" && col("ex_src") === col("src_sig") &&
          col("ex_len") === col("content_length") &&
          col("ex_type") === col("content_type") &&
          col("ex_etag") === col("etag") &&
          col("ex_lm") === col("last_modified"), lit(false)))
      .withColumn("was_live", coalesce(
        col("ex_state").isNotNull && col("ex_state") =!= "deleted",
        lit(false)))
      .withColumn("verdict",
        when(!col("bucket_ok"), "bucket_guard")
          .when(!col("connector_ok"), "connector_changed")
          .when(col("same_source"), "unchanged")
          .otherwise("created"))
      .withColumn("changed", col("verdict") === "created")
      .withColumn("objects_delta", when(col("changed"),
        when(col("was_live"), 0L).otherwise(1L)))
      .withColumn("referenced_bytes_delta",
        when(col("changed"), col("content_length")))
      .select(col("bucket"), col("key"), col("verdict"), col("changed"),
        col("objects_delta"), col("referenced_bytes_delta"))
  }
}
