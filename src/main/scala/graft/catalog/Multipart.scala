package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CompleteMultipartUpload validation (reference
  * `operations/src/s3/complete_multipart_upload.rs`): the request lists
  * `(part_number, etag?)` pairs; the operation resolves each against the
  * uploaded part records and fails with the FIRST violated rule in request
  * position order (`extract_requested_parts`, `:476-540`):
  *
  *  1. InvalidPartOrder — requested part numbers must be strictly ascending
  *     (`:494-497`);
  *  2. InvalidPart — a requested part was never uploaded (`:499-501`);
  *  3. PartEtagMismatch — a supplied etag must equal the part's stored MD5
  *     (`validate_requested_part`, `:1426-1438`);
  *
  * then, only when the positional scan is clean:
  *
  *  4. EntityTooSmall — every resolved part except the last must be
  *     ≥ 5 MiB (`:522-527`);
  *  5. InvalidObjectSize — a declared object size must equal the sum of
  *     resolved part sizes (`:530-537`);
  *  6. otherwise OK, with the composed object size = Σ part sizes.
  *
  * Completing a SUBSET of uploaded parts is legal — only requested parts
  * compose. MissingParts (empty request, `:481-483`) cannot be a relation
  * row (zero request rows ⇒ zero output rows) and is pinned by the spec.
  *
  * Scale: one (upload_id, part_number) equi-join of requests against parts
  * — both sides partition on upload_id — then per-upload windows over ≤10k
  * parts each (the reference's own PART_SCAN_LIMIT bounds a window) and one
  * per-upload aggregate. No driver-side loops; verdicts for every upload in
  * the keyspace come out of one shuffle round.
  */
object Multipart {

  val MinPartSize: Long = 5L * 1024 * 1024 // complete_multipart_upload.rs:525

  /** Per-upload verdict for a batch of completion requests.
    *
    * `requests(upload_id, seq, part_number, etag, declared_size)` — `seq` is
    * the request position (the reference's Vec order); `etag` nullable
    * (omitted etags skip rule 3); `declared_size` nullable constant per
    * upload. Only Open uploads complete (`validate_upload_target`); closed /
    * unknown uploads yield no verdict row.
    *
    * Output: (upload_id, verdict, object_size, n_parts) — size/count only
    * for OK verdicts, like the reference's result. */
  def completeVerdicts(uploads: DataFrame, parts: DataFrame,
      requests: DataFrame): DataFrame = {
    val open = uploads.filter(col("status") === "Open").select("upload_id")
    val p = parts.select(col("upload_id"), col("part_number"),
      col("size").as("p_size"), col("hash").as("p_hash"))
    val wSeq = Window.partitionBy("upload_id").orderBy("seq")
    val wAll = Window.partitionBy("upload_id")
    val flagged = requests
      .join(broadcast(open), Seq("upload_id"), "left_semi")
      .join(p, Seq("upload_id", "part_number"), "left")
      .withColumn("prev_pn", lag("part_number", 1).over(wSeq))
      .withColumn("code",
        when(col("prev_pn").isNotNull && col("part_number") <= col("prev_pn"),
          "InvalidPartOrder")
          .when(col("p_size").isNull, "InvalidPart")
          .when(col("etag").isNotNull && col("etag") =!= col("p_hash"),
            "PartEtagMismatch"))
      .withColumn("max_seq", max("seq").over(wAll))
      .withColumn("too_small",
        col("seq") < col("max_seq") && col("p_size") < MinPartSize)
    flagged.groupBy("upload_id")
      .agg(
        min(when(col("code").isNotNull, struct(col("seq"), col("code"))))
          .as("first_fail"),
        max(col("too_small")).as("any_small"),
        sum("p_size").as("sum_size"),
        first("declared_size").as("declared"),
        count(lit(1)).as("n_req"))
      .withColumn("verdict",
        coalesce(
          col("first_fail.code"),
          when(col("any_small"), "EntityTooSmall"),
          when(col("declared").isNotNull && col("declared") =!= col("sum_size"),
            "InvalidObjectSize"),
          lit("OK")))
      .select(col("upload_id"), col("verdict"),
        when(col("verdict") === "OK", col("sum_size")).as("object_size"),
        when(col("verdict") === "OK", col("n_req")).as("n_parts"))
  }

  /** Part-scan cap of the abort's prefix iter
    * (`abort_multipart_upload.rs:202`, `limit: 10_000`). */
  val AbortPartScanLimit: Int = 10000

  /** AbortMultipartUpload verdict batch (reference
    * `operations/src/s3/abort_multipart_upload.rs`): each request names
    * `(upload_id, bucket, key)`; the operation reads the upload record and
    * fails with the first violated arm of `validate_upload` (`:115-123`)
    * after the existence check (`:149-151`):
    *
    *  1. NoSuchUpload — no record under the upload id;
    *  2. UploadTargetMismatch — record's (bucket, key) differ from the
    *     request's (checked BEFORE status: an aborted upload addressed
    *     under the wrong key still reports the mismatch);
    *  3. UploadNotOpen — record exists, target matches, status ≠ Open;
    *  4. Ok — the upload aborts: its part records and the upload record
    *     batch-delete (`delete_upload_records`, `:230-251` — parts + 1
    *     record rows), then every part's blob location is cleaned up one
    *     by one (`cleanup_next_part_blob`, `:275-286`; blob-delete errors
    *     are tolerated, so the cleanup count is always the part count).
    *
    * Accounting columns are the reference's effect counts: `n_parts` =
    * parts found by the prefix iter (capped at [[AbortPartScanLimit]],
    * the iter's own limit), `n_records_deleted` = parts + the upload
    * record, `bytes_freed` = Σ part sizes (the blob cleanup's payload).
    * Non-Ok verdicts delete nothing — all three are null, mirroring the
    * reference's error path which only ever resets the record.
    *
    * Scale: one broadcast-able equi-join of the request batch against the
    * uploads keyspace on upload_id, plus one partial-aggregated part
    * rollup joined on the same key — both sides co-partition on
    * upload_id; no windows, no driver loops. */
  def abortVerdicts(uploads: DataFrame, parts: DataFrame,
      requests: DataFrame): DataFrame = {
    val u = uploads.select(col("upload_id"),
      col("bucket").as("u_bucket"), col("key").as("u_key"), col("status"))
    val partAgg = parts.groupBy("upload_id").agg(
      count(lit(1)).cast("long").as("np"),
      sum("size").cast("long").as("pbytes"))
    requests
      .join(u, Seq("upload_id"), "left")
      .join(partAgg, Seq("upload_id"), "left")
      .withColumn("verdict",
        when(col("u_bucket").isNull, "NoSuchUpload")
          .when(col("u_bucket") =!= col("bucket") ||
            col("u_key") =!= col("key"), "UploadTargetMismatch")
          .when(col("status") =!= "Open", "UploadNotOpen")
          .otherwise("Ok"))
      .withColumn("ok_np",
        when(col("verdict") === "Ok",
          least(coalesce(col("np"), lit(0L)), lit(AbortPartScanLimit.toLong))))
      .select(col("upload_id"), col("verdict"),
        col("ok_np").as("n_parts"),
        (col("ok_np") + 1L).as("n_records_deleted"),
        when(col("verdict") === "Ok", coalesce(col("pbytes"), lit(0L)))
          .as("bytes_freed"))
  }
}
