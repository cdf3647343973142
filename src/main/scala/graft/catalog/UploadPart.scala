package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UploadPart admission ladder (reference
  * `operations/src/s3/upload_part.rs`, 881 LoC — the last uncovered S3
  * operation; the byte transport and transaction fencing stay out of scope,
  * everything the state machine DECIDES is reproduced for a request batch).
  *
  * The reference walks ReadUpload → WritePart → [checksum verify] →
  * StartTransaction → ReReadUpload → ReadExistingPart → WritePartRecord →
  * Commit. The decision ladder, first failure wins:
  *
  *  1. `handle_upload_read` (`upload_part.rs:155`): upload record absent →
  *     NoSuchUpload — nothing was written, so NO rollback;
  *  2. `validate_upload_record` (`:139-147`): bucket/key mismatch →
  *     UploadTargetMismatch BEFORE the status check; status != Open →
  *     UploadNotOpen — both pre-write, NO rollback;
  *  3. no body (`:166`) → MissingBody, pre-write;
  *     — the blob write happens here; every later failure deletes the
  *       just-written part bytes (`cleanup_failed_write` `:225-238`) —
  *  4. `handle_write_finished` (`:186-196`): a client-sourced stream fault
  *     is WriteFailed, a server-side blob fault is BlobWriteFailed — the
  *     reference keeps these distinct so a full disk is never reported as
  *     a client bad digest (`rejects_server_write` test `:620-650`);
  *  5. declared `content_length` present and != written size →
  *     IncompleteBody (`:200-206`);
  *  6. the expected checksums IN REQUEST ORDER (`:208-223`): algorithm
  *     absent from the computed hash family →
  *     MissingExpectedChecksum(algo), digest mismatch →
  *     ChecksumMismatch(algo) — same first-fail walk as po1, same
  *     md5-derived computed-hash fixture family;
  *  7. the transactional RE-READ (`:328-345`): the upload can be aborted
  *     or completed concurrently between the pin read and the transaction
  *     — the SAME verdict strings fire again (NoSuchUpload /
  *     UploadTargetMismatch / UploadNotOpen) but now WITH rollback, because
  *     the part bytes were already written. `concurrent_status` models the
  *     record the re-read observes; NULL means unchanged;
  *  8. Ok (`:361-399`): an existing (upload_id, part_number) record is
  *     REPLACED — its old blob is deleted after commit
  *     (`handle_transaction_committed` `:424-431`), reported as
  *     `replaced_cleanup` with the replaced size; the new part record pins
  *     the upload record's backend (`part_follows_pin` test `:540-585`).
  *
  * Scale: uploads and parts are corpus keyspaces — request upload-ids
  * broadcast INTO both scans (the drs1/po1 probe shape) and the bounded
  * hit-sets join back broadcast. Nothing shuffles the corpus.
  */
object UploadPart {

  /** `requests(req_id, upload_id, bucket, key, part_number, has_body,
    * stream_failed, blob_error, content_length, size, exp1_algo,
    * exp1_digest, exp2_algo, exp2_digest, concurrent_status)`;
    * `uploads(upload_id, bucket, key, status, backend)`;
    * `parts(upload_id, part_number, size)` — the existing part keyspace. */
  def verdicts(requests: DataFrame, uploads: DataFrame,
      parts: DataFrame): DataFrame = {
    val probeIds = requests.select(col("upload_id")).distinct()
    val upHits = uploads
      .join(broadcast(probeIds), Seq("upload_id"))
      .select(col("upload_id"), col("bucket").as("u_bucket"),
        col("key").as("u_key"), col("status").as("u_status"),
        col("backend").as("u_backend"))
    val partHits = parts
      .join(broadcast(probeIds), Seq("upload_id"))
      .select(col("upload_id"), col("part_number"),
        col("size").as("old_size"), lit(true).as("part_exists"))

    // the computed hash family the blob write produced (the po1 fixture
    // family: SHA256/CRC32 derive from the content hash, CRC64NVME is
    // never computed -> the MissingExpectedChecksum arm)
    def computed(algo: org.apache.spark.sql.Column) =
      when(algo === "SHA256", md5(concat(lit("s:"), col("req_id"))))
        .when(algo === "CRC32", md5(concat(lit("c:"), col("req_id"))))
    def ckFail(a: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =
      when(a.isNotNull && computed(a).isNull,
        concat(lit("MissingExpectedChecksum:"), a))
        .when(a.isNotNull && computed(a) =!= d,
          concat(lit("ChecksumMismatch:"), a))

    val j = requests
      .join(broadcast(upHits), Seq("upload_id"), "left")
      .join(broadcast(partHits), Seq("upload_id", "part_number"), "left")

    val found = col("u_bucket").isNotNull
    val targetBad = col("u_bucket") =!= col("bucket") ||
      col("u_key") =!= col("key")
    // the status the transactional re-read observes (NULL = unchanged)
    val reread = coalesce(col("concurrent_status"), col("u_status"))

    val verdict =
      // phase 1: pin read + record validation — all PRE-write
      when(!found, "NoSuchUpload")
        .when(targetBad, "UploadTargetMismatch")
        .when(col("u_status") =!= "Open", "UploadNotOpen")
        .when(!col("has_body"), "MissingBody")
        // phase 2: the write happened — every arm below rolls it back
        .when(col("stream_failed"), "WriteFailed")
        .when(col("blob_error"), "BlobWriteFailed")
        .when(col("content_length").isNotNull &&
          col("content_length") =!= col("size"), "IncompleteBody")
        .when(ckFail(col("exp1_algo"), col("exp1_digest")).isNotNull,
          ckFail(col("exp1_algo"), col("exp1_digest")))
        .when(ckFail(col("exp2_algo"), col("exp2_digest")).isNotNull,
          ckFail(col("exp2_algo"), col("exp2_digest")))
        // phase 3: the transactional re-read — same strings, now post-write
        .when(col("concurrent_status") === "Gone", "NoSuchUpload")
        .when(reread =!= "Open", "UploadNotOpen")
        .otherwise("Ok")

    val ok = col("verdict") === "Ok"
    val preWrite = !found || targetBad || col("u_status") =!= "Open" ||
      !col("has_body")

    j.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      // rollback: every failure AFTER the blob write deletes the part bytes
      (!ok && !preWrite).as("rollback_delete"),
      // replace semantics: the old part record's blob is deleted post-commit
      (ok && coalesce(col("part_exists"), lit(false))).as("replaced_cleanup"),
      when(ok && coalesce(col("part_exists"), lit(false)), col("old_size"))
        .as("replaced_size"),
      // the committed part record: size + the upload record's pinned backend
      when(ok, col("size")).as("part_size"),
      when(ok, col("u_backend")).as("backend"))
  }
}
