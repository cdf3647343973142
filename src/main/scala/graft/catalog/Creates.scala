package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Create-side S3 validation ladders: CreateBucket (reference
  * `operations/src/s3/create_bucket.rs`) and CreateMultipartUpload
  * (`operations/src/s3/create_multipart_upload.rs` + the API-side checks in
  * `api/src/s3/s3_service.rs:1801-1866` / `api/src/s3/util.rs`).
  */
object Creates {

  /** CreateBucket verdict batch (`create_bucket.rs:113-127`): the operation
    * reads the bucket key inside its transaction and fails with
    * BucketAlreadyExists when a record is present; otherwise it writes the
    * record and folds a `+1 buckets` UsageCounterUpdate for the creator's
    * group (`:153-166`).
    *
    * `requests(seq, bucket, group_id)` — `seq` is submission order.
    * Requests are transactionally sequential in the reference, so a batch
    * that names one bucket twice creates it once: the FIRST request in
    * `seq` order wins, later ones observe the just-written record and fail
    * exactly like a catalog hit.
    *
    * Output per request: verdict plus `group_buckets_delta`, the summed
    * usage fold the batch commits for that request's group (the
    * UsageCounterUpdate accounting — constant across a group's rows).
    *
    * Scale: the catalog side broadcasts into the batch scan; the
    * first-wins window and the group fold partition by batch-sized keys. */
  def createBucketVerdicts(buckets: DataFrame, requests: DataFrame): DataFrame = {
    val existing = broadcast(buckets.select(col("bucket"),
      lit(true).as("in_catalog")))
    val firstWins = Window.partitionBy("bucket").orderBy("seq")
    val groupW = Window.partitionBy("group_id")
    requests.join(existing, Seq("bucket"), "left")
      .withColumn("nth", row_number().over(firstWins))
      .withColumn("verdict",
        when(col("in_catalog").isNotNull || col("nth") > 1,
          "BucketAlreadyExists").otherwise("OK"))
      .withColumn("group_buckets_delta",
        sum(when(col("verdict") === "OK", 1L).otherwise(0L)).over(groupW))
      .select("seq", "bucket", "group_id", "verdict", "group_buckets_delta")
  }

  /** The five S3 checksum algorithms the reference accepts
    * (`util.rs:336-348`, `checksum_algorithm_from_s3`). */
  val ChecksumAlgorithms: Seq[String] =
    Seq("CRC32", "CRC32C", "CRC64NVME", "SHA1", "SHA256")

  /** CreateMultipartUpload request ladder (`s3_service.rs:1801-1866`),
    * first failure wins in handler order:
    *
    *  1. SseNotSupported — ANY server-side-encryption header
    *     (`reject_sse`, `util.rs:163-172`: SSE is rejected, never
    *     silently ignored);
    *  2. EmptyKey / UnconfinedKey — `validate_object_key`
    *     (`util.rs:131-138`): empty, then the confined-relative-path
    *     sanitation ([[graft.functions.Paths.confinedKeyCol]]);
    *  3. UnsupportedChecksum — a checksum algorithm outside
    *     [[ChecksumAlgorithms]];
    *  4. Ok — the upload record opens. The checksum hint follows
    *     `parse_multipart_checksum_hint` (`util.rs:173-196`): present iff
    *     an algorithm OR a type was sent; its type is Composite only for
    *     the literal COMPOSITE, anything else (including absent) is
    *     FullObject. The record's group is the bucket's when bucket info
    *     resolved, else the caller's (`:1827-1830`), and status is Open.
    *
    * `requests(req_id, bucket, key, sse, sse_kms, sse_customer,
    * checksum_algorithm, checksum_type, has_bucket_info, bucket_group,
    * user_group)`. Non-Ok rows null every record column.
    *
    * Scale: a pure codegen'd projection over the request scan — no joins,
    * no shuffle; the key sanitation and ARN-ish grammar are native
    * expressions, not UDFs. */
  def createMultipartVerdicts(requests: DataFrame): DataFrame = {
    val algBad = col("checksum_algorithm").isNotNull &&
      !col("checksum_algorithm").isin(ChecksumAlgorithms: _*)
    val verdict =
      when(col("sse") || col("sse_kms") || col("sse_customer"),
        "SseNotSupported")
        .when(length(col("key")) === 0, "EmptyKey")
        .when(!graft.functions.Paths.confinedKeyCol(col("key")),
          "UnconfinedKey")
        .when(algBad, "UnsupportedChecksum")
        .otherwise("Ok")
    val hintPresent = col("checksum_algorithm").isNotNull ||
      col("checksum_type").isNotNull
    requests
      .withColumn("verdict", verdict)
      .select(col("req_id"), col("verdict"),
        when(col("verdict") === "Ok" && hintPresent,
          col("checksum_algorithm")).as("hint_algorithm"),
        when(col("verdict") === "Ok" && hintPresent,
          when(col("checksum_type") === "COMPOSITE", "Composite")
            .otherwise("FullObject")).as("hint_checksum_type"),
        when(col("verdict") === "Ok",
          when(col("has_bucket_info"), col("bucket_group"))
            .otherwise(col("user_group"))).as("group_id"),
        when(col("verdict") === "Ok", "Open").as("status"))
  }

  /** CreateGroup admission (`create_group.rs:81-116,354-362`): the owner
    * cap comes from the realm quota's `max_groups_for` ladder (sq1's
    * user-cap overrides — per-user override else the realm default, None
    * = unlimited). A zero cap rejects before any read; otherwise the
    * owned-group index is scanned WITH LIMIT = cap and the create fails
    * when the scan fills (`values.len() >= cap`). Output reports the
    * limit that fired and the owned count the scan observed (capped at
    * the limit — the reference never scans further).
    *
    * `requests(req_id, user_id)`; `owned(user_id, group_id)`;
    * `caps(user_id, max_groups)`; `defaultCap` None = unlimited. */
  def createGroupVerdicts(requests: DataFrame, owned: DataFrame,
      caps: DataFrame, defaultCap: Option[Long]): DataFrame = {
    // the owned-group index is corpus-scale: probe it with broadcast
    // request users; the per-user counts that come back are batch-bounded
    val counts = owned
      .join(broadcast(requests.select(col("user_id")).distinct()),
        Seq("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n_owned"))
    val j = requests
      .join(broadcast(caps.select(col("user_id"), col("max_groups"),
        lit(true).as("has_cap"))), Seq("user_id"), "left")
      .join(broadcast(counts), Seq("user_id"), "left")
    val cap = when(col("has_cap"), col("max_groups"))
      .otherwise(defaultCap.map(lit(_)).getOrElse(lit(null).cast("long")))
    val nOwned = coalesce(col("n_owned"), lit(0L))
    j.select(col("req_id"), col("user_id"),
        cap.as("cap"), nOwned.as("__n"))
      .select(col("req_id"), col("user_id"),
        when(col("cap").isNotNull && col("__n") >= col("cap"),
          "OwnedGroupLimitReached").otherwise("Ok").as("verdict"),
        col("cap").as("limit"),
        // the scan stops at the cap: observed = min(n, cap) when capped
        when(col("cap").isNotNull, least(col("__n"), col("cap")))
          .otherwise(col("__n")).as("owned_scanned"))
  }
}
