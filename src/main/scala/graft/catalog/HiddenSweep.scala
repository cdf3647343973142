package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hidden-blob sweep (reference `operations/src/blob/hidden.rs`).
  *
  * Hidden blobs are RO-Crate staging artifacts outside the content-
  * addressed store. The sweep (`sweep_at`, `hidden.rs:65-85`) builds the
  * REFERENCED set, deletes dead upload rows, then deletes orphaned hidden
  * entries:
  *
  *  - referenced keys (`scan_jobs`, `hidden.rs:87-134`): the checkpoint
  *    refs of every ACTIVE (non-terminal) RO-Crate job, plus the export
  *    artifact of ANY job holding an ExportRoCrate result — terminal jobs
  *    keep their artifact alive until the record itself is pruned;
  *  - uploads (`sweep_uploads`/`upload_is_live`, `hidden.rs:161-205`): a
  *    claimed upload is live iff its claiming job is still active; an
  *    unclaimed one iff `expires_at_ms > now`. Live upload keys join the
  *    referenced set; dead uploads are deleted (and deliberately NOT
  *    referenced, so their blobs fall to the orphan pass).
  *  - orphans (`is_orphaned`, `hidden.rs:207-224`): a hidden entry
  *    survives when referenced, when its key's namespace is an ACTIVE
  *    RO-Crate job id (checkpoint about to be written), or when it is
  *    younger than the ORPHAN_GRACE hour (a missing mtime also keeps it —
  *    `modified_at.is_some_and`).
  *
  * Scale shape: the hidden-entry listing is blob-store-sized; the
  * job/upload-derived sets it joins are control-plane-sized, so the
  * joins are left to AQE, which broadcasts them at real scale (no
  * explicit hint: the gate fixture deliberately inflates them to
  * table size, where a forced broadcast would be the wrong plan).
  */
object HiddenSweep {

  val OrphanGraceMs: Long = 60L * 60 * 1000

  /** One sweep. `jobs(job_id, state, is_rocrate, artifact_key)`;
    * `checkpointRefs(job_id, hidden_key)`; `uploads(upload_id,
    * hidden_key, claimed_by, expires_at_ms)`; `hidden(hidden_key,
    * namespace_job_id, modified_at_ms)`. Emits upload verdict rows
    * (phase=upload) and hidden-entry verdict rows (phase=entry). */
  def sweep(jobs: DataFrame, checkpointRefs: DataFrame, uploads: DataFrame,
      hidden: DataFrame, nowMs: Long): DataFrame = {
    val terminal = Seq("Failed", "Cancelled", "Succeeded")
    val active = jobs.filter(!col("state").isin(terminal: _*))
      .select(col("job_id")).distinct()
    val activeRocrate = jobs
      .filter(!col("state").isin(terminal: _*) && col("is_rocrate"))
      .select(col("job_id")).distinct()

    val uploadsJ = uploads.join(active.withColumn("claim_active", lit(true)),
      uploads("claimed_by") === active("job_id"), "left_outer")
      .drop("job_id")
    val uploadLive = when(col("claimed_by").isNotNull,
      coalesce(col("claim_active"), lit(false)))
      .otherwise(col("expires_at_ms") > nowMs)
    val uploadVerdicts = uploadsJ.select(
      lit("upload").as("phase"), col("upload_id").as("id"),
      col("hidden_key"),
      when(uploadLive,
        when(col("claimed_by").isNotNull, "live_claimed")
          .otherwise("live_unclaimed"))
        .otherwise("deleted").as("verdict"))

    val referenced =
      jobs.filter(col("artifact_key").isNotNull)
        .select(col("artifact_key").as("hidden_key"))
        .unionByName(checkpointRefs
          .join(activeRocrate, Seq("job_id"), "left_semi")
          .select(col("hidden_key")))
        .unionByName(uploadsJ.filter(uploadLive).select(col("hidden_key")))
        .distinct()

    val cutoff = nowMs - OrphanGraceMs
    val entryVerdicts = hidden
      .join(referenced.withColumn("is_ref", lit(true)),
        Seq("hidden_key"), "left_outer")
      .join(activeRocrate.withColumn("ns_active", lit(true)),
        hidden("namespace_job_id") === activeRocrate("job_id"),
        "left_outer")
      .select(lit("entry").as("phase"),
        col("hidden_key").as("id"), col("hidden_key"),
        when(coalesce(col("is_ref"), lit(false)), "kept_referenced")
          .when(coalesce(col("ns_active"), lit(false)),
            "kept_active_namespace")
          .when(col("modified_at_ms").isNull, "kept_no_mtime")
          .when(col("modified_at_ms") > cutoff, "kept_grace")
          .otherwise("orphan_deleted").as("verdict"))

    uploadVerdicts.unionByName(entryVerdicts)
  }
}
