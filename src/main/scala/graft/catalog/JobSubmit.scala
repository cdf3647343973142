package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Job submission (reference `operations/src/jobs/submit.rs`).
  *
  * The dedup ladder (`ReadDedup`/`VerifyDedup`, `submit.rs:323-368`): a
  * live `job_dedup_index` entry short-circuits to the existing job id when
  * the plan digest matches, raises a plan conflict when it differs — but
  * in BOTH cases only after verifying the target job record still exists
  * and decodes; a dangling entry (record gone or undecodable) falls
  * through to a fresh create whose transactional write REPOINTS the dedup
  * row, "so a ghost row can neither poison its key nor conflict against a
  * dead job" (`:197-202`). An unparseable index value falls through the
  * same way.
  *
  * The active cap (`check_active`, `:213-229`, `:369-379`): jobs without a
  * cap skip the check; a zero cap rejects outright; otherwise the
  * PER-USER active-job keyspace is scanned (capped at `limit` — the scan
  * never walks past the refusal point) and `n_active >= limit` rejects
  * with ActiveJobLimit.
  *
  * Scale: one broadcast-sized join per control relation (dedup index, job
  * records, per-user active counts); submission batches fold without a
  * corpus-sized shuffle. */
object JobSubmit {

  /** `subs(sub_id, user_id, dedup_key, plan_digest, active_cap)` —
    * `dedup_key` NULL skips dedup, `active_cap` NULL skips the cap;
    * `dedupIndex(dedup_key, job_id, digest, parseable)`;
    * `jobs(job_id, decodable)`; `active(user_id, n_active)`.
    *
    * Returns `(sub_id, outcome, existing_job_id, dedup_ghost,
    * dedup_repointed)` with outcome ∈ existing | plan_conflict |
    * active_limit | created. */
  def fold(subs: DataFrame, dedupIndex: DataFrame, jobs: DataFrame,
      active: DataFrame): DataFrame = {
    val idx = dedupIndex.select(col("dedup_key"),
      col("job_id").as("idx_job"), col("digest").as("idx_digest"),
      col("parseable"))
    val rec = jobs.select(col("job_id").as("idx_job"),
      col("decodable"))
    subs
      .join(idx, Seq("dedup_key"), "left_outer")
      .join(rec, Seq("idx_job"), "left_outer")
      .join(active.select(col("user_id"), col("n_active")),
        Seq("user_id"), "left_outer")
      // the entry is live only when it parses AND its job still decodes
      .withColumn("dedup_live", coalesce(col("parseable"), lit(false)) &&
        coalesce(col("decodable"), lit(false)))
      .withColumn("dedup_ghost", col("idx_job").isNotNull &&
        !col("dedup_live"))
      .withColumn("cap_hit", col("active_cap").isNotNull &&
        (col("active_cap") === 0L ||
          coalesce(col("n_active"), lit(0L)) >= col("active_cap")))
      .withColumn("outcome",
        when(col("dedup_live") && col("plan_digest") === col("idx_digest"),
          "existing")
          .when(col("dedup_live"), "plan_conflict")
          .when(col("cap_hit"), "active_limit")
          .otherwise("created"))
      .withColumn("existing_job_id",
        when(col("outcome").isin("existing", "plan_conflict"),
          col("idx_job")))
      .withColumn("dedup_repointed", col("outcome") === "created" &&
        col("dedup_key").isNotNull)
      .select(col("sub_id"), col("outcome"), col("existing_job_id"),
        col("dedup_ghost"), col("dedup_repointed"))
  }
}
