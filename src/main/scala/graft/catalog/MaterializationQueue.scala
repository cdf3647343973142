package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metadata-materialization queue drain + dead-letter requeue (reference
  * `operations/src/metadata/materialization_queue.rs`).
  *
  * The reference drains a due-index of per-(document, event) jobs, groups
  * them by document, and walks each group in event order
  * (`process_materialization_job_groups`, `materialization_queue.rs:321-339`).
  * Per job the decision ladder is (`process_materialization_job`, `:1551`):
  *
  *  1. an OLDER live sidecar job for the same document blocks this one —
  *     older = smaller event_id, not advanced this batch, not obsoleted by
  *     the document's status, and its create event still exists (orphans
  *     are dropped during the check, `older_job_exists`, `:1747-1773`);
  *     a blocked job stops the group (nothing later may apply out of order);
  *  2. obsolescence vs the status record (`job_obsolescence`, `:1818-1832`):
  *     a FINAL status (materialized | failed) at `status.event_id >=
  *     job.event_id` completes the job with no status write; a non-final
  *     status at the same event with MORE attempts means a newer retry of
  *     this very job is queued — only the stale due-index row is dropped
  *     (the sidecar row belongs to the newer retry);
  *  3. a missing create event completes the job silently (`:1589-1603`);
  *  4. a deleted graph completes the job with a terminal Failed status
  *     (`:1605-1623`);
  *  5. the apply: success → Materialized status (attempts+1) + IRI-index
  *     projection + a best-effort graph sync; a terminal (validation)
  *     error → Failed status; anything else defers the job
  *     (`defer_materialization_job`, `:1524-1549`): only APPLICATION
  *     failures spend the failure budget (`materialization_failure_kind`,
  *     `:2268-2290`), and a job at `failures >= 10` parks as a dead letter
  *     (park count = max(previous dead letter, job)+1, requeue backoff
  *     60 s · 2^(parks-1) capped at 1 h, `parked_dead_letter`, `:921-947`)
  *     while the rest reschedule with the queue backoff
  *     250 ms · 2^min(attempts,7) capped at 30 s (`queue_backoff.rs:8-12`);
  *     both stop the group;
  *  6. status writes are dominance-guarded (`should_write_final_…`,
  *     `should_write_pending_retry_status`, `:1878-1913`): a status at a
  *     LATER event — even a pending one — silences the write, as does a
  *     final or not-older retry status at the same event;
  *  7. completed syncs dedup to ONE per graph, last writer wins
  *     (`dedupe_graph_syncs`, `:425-438`).
  *
  * The dead-letter sweep (`requeue_dead_letters`, `:975-1048`) walks parked
  * jobs: not-yet-due letters wait; letters whose create event vanished are
  * deleted; letters the document moved past — a final status beyond the
  * event, or Materialized at it (`dead_letter_superseded`, `:1051-1059`) —
  * drop; the rest requeue with a fresh attempt budget but only ONE failure
  * of headroom (failures = 9) so a poison document re-parks fast, keeping
  * their park count so the requeue backoff keeps growing (`:1062-1101`).
  *
  * Scale: every rule is a key-equi join (status/events/lifecycle on doc or
  * (doc, event)) plus two windows over the per-document group — group size
  * is events-in-flight per document, never corpus-sized. The due page cap
  * and wake-up hint are the rq2-pinned mechanism (`ReplQueue.dueScan`) and
  * are not re-modelled here. */
object MaterializationQueue {

  val MaxFailures = 10L         // materialization_queue.rs:57
  val QueueRetryBaseMs = 250L   // queue_backoff.rs:1 (QUEUE_RETRY_BASE_MS)
  val QueueRetryMaxMs = 30000L
  val DeadLetterBaseMs = 60000L // materialization_queue.rs:60
  val DeadLetterMaxMs = 3600000L

  /** 250·2^min(n,7) ms capped at 30 s (queue_backoff.rs:8-12). */
  private def queueBackoff(attempts: Column): Column =
    least(lit(QueueRetryMaxMs),
      lit(QueueRetryBaseMs) *
        expr("CAST(shiftleft(1, CAST(least(__qb_n, 7) AS INT)) AS BIGINT)"))

  /** 60 s·2^min(parks-1,7) capped at 1 h (requeue_after_ms, :939-945). */
  private def dlBackoff(parks: Column): Column =
    least(lit(DeadLetterMaxMs),
      lit(DeadLetterBaseMs) *
        expr("CAST(shiftleft(1, CAST(least(__dl_n - 1, 7) AS INT)) AS BIGINT)"))

  /** One drain pass over the due set.
    *
    * `jobs(doc_id, event_id, due_at_ms, attempts, failures, parks)` — the
    * queue (due index ≡ sidecar); `status(doc_id, event_id, attempts,
    * state)` with state ∈ pending|materialized|failed — at most one row per
    * document; `events(doc_id, event_id, graph_iri, peers, apply_outcome)`
    * with apply_outcome ∈ ok|terminal|transient|application — the simulated
    * craqle apply result; `lifecycle(graph_iri, deleted)`;
    * `deadLetters(doc_id, event_id, parks)` — existing parked state.
    *
    * Returns one row per DUE job: `(doc_id, event_id, verdict, attempted,
    * new_state, new_attempts, new_failures, next_due_at_ms, new_parks,
    * requeue_at_ms, job_deleted, sidecar_deleted, status_written,
    * sync_scheduled)`. */
  def drain(jobs: DataFrame, status: DataFrame, events: DataFrame,
      lifecycle: DataFrame, deadLetters: DataFrame, nowMs: Long): DataFrame = {
    val st = status.select(col("doc_id"),
      col("event_id").as("st_event"), col("attempts").as("st_attempts"),
      col("state").as("st_state"))
    val ev = events.select(col("doc_id"), col("event_id"), col("graph_iri"),
      col("peers"), col("apply_outcome"), lit(true).as("ev_exists"))
    val dl = deadLetters.select(col("doc_id"), col("event_id"),
      col("parks").as("dl_parks"))

    val ann = jobs
      .join(st, Seq("doc_id"), "left_outer")
      .join(ev, Seq("doc_id", "event_id"), "left_outer")
      .join(lifecycle.select(col("graph_iri"),
        col("deleted").as("g_deleted")), Seq("graph_iri"), "left_outer")
      .join(dl, Seq("doc_id", "event_id"), "left_outer")
      .withColumn("ev_ok", coalesce(col("ev_exists"), lit(false)))
      .withColumn("st_final", col("st_state").isin("materialized", "failed"))
      .withColumn("obsolete_final", coalesce(
        col("st_event") >= col("event_id") && col("st_final"), lit(false)))
      .withColumn("retry_advanced", !col("obsolete_final") && coalesce(
        col("st_event") === col("event_id") &&
          col("st_attempts") > col("attempts"), lit(false)))
      // does THIS job, sitting in the sidecar, block a later one? yes while
      // its event exists, the status has not obsoleted it, and it will not
      // itself complete this batch (future due, or a stale retry row)
      .withColumn("blocking", col("ev_ok") && !col("obsolete_final") &&
        (col("due_at_ms") > nowMs || col("retry_advanced")))

    val wPrior = Window.partitionBy("doc_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDoc = Window.partitionBy("doc_id")
    val failNext = col("failures") +
      when(col("apply_outcome") === "application", 1L).otherwise(0L)

    val prelim = ann
      .withColumn("blocked", coalesce(
        max(when(col("blocking"), 1L).otherwise(0L)).over(wPrior) === 1L,
        lit(false)))
      .withColumn("is_due", col("due_at_ms") <= nowMs)
      .withColumn("fail_next", failNext)
      .withColumn("prelim",
        when(col("blocked"), "blocked")
          .when(col("obsolete_final"), "obsolete_final")
          .when(col("retry_advanced"), "retry_advanced")
          .when(!col("ev_ok"), "event_missing")
          .when(coalesce(col("g_deleted"), lit(false)), "graph_deleted")
          .when(col("apply_outcome") === "ok", "materialized")
          .when(col("apply_outcome") === "terminal", "failed_terminal")
          .when(failNext >= MaxFailures, "parked")
          .otherwise("rescheduled"))
      // the group stops at the first blocked or deferred job — everything
      // after it waits for the next batch (stop_group, :1503-1510)
      .withColumn("stop_ev", min(when(col("is_due") &&
        col("prelim").isin("blocked", "rescheduled", "parked"),
        col("event_id"))).over(wDoc))
      .withColumn("verdict", when(
        col("stop_ev").isNotNull && col("event_id") > col("stop_ev"),
        "not_attempted").otherwise(col("prelim")))
      .filter(col("is_due"))

    val finalStatus = Seq("materialized", "failed_terminal", "graph_deleted",
      "parked")
    val completes = Seq("materialized", "failed_terminal", "graph_deleted",
      "event_missing", "obsolete_final", "parked")
    // dominance guards (:1878-1913); attempts written is always attempts+1
    val curBeats =
      coalesce(col("st_event") > col("event_id"), lit(false)) ||
      coalesce(col("st_event") === col("event_id") &&
        col("st_attempts") >= col("attempts") + 1L, lit(false)) ||
      coalesce(col("st_event") === col("event_id") && col("st_final"),
        lit(false))
    val curBeatsPending =
      coalesce(col("st_event") > col("event_id"), lit(false)) ||
      coalesce(col("st_event") === col("event_id") &&
        col("st_attempts") > col("attempts") + 1L, lit(false))

    val out = prelim
      .withColumn("attempted",
        !col("verdict").isin("blocked", "not_attempted", "retry_advanced"))
      .withColumn("new_state",
        when(col("verdict") === "materialized", "materialized")
          .when(col("verdict").isin("failed_terminal", "graph_deleted",
            "parked"), "failed")
          .when(col("verdict") === "rescheduled", "pending"))
      .withColumn("new_attempts", when(col("new_state").isNotNull,
        col("attempts") + 1L))
      .withColumn("new_failures",
        when(col("verdict").isin("rescheduled", "parked"), col("fail_next"))
          .when(col("new_state").isNotNull, col("failures")))
      .withColumn("__qb_n", col("attempts") + 1L)
      .withColumn("next_due_at_ms", when(col("verdict") === "rescheduled",
        lit(nowMs) + queueBackoff(col("__qb_n"))))
      .withColumn("__dl_n", when(col("verdict") === "parked",
        greatest(coalesce(col("dl_parks"), lit(0L)), col("parks")) + 1L))
      .withColumn("new_parks", col("__dl_n"))
      .withColumn("requeue_at_ms", when(col("verdict") === "parked",
        lit(nowMs) + dlBackoff(col("__dl_n"))))
      .withColumn("job_deleted",
        col("verdict").isin(completes :+ "retry_advanced": _*))
      .withColumn("sidecar_deleted", col("verdict").isin(completes: _*))
      .withColumn("status_written",
        when(col("verdict").isin(finalStatus: _*), !curBeats)
          .when(col("verdict") === "rescheduled", !curBeatsPending)
          .otherwise(lit(false)))
      // one best-effort sync per graph, last completed apply wins (:425-438);
      // picked deterministically as the max (doc, event) materialized job
      .withColumn("sync_scheduled", col("verdict") === "materialized" &&
        col("doc_id") * 4096L + col("event_id") === max(when(
          col("verdict") === "materialized",
          col("doc_id") * 4096L + col("event_id")))
          .over(Window.partitionBy("graph_iri")))

    out.select(col("doc_id"), col("event_id"), col("verdict"),
      col("attempted"), col("new_state"), col("new_attempts"),
      col("new_failures"), col("next_due_at_ms"), col("new_parks"),
      col("requeue_at_ms"), col("job_deleted"), col("sidecar_deleted"),
      col("status_written"), col("sync_scheduled"))
  }

  /** The dead-letter sweep (`requeue_dead_letters`, :975-1048).
    *
    * `deadLetters(doc_id, event_id, parks, requeue_at_ms)`; `status` and
    * `events` as in [[drain]]. Returns one row per dead letter:
    * `(doc_id, event_id, verdict, letter_deleted, job_attempts,
    * job_failures, job_parks)` where verdict ∈ waiting |
    * dropped_missing_event | superseded | requeued. */
  def requeueDeadLetters(deadLetters: DataFrame, status: DataFrame,
      events: DataFrame, nowMs: Long): DataFrame = {
    val st = status.select(col("doc_id"),
      col("event_id").as("st_event"), col("state").as("st_state"))
    val ev = events.select(col("doc_id"), col("event_id"),
      lit(true).as("ev_exists"))
    deadLetters
      .join(st, Seq("doc_id"), "left_outer")
      .join(ev, Seq("doc_id", "event_id"), "left_outer")
      .withColumn("st_final", col("st_state").isin("materialized", "failed"))
      // superseded: the document holds a final status beyond this event, or
      // already materialized AT it (dead_letter_superseded, :1051-1059)
      .withColumn("superseded", coalesce(
        col("st_event") >= col("event_id") && col("st_final") &&
          (col("st_event") > col("event_id") ||
            col("st_state") === "materialized"), lit(false)))
      .withColumn("verdict",
        when(col("requeue_at_ms") > nowMs, "waiting")
          .when(!coalesce(col("ev_exists"), lit(false)),
            "dropped_missing_event")
          .when(col("superseded"), "superseded")
          .otherwise("requeued"))
      .withColumn("letter_deleted", col("verdict") =!= "waiting")
      // fresh attempt budget, ONE failure of headroom, parks carried
      .withColumn("job_attempts",
        when(col("verdict") === "requeued", 0L))
      .withColumn("job_failures",
        when(col("verdict") === "requeued", MaxFailures - 1L))
      .withColumn("job_parks",
        when(col("verdict") === "requeued", col("parks")))
      .select(col("doc_id"), col("event_id"), col("verdict"),
        col("letter_deleted"), col("job_attempts"), col("job_failures"),
        col("job_parks"))
  }
}
