package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Job-queue drain batch (reference `operations/src/jobs/drain.rs` +
  * `store.rs` claim/requeue).
  *
  * Pinned semantics:
  *  - claim sweep (`claim_due_jobs`, `drain.rs:179-303`): the due index
  *    pages in `(due_ts, job_id)` order; the first FUTURE row ends the
  *    scan. Per row: an orphaned index row (record gone) or a
  *    foreign-owned record drops the row; a non-Queued record is
  *    NotEligible (no write, no budget); a Queued record with
  *    `cancel_requested && !has_run && attempt_intent.is_none()`
  *    terminalizes as CancelledFresh WITHOUT spending budget
  *    (`claim_job`, `store.rs:766-806`); otherwise the job claims
  *    against its execution class's budget — a saturated class is
  *    SKIPPED without a write (`deferred_saturated`), and the scan stops
  *    outright once BOTH class budgets hit zero.
  *  - lease sweep (`process_job_queue_batch`, `drain.rs:88-160`): up to
  *    TWO pages of `JOB_DRAIN_BATCH_SIZE=128` expired leases; the second
  *    page runs only when the first was full AND every row of it was
  *    reconciled. Per expired row (`requeue_job`,
  *    `store.rs:1008-1072`): record gone → orphan row healed; terminal
  *    record, claim-less record (already requeued) or a lease the record
  *    RENEWED past `now` (stale index row) → skipped; a submitted
  *    external attempt (`attempt_intent` set) → routed to reconcile,
  *    untouched — requeuing would double-run the container; otherwise
  *    attempts+1, and either terminal Failed once `JOB_MAX_ATTEMPTS=5`
  *    is spent (TerminalCleanup payloads are exempt from the cap) or
  *    requeued with `due = now + queue_retry_after_ms(attempts)` (the
  *    shared 250·2^min(a,7)-capped-30s ladder, `queue_backoff.rs:4-12`).
  *  - trailer (`next_drain_delays`, `drain.rs:314-344`): earliest due
  *    head and earliest lease head as delays from now; an already-due
  *    lease head reports the `JOB_RECONCILE_REARM` floor (20 000 ms —
  *    reconciled attempts keep their expired lease rows by design, which
  *    would otherwise pin the timer at zero); `next_due_after` is the
  *    min of the two. This gate reports the PRE-drain heads (a pure
  *    function of the input relations); the reference recomputes them
  *    after its mutations — the floor and min rules are identical.
  *
  * Scale shape: the due/lease keyspaces are queues (bounded by scheduled
  * work). The sequential budget walk is two per-class running counts over
  * a TakeOrdered-style prefix; records join the index rows by job id with
  * the index side broadcast when small. No driver loop.
  */
object JobDrain {

  val JobMaxAttempts = 5
  val DrainBatchSize = 128
  val ReconcileRearmMs = 20000L

  /** One drain pass.
    *
    * `due(due_ts, job_id)` / `leases(lease_ts, job_id)` — the schedule
    * index; `records(job_id, state, owner, exec_class, cancel_requested,
    * has_run, attempt_intent, attempts, lease_expires_at_ms, payload)`.
    * Emits one row per processed index row:
    * `(phase, pos, job_id, verdict, attempts_after, due_after_ms)` plus
    * the `(deferred_saturated, next_due_after_ms)` trailer on every row.
    */
  def drain(due: DataFrame, leases: DataFrame, records: DataFrame,
      ownerNodeId: String, ipBudget: Int, extBudget: Int,
      nowMs: Long): DataFrame = {
    val rec = records.select(col("job_id"), col("state"), col("owner"),
      col("exec_class"), col("cancel_requested"), col("has_run"),
      col("attempt_intent"), col("attempts"), col("lease_expires_at_ms"),
      col("payload"))

    // ---- claim sweep: due rows <= now in (ts, id) order ----
    //
    // The budget walk looks inherently sequential, but the claimed set of
    // each class is exactly the FIRST `budget` eligible rows of that class
    // in (ts, id) order — saturated skips never consume budget, so class
    // interleave cannot change it. So the cut row (the claim on which
    // `budget.is_empty()` fires) is computable from two per-class
    // TakeOrdered prefixes — fully distributed, no global window — and
    // the single-partition verdict window then runs only on the bounded
    // `<= cut` prefix (jp1's running-sum-on-a-TakeOrdered-prefix shape:
    // 33.7 s -> ~4 s at 100x for this gate).
    // records are keyspace-sized — never broadcast or shuffle them
    // wholesale. The due head is the probe side: its keys broadcast INTO
    // the record scan (semi-join), and the queue-sized reduced record set
    // then broadcasts into the verdict join (the drs1 shape). Both
    // queue-sized intermediates persist: the claim walk re-reads them for
    // the per-class prefixes, the cut filter and the deferred flag.
    val dueHead = due.filter(col("due_ts") <= nowMs).persist()
    graft.Caches.track(dueHead)
    val recDue = rec.join(broadcast(dueHead.select(col("job_id")).distinct),
      Seq("job_id"), "left_semi").persist()
    graft.Caches.track(recDue)
    val dueRows = dueHead.join(broadcast(recDue), Seq("job_id"),
      "left_outer")
    val claimEligible = col("state") === "Queued" &&
      col("owner") === ownerNodeId &&
      !(col("cancel_requested") && !col("has_run") &&
        col("attempt_intent").isNull)
    def lastClaim(cls: String, budget: Int): Option[(Long, String)] = {
      if (budget == 0) return Some((Long.MinValue, "")) // spent from start
      val top = dueRows.filter(claimEligible && col("exec_class") === cls)
        .orderBy(col("due_ts"), col("job_id"))
        .limit(budget)
        .agg(count(lit(1)).as("n"), max(struct(col("due_ts"),
          col("job_id"))).as("last"))
        .collect()(0)
      if (top.getLong(0) < budget) None // class never saturates -> no cut
      else {
        val last = top.getStruct(1)
        Some((last.getLong(0), last.getString(1)))
      }
    }
    val cutPair: Option[(Long, String)] =
      if (ipBudget == 0 && extBudget == 0) None // early return, no scan
      else for {
        ip <- lastClaim("InProcess", ipBudget)
        ext <- lastClaim("ExternalAttempt", extBudget)
      } yield if (ip._1 > ext._1 || (ip._1 == ext._1 && ip._2 > ext._2))
        ip else ext
    val bounded =
      if (ipBudget == 0 && extBudget == 0) dueRows.limit(0)
      else cutPair.map { case (ts, id) =>
        dueRows.filter(col("due_ts") < ts ||
          (col("due_ts") === ts && col("job_id") <= id))
      }.getOrElse(dueRows)
    val classRn = (cls: String) => sum(
      when(claimEligible && col("exec_class") === cls, 1).otherwise(0))
      .over(Window.orderBy(col("due_ts"), col("job_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val walked = bounded
      .withColumn("pos", row_number().over(
        Window.orderBy(col("due_ts"), col("job_id"))))
      .withColumn("ip_rn", classRn("InProcess"))
      .withColumn("ext_rn", classRn("ExternalAttempt"))
    val claimVerdict =
      when(col("state").isNull, "orphan_dropped")
        .when(col("owner") =!= ownerNodeId, "foreign_dropped")
        .when(col("state") =!= "Queued", "not_eligible")
        .when(col("cancel_requested") && !col("has_run") &&
          col("attempt_intent").isNull, "cancelled_fresh")
        .when(col("exec_class") === "InProcess",
          when(col("ip_rn") <= ipBudget, "claimed")
            .otherwise("skipped_saturated"))
        .otherwise(when(col("ext_rn") <= extBudget, "claimed")
          .otherwise("skipped_saturated"))
    val claims = walked
      .select(lit("claim").as("phase"), col("pos"), col("job_id"),
        claimVerdict.as("verdict"),
        lit(null).cast("long").as("attempts_after"),
        when(claimVerdict === "claimed",
          lit(nowMs + 60000L)).as("due_after_ms"), // lease_expires
        claimVerdict.as("v"), col("exec_class"))

    val deferred = (ipBudget == 0 && extBudget == 0) ||
      Option(claims.agg(max(col("v") === "skipped_saturated").as("def"))
        .collect()(0).get(0)).exists(_.asInstanceOf[Boolean])

    // ---- lease sweep: expired rows, 128-page with the 2-page rule ----
    // at most 2 pages ever process, so TakeOrdered the expired head to
    // 256 rows BEFORE the single-partition window (the index is ts-
    // ordered, so the first 2*128 expired rows are exactly the reachable
    // set)
    val leaseHead = leases.filter(col("lease_ts") <= nowMs)
      .orderBy(col("lease_ts"), col("job_id"))
      .limit(2 * DrainBatchSize).persist()
    graft.Caches.track(leaseHead)
    val recLease = rec.join(
      broadcast(leaseHead.select(col("job_id")).distinct),
      Seq("job_id"), "left_semi")
    val leaseRows = leaseHead.join(broadcast(recLease), Seq("job_id"),
      "left_outer")
      .withColumn("pos", row_number().over(
        Window.orderBy(col("lease_ts"), col("job_id"))))
    val capped = col("attempts") + 1 >= JobMaxAttempts &&
      col("payload") =!= "TerminalCleanup"
    val leaseVerdict =
      when(col("state").isNull, "orphan_healed")
        .when(col("state").isin("Failed", "Cancelled", "Succeeded"),
          "skipped")
        .when(col("lease_expires_at_ms").isNull, "skipped") // already requeued
        .when(col("lease_expires_at_ms") > nowMs, "skipped") // renewed lease
        .when(col("exec_class") === "ExternalAttempt" &&
          col("attempt_intent").isNotNull, "reconciled")
        .when(capped, "failed_capped")
        .otherwise("requeued")
    val judged = leaseRows.withColumn("v", leaseVerdict)
    // page 2 only when page 1 was FULL and fully reconciled
    val p1 = judged.filter(col("pos") <= DrainBatchSize).agg(
      count(lit(1)).as("n"),
      sum(when(col("v") === "reconciled", 1).otherwise(0)).as("n_rec"))
      .select((col("n") === DrainBatchSize &&
        col("n") === col("n_rec")).as("page2"))
    val sweeps = judged.crossJoin(broadcast(p1))
      .filter(col("pos") <= DrainBatchSize ||
        (col("page2") && col("pos") <= 2 * DrainBatchSize))
      .select(lit("lease").as("phase"), col("pos"), col("job_id"),
        col("v").as("verdict"),
        when(col("v").isin("requeued", "failed_capped"),
          col("attempts") + 1).cast("long").as("attempts_after"),
        when(col("v") === "requeued", lit(nowMs) +
          MirrorRepair.retryAfterMs(col("attempts") + 1))
          .cast("long").as("due_after_ms"),
        col("v"), col("exec_class"))

    // ---- trailer: next due/lease heads with the re-arm floor ----
    val Array(heads) = due.agg(min(col("due_ts")).as("due_head"))
      .crossJoin(leases.agg(min(col("lease_ts")).as("lease_head")))
      .collect()
    def delay(ts: Any): Option[Long] = Option(ts)
      .map(t => math.max(0L, t.asInstanceOf[Long] - nowMs))
    val dueDelay = delay(heads.get(0))
    val leaseDelay = delay(heads.get(1))
      .map(d => if (d == 0L) ReconcileRearmMs else d)
    val nextDue: Option[Long] = (dueDelay, leaseDelay) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, None) => a
      case (None, b) => b
    }

    claims.unionByName(sweeps)
      .drop("v", "exec_class")
      .withColumn("deferred_saturated", lit(deferred))
      .withColumn("next_due_after_ms",
        nextDue.map(lit(_)).getOrElse(lit(null)).cast("long"))
  }
}
