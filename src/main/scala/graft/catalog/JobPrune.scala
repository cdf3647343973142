package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Job-store retention prune batch (reference
  * `operations/src/jobs/prune.rs:33-140`, `process_job_prune_batch`) as a
  * verdict relation.
  *
  * The reference walks the `prune/` schedule index in (expiry, job_id) order
  * and stops at the FIRST of: the deletion cap (4×512 accumulated delete
  * keys — checked BEFORE each row), a not-yet-due row (sets the retry
  * timer), a job whose entry keyspace alone overflows what is left of the
  * cap (that job contributes its truncated entry deletes but is NOT counted
  * pruned), or 2048 processed prunes. Along the way: a malformed index row
  * deletes itself (1 key, not a prune), an orphan index row deletes index +
  * tombstone (2 keys, counted pruned), an Execution job with a non-terminal
  * cleanup twin is FENCED — skipped entirely, it outlives retention
  * (`cleanup_pending`, `prune.rs:167-176`) — and a prunable job deletes its
  * entry rows plus the fixed record-level set (7 base keys, +1 RO-Crate
  * active marker, +1 dedup index when keyed, +1 per used attempt epoch —
  * `store.rs:146-194`).
  *
  * The sequential cutoffs are running sums over the due slice: every row
  * before the stop is fully processed, so the prefix sums are exact, and
  * the earliest candidate stop wins (cap ≻ entry-truncation ≻ processed cap
  * on the same row). Output: one row per verdict (malformed / orphan /
  * fenced / pruned / truncated) with key-delete counts, plus the batch
  * trailer (has_more, next_due_after_ms) on every row.
  *
  * Scale: the due slice is one GC batch — the cap bounds EFFECT at 2048
  * keys, and the single ordered window runs over a queue-contract-sized
  * relation (the reference walks the same rows sequentially); the not-due
  * tail is never scanned (pushed filter + one MIN aggregate for the timer).
  */
object JobPrune {

  /** `JOB_PRUNE_SCAN_PAGE_SIZE` (`jobs/mod.rs:49`); cap = 4 pages. */
  val PageSize = 512

  /** `index(expiry_ms, job_id, malformed, exists, fenced, n_entries,
    * rocrate, has_dedup, epochs)`.
    *
    * The ordered cutoff scan runs on a TakeOrdered PREFIX of the due slice
    * (4×cap rows — every non-fenced row contributes ≥1 delete key, so the
    * stop lands inside unless the prefix is nearly all fences); the rare
    * fence-wall case falls back to the full ordered slice. The exact-fill
    * check and the retry timer are plain aggregates over the unsorted
    * slices — a billion-row backlog never pays a global sort. */
  def pruneBatch(index: DataFrame, nowMs: Long, pageSize: Int = PageSize): DataFrame = {
    val cap = pageSize * 4
    val due = index.filter(col("expiry_ms") <= nowMs)
    val kFixed = lit(7) + when(col("rocrate"), 1).otherwise(0) +
      when(col("rocrate") && col("has_dedup"), 1).otherwise(0) + col("epochs")
    val prunable = !col("malformed") && col("exists") && !col("fenced")
    val rows = due
      .withColumn("kind",
        when(col("malformed"), "malformed")
          .when(!col("exists"), "orphan")
          .when(col("fenced"), "fenced")
          .otherwise("pruned"))
      .withColumn("d_full",
        when(col("malformed"), 1L)
          .when(!col("exists"), 2L)
          .when(col("fenced"), 0L)
          .otherwise((col("n_entries") + kFixed).cast("long")))
      .withColumn("p_inc",
        when(prunable || (!col("malformed") && !col("exists")), 1L).otherwise(0L))

    val w = Window.orderBy(col("expiry_ms"), col("job_id"))
    val prev = w.rowsBetween(Window.unboundedPreceding, -1)
    def staged(df: DataFrame): DataFrame = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_prev", coalesce(sum(col("d_full")).over(prev), lit(0L)))
      .withColumn("p_after",
        coalesce(sum(col("p_inc")).over(prev), lit(0L)) + col("p_inc"))
      .withColumn("remaining", greatest(lit(cap.toLong) - col("cum_prev"), lit(1L)))
      .withColumn("cap_stop", col("cum_prev") >= cap)
      .withColumn("trunc_stop",
        col("kind") === "pruned" && col("n_entries") > col("remaining"))
      .withColumn("p_stop", col("p_after") >= cap)
    // earliest stop wins; on the same row, cap beats truncation beats the
    // processed cap (the reference checks them in that order)
    def findStops(st: DataFrame): (Option[Long], Option[Long], Option[Long]) = {
      val r = st.agg(
        min(when(col("cap_stop"), col("rank"))).as("s_cap"),
        min(when(col("trunc_stop") && !col("cap_stop"), col("rank"))).as("s_tr"),
        min(when(col("p_stop") && !col("cap_stop") && !col("trunc_stop"),
          col("rank"))).as("s_p")).head()
      def o(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (o(0), o(1), o(2))
    }

    val prefixN = cap * 4
    val dueN = due.count()
    var st = staged(
      if (dueN > prefixN) rows.orderBy(col("expiry_ms"), col("job_id")).limit(prefixN)
      else rows).persist()
    graft.Caches.track(st)
    var (sCap, sTr, sP) = findStops(st)
    if (dueN > prefixN && sCap.isEmpty && sTr.isEmpty && sP.isEmpty) {
      // fence wall: the whole prefix freed fewer than cap keys — scan all
      st = staged(rows).persist()
      graft.Caches.track(st)
      val s = findStops(st); sCap = s._1; sTr = s._2; sP = s._3
    }
    val stopRank = Seq(sCap, sTr, sP).flatten
      .foldLeft(Long.MaxValue)(math.min)
    val stopKind =
      if (stopRank == Long.MaxValue) ""
      else if (sCap.contains(stopRank)) "cap"
      else if (sTr.contains(stopRank)) "trunc"
      else "p"

    val verdicts = st
      .filter(col("rank") < stopRank ||
        (lit(stopKind).isin("trunc", "p") && col("rank") === stopRank))
      .withColumn("verdict",
        when(lit(stopKind) === "trunc" && col("rank") === stopRank, "truncated")
          .otherwise(col("kind")))
      .withColumn("n_del",
        when(col("verdict") === "truncated", col("remaining"))
          .otherwise(col("d_full")))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n"), sum(col("n_del")).as("n_deletes"))

    // has_more: any stop, OR the cap filled exactly across the due slice
    // while a not-due row exists — the reference checks the cap BEFORE the
    // expiry check, so that next row stops the scan without arming the
    // timer (prune.rs:65-80).
    val dTotal = rows.agg(coalesce(sum(col("d_full")), lit(0L)).as("d"))
      .head().getLong(0)
    val futRow = index.filter(col("expiry_ms") > nowMs)
      .agg(min(col("expiry_ms"))).head()
    val nextExpiry = if (futRow.isNullAt(0)) None else Some(futRow.getLong(0))
    val hasMore = stopRank != Long.MaxValue ||
      (nextExpiry.isDefined && dTotal >= cap)
    val nextDue: Option[Long] =
      if (hasMore) None else nextExpiry.map(_ - nowMs)
    verdicts
      .withColumn("has_more", lit(hasMore))
      .withColumn("next_due_after_ms",
        nextDue.map(lit(_)).getOrElse(lit(null)).cast("long"))
      .select(col("verdict"), col("n"), col("n_deletes"), col("has_more"),
        col("next_due_after_ms"))
  }
}
