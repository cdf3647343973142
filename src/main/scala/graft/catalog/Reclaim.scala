package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-addressed blob reclaim — the garbage-collection sweep of the
  * reference's blob store (`operations/src/blob/reclaim.rs`) as one
  * relational verdict pass over the reclaim-candidate queue.
  *
  * Per candidate `(blake3, backend, enqueued_s)` the sweep resolves, in the
  * reference's own precedence order (`sweep_at` checks strategy and grace
  * BEFORE driving the per-candidate operation; the operation then reads the
  * location and scans referencing versions — `reclaim.rs:87-165,560-610`):
  *
  *  1. `Dropped` — no cleanup strategy for the backend (vanished backend /
  *     missing tenant record resolves to retain, `reclaim.rs:119-135,
  *     202-206`) or the strategy has no grace (retain);
  *  2. `NotDue` — `enqueued_at + grace > now`: the row stays queued
  *     (`reclaim.rs:136-141`);
  *  3. `Dropped` — the location row is already gone (stale queue entry);
  *  4. `Pinned` — some live version still names THIS EXACT copy
  *     (`version.location_key() == (blake3, backend)`,
  *     `reclaim.rs:563-588`) — a copy of the same hash on another backend
  *     does not pin;
  *  5. `Freed` — otherwise; `bytes` = the location's blob size
  *     (`free_copy`, `reclaim.rs:599-610`).
  *
  * Scale: the strategy catalog broadcasts (backend-count-sized); candidates,
  * locations and the distinct reference set all hash-partition on
  * `(blake3, backend)` — one shuffle family, no per-candidate driver loop
  * (the reference pages 128 rows at a time through the same joins;
  * `RECLAIM_TICK_LIMIT`/`next_start_after` pagination is scheduling, not
  * semantics, and disappears in a set-oriented sweep).
  */
object Reclaim {

  /** Sweep verdict aggregate: one row per (backend, verdict) with the
    * candidate count and freed bytes — the relational form of
    * `ReclaimOutcome` (`reclaim.rs:71-83`), per backend.
    *
    * `candidates(blake3, backend, enqueued_s)`; `locations(blake3, backend,
    * size)`; `strategies(backend, grace_s)` — NULL grace means retain;
    * `references(blake3, backend)` — the live version→copy bindings. */
  def sweepVerdicts(candidates: DataFrame, locations: DataFrame,
      strategies: DataFrame, references: DataFrame, nowS: Long): DataFrame = {
    val loc = locations.select(col("blake3"), col("backend"),
      col("size").as("loc_size"))
    val refs = references.select(col("blake3"), col("backend")).distinct()
      .withColumn("is_pinned", lit(true))
    candidates
      .join(broadcast(strategies), Seq("backend"), "left")
      .join(loc, Seq("blake3", "backend"), "left")
      .join(refs, Seq("blake3", "backend"), "left")
      .withColumn("verdict",
        when(col("grace_s").isNull, "Dropped")
          .when(col("enqueued_s") + col("grace_s") > nowS, "NotDue")
          .when(col("loc_size").isNull, "Dropped")
          .when(col("is_pinned"), "Pinned")
          .otherwise("Freed"))
      .groupBy(col("backend"), col("verdict"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("verdict") === "Freed", col("loc_size")).otherwise(0L))
          .as("freed_bytes"))
  }
}
