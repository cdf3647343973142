package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw JSON-LD revision resolution (reference
  * `core/src/metadata.rs:199-258` `resolve_raw_revision`;
  * `operations/src/metadata/raw.rs:249-291` `advance_raw_state`).
  *
  * Per document, over its create-event log:
  *  - the BASE is the RoCrate/ReplaceRoCrate event with the max
  *    (updated_at_ms, event_id) — NOT simply the latest event id: a
  *    replay carrying an older payload timestamp never wins the base;
  *  - upsert events (data or contextual entities) with event_id AFTER the
  *    base's apply in event-id order; the winning event id is the last
  *    applied upsert, or the base itself when none apply;
  *  - documents with no base (scaffold-only) have no revision;
  *  - the INCREMENTAL fold (`advance_raw_state`) chains the stored base
  *    with the batch's candidates; an unchanged base applies only the
  *    batch's later upserts onto the stored revision, a changed base
  *    rebuilds from the batch — with ordered event ids (ULIDs) the fold
  *    is exactly equivalent to a direct resolve, which is what the rv1
  *    gate pins (both sections must agree with the direct oracle).
  *
  * Scale: two aggregations per document over its event slice; the
  * incremental path reads the O(1) stored state plus the batch only —
  * never the historical log ("never rescans the base rows"). */
object RawRevision {

  private val BaseKinds = Seq("rocrate", "replace")
  private val UpsertKinds = Seq("upsert_data", "upsert_ctx")

  /** Direct resolve: `events(doc_id, event_id, kind, updated_at_ms)` →
    * `(doc_id, base_event_id, winning_event_id, n_applied,
    * last_event_id)`. */
  def resolve(events: DataFrame): DataFrame = events
    .groupBy("doc_id")
    .agg(
      max(when(col("kind").isin(BaseKinds: _*),
        struct(col("updated_at_ms"), col("event_id")))).as("base"),
      max(col("event_id")).as("last_event_id"),
      collect_list(when(col("kind").isin(UpsertKinds: _*),
        col("event_id"))).as("__ups"))
    .withColumn("base_event_id", col("base.event_id"))
    .withColumn("n_applied", when(col("base_event_id").isNotNull,
      size(filter(col("__ups"), e => e > col("base_event_id"))))
      .otherwise(lit(0)).cast("long"))
    .withColumn("winning_event_id", when(col("base_event_id").isNotNull,
      coalesce(array_max(filter(col("__ups"),
        e => e > col("base_event_id"))), col("base_event_id"))))
    .select(col("doc_id"), col("base_event_id"), col("winning_event_id"),
      col("n_applied"), col("last_event_id"))

  /** Incremental fold: resolve `oldEvents` into a stored state, then
    * advance it with `batch` (advance_raw_state). Same output shape as
    * [[resolve]]. */
  def fold(oldEvents: DataFrame, batch: DataFrame): DataFrame = {
    val old = resolve(oldEvents).select(col("doc_id"),
      col("base_event_id").as("old_base_ev"),
      col("winning_event_id").as("old_winning"),
      col("n_applied").as("old_applied"),
      col("last_event_id").as("old_last"))
    val oldBase = oldEvents
      .filter(col("kind").isin(BaseKinds: _*))
      .groupBy("doc_id")
      .agg(max(struct(col("updated_at_ms"), col("event_id")))
        .as("old_base"))
    val b = batch.groupBy("doc_id").agg(
      max(when(col("kind").isin(BaseKinds: _*),
        struct(col("updated_at_ms"), col("event_id")))).as("batch_base"),
      max(col("event_id")).as("batch_last"),
      collect_list(when(col("kind").isin(UpsertKinds: _*),
        col("event_id"))).as("__ups"))
    old.join(oldBase, Seq("doc_id"), "full_outer")
      .join(b, Seq("doc_id"), "full_outer")
      .withColumn("next_base", greatest(col("old_base"), col("batch_base")))
      .withColumn("base_event_id", col("next_base.event_id"))
      .withColumn("base_changed",
        !(col("next_base") <=> col("old_base")))
      .withColumn("__applied", when(col("base_event_id").isNotNull,
        filter(coalesce(col("__ups"), array().cast("array<bigint>")),
          e => e > col("base_event_id"))))
      // a changed base rebuilds from the batch; an unchanged one extends
      // the stored revision, so its applied count accumulates
      .withColumn("n_applied", (when(col("base_changed"),
        coalesce(size(col("__applied")), lit(0)))
        .otherwise(coalesce(size(col("__applied")), lit(0)) +
          coalesce(col("old_applied"), lit(0L)))).cast("long"))
      .withColumn("winning_event_id",
        when(col("base_event_id").isNull, lit(null).cast("long"))
          .when(col("base_changed"),
            coalesce(array_max(col("__applied")), col("base_event_id")))
          .otherwise(coalesce(array_max(col("__applied")),
            col("old_winning"), col("base_event_id"))))
      .withColumn("last_event_id",
        greatest(col("old_last"), col("batch_last")))
      .select(col("doc_id"), col("base_event_id"),
        col("winning_event_id"), col("n_applied"), col("last_event_id"))
  }
}
