package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Usage-statistics aggregation (reference `operations/src/usage_stats.rs`):
  *
  *  - full rebuild (`:635-790`): scan buckets → blobs → heads → versions,
  *    fold into global / per-group / per-backend counters; staging/partial
  *    blobs are skipped; all copies of one hash share that blob's size.
  *  - incremental apply (`UsageCounterUpdate::step`, `:213-253`): counters
  *    merged with summed deltas in one transaction — here: grouped delta
  *    sums full-outer-merged onto base counters.
  *
  * The reference shards counters to spread write contention (`:679-716`);
  * Spark's shuffle partitioning makes shards unnecessary (SURVEY §1.1).
  */
object UsageStats {

  /** Full rebuild → (scope, key, buckets, stored_blobs, stored_bytes):
    * one row per group and per backend plus a 'global' row. */
  def rebuild(objects: DataFrame, blobs: DataFrame, buckets: DataFrame): DataFrame = {
    val live = blobs.filter(!col("staging") && !col("partial"))
    val heads = ObjectTables.heads(objects)
      .join(broadcast(live.select(col("blake3").as("hash"), col("backend"))), Seq("hash"), "inner")
      .join(broadcast(buckets), Seq("bucket"), "inner")
    // ONE aggregation pass: GROUPING SETS ((group_id), (backend), ()) —
    // the three-way union evaluated the head selection (a full
    // window-sort of the object log) once per grain
    heads.groupingSets(
        Seq(Seq(col("group_id")), Seq(col("backend")), Seq.empty),
        col("group_id"), col("backend"))
      .agg(countDistinct(col("bucket")).as("buckets"),
        count(lit(1)).as("stored_blobs"),
        sum(col("size")).as("stored_bytes"),
        grouping(col("group_id")).as("__gg"),
        grouping(col("backend")).as("__gb"))
      .select(
        when(col("__gg") === 0, lit("group"))
          .when(col("__gb") === 0, lit("backend"))
          .otherwise(lit("global")).as("scope"),
        when(col("__gg") === 0, col("group_id"))
          .when(col("__gb") === 0, col("backend"))
          .otherwise(lit("all")).as("key"),
        col("buckets"), col("stored_blobs"), col("stored_bytes"))
  }

  /** Incremental apply: base per-group counters + summed per-group deltas →
    * merged counters (blobs/bytes add; read-modify-write of `step`). */
  def applyDeltas(base: DataFrame, deltas: DataFrame): DataFrame = {
    val d = deltas.groupBy(col("group_id"))
      .agg(sum(col("d_blobs")).as("d_blobs"), sum(col("d_bytes")).as("d_bytes"))
    base.select(col("group_id"), col("stored_blobs"), col("stored_bytes"))
      .join(d, Seq("group_id"), "full_outer")
      .select(col("group_id"),
        (coalesce(col("stored_blobs"), lit(0L)) + coalesce(col("d_blobs"), lit(0L))).as("stored_blobs"),
        (coalesce(col("stored_bytes"), lit(0L)) + coalesce(col("d_bytes"), lit(0L))).as("stored_bytes"))
  }
}
