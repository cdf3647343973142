package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Durable-queue lag probes (`operations/src/queue_lag.rs`) — the
  * depth/age/due snapshot the reference samples per cadence over its five
  * durable queues, as one relational pass.
  *
  * Reference semantics kept exactly:
  *  - the scan is BOUNDED: 8 pages × 1024 keys (`queue_lag.rs:22-23`), so
  *    `depth` counts at most `scanCap` rows in key order and `depth_capped`
  *    reports a scan that stopped mid-queue (`advance`, `:304-318`);
  *  - outbox-style queues age by the enqueue instant encoded in the key's
  *    ULID suffix: `oldest_age_ms = now − min(enqueued)` over the SCANNED
  *    rows (`probe_outbox_lag`, `:183-221`);
  *  - materialization-style queues count jobs already due
  *    (`due_at <= now`) and age by the oldest DUE timestamp
  *    (`probe_materialization_lag`, `:225-268`);
  *  - depth-only queues report age 0 (`probe_queue_depth`, `:270-292`);
  *  - an empty queue yields depth 0 / age 0 — in relational form an empty
  *    queue simply has no input rows, so callers materialize the zero row
  *    from their queue catalog if they need it (pinned by the spec).
  *
  * Scale: one shuffle on the queue id; the rank window is bounded by
  * `scanCap` per queue after the per-partition top-k (WindowGroupLimit
  * pushes the rank filter map-side), so a billion-row queue ships at most
  * `scanCap` rows per queue — exactly the reference's bounded probe cost.
  */
object QueueLag {

  val PageSize = 1024 // queue_lag.rs:22
  val PageLimit = 8 // queue_lag.rs:23

  /** `queues(queue, key, enqueued_ms, due_at_ms)` — `enqueued_ms` non-null
    * for outbox-style rows, `due_at_ms` for materialization-style rows,
    * both null for depth-only queues. Output one row per non-empty queue:
    * (queue, depth, depth_capped, oldest_age_ms, due). */
  def snapshots(queues: DataFrame, nowMs: Long,
      scanCap: Int = PageSize * PageLimit): DataFrame = {
    // totals as a plain aggregate (map-side partial, queue-count-sized
    // result) — stacking it as a second window over the rank would block
    // Spark's WindowGroupLimit rewrite, and the rank filter would then sort
    // EVERY queue row instead of shipping a map-side top-scanCap
    val totals = queues.groupBy(col("queue")).agg(count(lit(1)).as("total"))
    val w = Window.partitionBy("queue").orderBy("key")
    val scanned = queues
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= scanCap)
    scanned.groupBy(col("queue"))
      .agg(
        count(lit(1)).as("depth"),
        min("enqueued_ms").as("min_enq"),
        count(when(col("due_at_ms") <= nowMs, 1)).as("due"),
        min(when(col("due_at_ms") <= nowMs, col("due_at_ms"))).as("min_due"))
      .join(broadcast(totals), Seq("queue"))
      .select(col("queue"), col("depth"), (col("total") > scanCap).as("depth_capped"),
        coalesce(lit(nowMs) - col("min_enq"), lit(nowMs) - col("min_due"),
          lit(0L)).as("oldest_age_ms"),
        col("due"))
  }
}
