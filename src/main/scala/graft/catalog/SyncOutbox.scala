package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-sync outbox drain plan (reference
  * `operations/src/document_sync_outbox.rs` +
  * `operations/src/task_incoming.rs:577-860`):
  *
  *  - FIFO key order (`document_sync_outbox.rs:27-50`): kind first, admin
  *    operations additionally by (origin node, origin sequence), then the
  *    outbox ULID, with the sync target as a pure tie-break so one event's
  *    multiple publishes never overwrite each other;
  *  - per-record drain verdict (`task_incoming.rs:293-339,346-368`):
  *    non-shard-topic records always publish; a topic this node neither
  *    holds nor is drain-flushing is UNDELIVERABLE (whole topic — DECISIONS
  *    K3); a held topic with no local genesis DEFERS the whole topic (FIFO
  *    within a topic: every later record of a deferred topic defers too,
  *    pages never starve other topics); held + live topics publish;
  *  - stuck telemetry (`task_incoming.rs:786-799`): a deferred record older
  *    than 300 s (saturating age) counts stuck;
  *  - peer re-resolution (`task_incoming.rs:755-770`): a non-empty emit-time
  *    stamp on a shard-topic record is replaced by the shard's LIVE holders
  *    when non-empty (stale stamps would push to drained nodes); empty
  *    stamps keep their realm-default semantics;
  *  - publish grouping (`task_incoming.rs:803-840`): publishable records
  *    group by their sorted peer set and split into FIFO sub-batches of
  *    `DRAIN_SUBBATCH_RECORDS` (512).
  *
  * Scale: one topic-state join (topic relation is placement-config-sized —
  * broadcast), then a per-group rank window over publishable records; the
  * FIFO order is the storage key order, so the window reads presorted runs
  * under a key-clustered layout — no global sort. */
object SyncOutbox {

  val DrainSubbatchRecords = 512 // task_incoming.rs:110
  val StuckAfterMs = 300000L     // task_incoming.rs:116

  /** Drain-plan verdicts over one outbox snapshot.
    *
    * `outbox`: (outbox_id, kind, origin_node, origin_seq, target, topic,
    * uses_shard, peers, live_holders, enq_ms). `topicState`: (topic, held,
    * exists) — held = holder or draining former holder per the live realm
    * config; exists = local genesis present. */
  def drainPlan(outbox: DataFrame, topicState: DataFrame, nowMs: Long,
      subbatchSize: Int = DrainSubbatchRecords): DataFrame = {
    val t = outbox.join(broadcast(topicState), Seq("topic"), "left_outer")
    val verdict = when(!col("uses_shard"), "publish")
      // an unknown config row defers (retry), it never declares undeliverable
      .when(col("held").isNotNull && !col("held"), "undeliverable")
      .when(col("exists").isNull || !col("exists"), "deferred")
      .otherwise("publish")
    val age = greatest(lit(0L), lit(nowMs) - col("enq_ms"))
    val resolvedPeers = when(col("uses_shard") && col("peers") =!= "" &&
        col("live_holders").isNotNull && col("live_holders") =!= "",
      col("live_holders")).otherwise(col("peers"))
    val fifo = Seq(col("kind"), coalesce(col("origin_node"), lit("")),
      coalesce(col("origin_seq"), lit(0L)), col("outbox_id"), col("target"))
    val v = t.withColumn("verdict", verdict)
      .withColumn("stuck", col("verdict") === "deferred" && age >= StuckAfterMs)
      .withColumn("group_key", when(col("verdict") === "publish", resolvedPeers))
    val w = Window.partitionBy(col("group_key")).orderBy(fifo: _*)
    v.withColumn("__rn",
        when(col("group_key").isNotNull, row_number().over(w)))
      .select(col("outbox_id"), col("kind"), col("target"), col("topic"),
        col("verdict"), col("stuck"), col("group_key"),
        floor((col("__rn") - 1) / subbatchSize).cast("long").as("subbatch"))
  }
}
