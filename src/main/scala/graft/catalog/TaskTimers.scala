package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted task-timer fold (reference
  * `operations/src/task_persistence.rs:15-155`): the durable timer keyspace
  * is the sequential fold of the task-effect log, per task key:
  *
  *  - `ResetTimer` overwrites the stored due (even to a LATER one);
  *  - `ShortenTimer` writes only when the requested due is strictly earlier
  *    than the stored one — or when nothing is stored (`:133-153`);
  *  - `CancelTimer` deletes;
  *  - Reset/Shorten of the drain-family keys are never persisted at all —
  *    those timers re-arm from their own durable queues at startup
  *    (`:33-52`) — while Cancel still applies to any key.
  *
  * Final state per key: seek the last Cancel, then the last Reset after it;
  * the stored due is min(that Reset's due, every later Shorten) — or, with
  * no Reset in the tail, min over the tail's Shortens; an empty tail means
  * the key is absent.
  *
  * Scale: three key-grouped aggregations with the log filtered down between
  * passes — map-side partials throughout, no windows over the raw log. */
object TaskTimers {

  /** log: (key, durable, kind ∈ reset|shorten|cancel, due_at_ms, seq). */
  def fold(log: DataFrame): DataFrame = {
    // durable-queue keys skip Reset/Shorten persistence; Cancel applies
    val eff = log.filter(col("kind") === "cancel" || !col("durable"))
    val g1 = eff.groupBy("key")
      .agg(coalesce(max(when(col("kind") === "cancel", col("seq"))), lit(-1L))
        .as("cseq"))
    val tail = eff.join(g1, Seq("key"))
      .filter(col("seq") > col("cseq") && col("kind") =!= "cancel")
    val g2 = tail.groupBy("key")
      .agg(max(when(col("kind") === "reset", col("seq"))).as("rseq"))
    tail.join(g2, Seq("key"))
      .filter(
        (col("rseq").isNotNull &&
          ((col("kind") === "reset" && col("seq") === col("rseq")) ||
            (col("kind") === "shorten" && col("seq") > col("rseq")))) ||
          (col("rseq").isNull && col("kind") === "shorten"))
      .groupBy("key")
      .agg(min(col("due_at_ms")).as("due_at_ms"))
  }
}
