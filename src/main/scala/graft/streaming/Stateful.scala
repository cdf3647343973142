package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators via `flatMapGroupsWithState` — the custom
  * per-key state path (SURVEY §2.8):
  *
  *  - [[debounced]]: per-key emission throttling, the reference's
  *    usage-snapshot debounce (`USAGE_SNAPSHOT_PUBLISH_DEBOUNCE`, 2 s) —
  *    an event is published only when at least `debounceMs` has passed
  *    since the key's previous publication; suppressed events are dropped
  *    (the next snapshot carries the fresh value). State survives batches.
  *
  *  - [[appliedOnce]]: per-key applied-id set, the reference's
  *    `applied_event_ids` idempotent replay — an id is emitted the first
  *    time it is seen, ever, across batches (bounded per key by keeping ids
  *    only above a moving floor at scale; here: full set per key).
  */
object Stateful {

  final case class Notice(watch_id: String, event_id: Long, occurred_at_ms: Long)
  final case class DebounceState(lastEmitMs: Long)
  final case class AppliedState(ids: Set[Long])

  val DefaultDebounceMs = 2000L // usage_stats.rs:1044

  def debounced(ds: Dataset[Notice],
      debounceMs: Long = DefaultDebounceMs): Dataset[Notice] = {
    implicit val stateEnc = Encoders.product[DebounceState]
    implicit val outEnc = Encoders.product[Notice]
    ds.groupByKey(_.watch_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, events: Iterator[Notice], state: GroupState[DebounceState]) => {
          val sorted = events.toSeq.sortBy(e => (e.occurred_at_ms, e.event_id))
          var last = state.getOption.map(_.lastEmitMs).getOrElse(Long.MinValue)
          val out = sorted.filter { e =>
            val due = last == Long.MinValue || e.occurred_at_ms >= last + debounceMs
            if (due) last = e.occurred_at_ms
            due
          }
          if (last != Long.MinValue) state.update(DebounceState(last))
          out.iterator
        })
  }

  def appliedOnce(ds: Dataset[Notice]): Dataset[Notice] = {
    implicit val stateEnc = Encoders.kryo[AppliedState]
    implicit val outEnc = Encoders.product[Notice]
    ds.groupByKey(_.watch_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, events: Iterator[Notice], state: GroupState[AppliedState]) => {
          var applied = state.getOption.map(_.ids).getOrElse(Set.empty[Long])
          val out = events.toSeq.sortBy(e => (e.occurred_at_ms, e.event_id)).filter { e =>
            val fresh = !applied.contains(e.event_id)
            if (fresh) applied += e.event_id
            fresh
          }
          state.update(AppliedState(applied))
          out.iterator
        })
  }
}
