package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization and as-of attachment — the two event-table shapes a
  * training-data pipeline needs beyond plain windows: gap-based sessions
  * (user activity bursts) and point-in-time dimension lookup (attach the
  * state that was current when the event happened, never a future one).
  *
  * Both are ONE-shuffle operators: everything after the keyed repartition
  * is a per-partition ordered walk, so the plans survive a 100 TB event log
  * as long as single keys fit a partition (users/entities do; a pathological
  * hot key would need the usual salting).
  */
object Sessionize {

  /** Gap-based sessionization (gaps-and-islands): events of one `keyCol`
    * belong to the same session while consecutive gaps are ≤ `gapMicros`.
    * `tsMicros` is the event time as an epoch-microsecond expression —
    * integer time end to end (second-cast time would merge sub-second
    * bursts; float time drifts past 2^53). Per session: first ts (micros),
    * event count, duration, exact-decimal value total.
    *
    * Plan: one shuffle on the key; the session numbering is a running sum
    * over the per-key ordered walk; the aggregation reuses the same
    * partitioning (no second exchange). */
  def sessionize(events: DataFrame, keyCol: String, tsMicros: Column,
      seqCol: String, valueCol: String, gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"session gap must be positive, got $gapMicros")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_tus"), col(seqCol))
    val prev = lag(col("_tus"), 1).over(w)
    val newSession = when(prev.isNull || col("_tus") - prev > gapMicros, 1)
      .otherwise(0)
    events
      .withColumn("_tus", tsMicros.cast("long"))
      .withColumn("_new", newSession)
      .withColumn("_sess", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_sess"))
      .agg(
        min(col("_tus")).as("session_start_us"),
        count(lit(1)).as("n_events"),
        (max(col("_tus")) - min(col("_tus"))).as("duration_us"),
        graft.Tables.dsum(col(valueCol)).as("total_value"))
      .drop("_sess")
  }

  /** Distributed as-of join: every left row gets the LATEST right row of
    * the same key with `right.ts <= left.ts` (inclusive), or nulls when no
    * prior right row exists — point-in-time-correct dimension attachment
    * with no leakage from the future.
    *
    * NOT a range join: the classic `l JOIN r ON key AND r.ts <= l.ts` +
    * max-per-row formulation explodes to Θ(|L|·|R|/keys) intermediate rows.
    * Here both sides are tagged and UNIONed, shuffled ONCE on the key, and
    * a per-key ordered walk carries the last-seen right payload forward
    * (`last(_, ignoreNulls)` over an unbounded-preceding frame). Right rows
    * sort BEFORE left rows at equal timestamps (inclusive semantics); ties
    * among right rows resolve to the highest `seqCol`.
    *
    * Returns the left rows (original columns) plus a `asof` struct of the
    * matched right row (null when unmatched). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, seqCol: String): DataFrame = {
    val rStruct = struct(right.columns.map(col): _*)
    val lStruct = struct(left.columns.map(col): _*)
    val rType = right.select(rStruct).schema.head.dataType
    val lType = left.select(lStruct).schema.head.dataType
    val rTagged = right.select(
      col(keyCol).as("_k"), col(tsCol).as("_ts"), col(seqCol).as("_seq"),
      lit(1).as("_isr"), rStruct.as("_r"), lit(null).cast(lType).as("_l"))
    val lTagged = left.select(
      col(keyCol).as("_k"), col(tsCol).as("_ts"), col(seqCol).as("_seq"),
      lit(0).as("_isr"), lit(null).cast(rType).as("_r"), lStruct.as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_isr").desc, col("_seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_isr") === 0)
      .select(col("_l.*"), col("asof"))
  }

  /** As-of join on the NATIVE physical operator ([[graft.plans.AsOfJoinExec]]
    * — one forward merge scan per co-clustered partition, no union/padding;
    * requires [[graft.GraftExtensions]] on the session). Same semantics as
    * [[asofJoin]]; key/ts/seq columns must be LongType and present under
    * the same names on both sides; caller disambiguates the OTHER column
    * names (the output concatenates left and right attributes). */
  def asofJoinNative(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, seqCol: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val lp = left.queryExecution.analyzed
    // fresh exprIds for the whole right side: constructing the node below
    // BYPASSES the analyzer, so its DeduplicateRelations never runs — a
    // self-join (both sides derived from one base scan) would otherwise
    // carry identical attribute ids on both children and column pruning
    // would collapse the "duplicates" out of the right child
    val rp = {
      val analyzed = right.queryExecution.analyzed
      org.apache.spark.sql.catalyst.plans.logical.Project(
        analyzed.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        analyzed)
    }
    def att(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = {
      val a = p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n missing from ${p.output.map(_.name).mkString(", ")}"))
      require(a.dataType == LongType, s"$n must be bigint, got ${a.dataType}")
      a
    }
    val node = graft.plans.AsOfJoinNode(lp, rp,
      att(lp, keyCol), att(rp, keyCol),
      att(lp, tsCol), att(rp, tsCol), att(rp, seqCol))
    org.apache.spark.sql.graftnative.Native.ofRows(left.sparkSession, node)
  }

  // ---------------------------------------------------------------------
  // Live (Structured Streaming) sessionization
  // ---------------------------------------------------------------------

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessState(startMs: Long, lastMs: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start_ms: Long,
      n_events: Long, duration_ms: Long, total_value: Double)

  /** Streaming counterpart of [[sessionize]]: per-user gap sessions over a
    * LIVE event stream via `flatMapGroupsWithState` with an event-time
    * timeout. A session closes (and is the append-mode output) either when
    * a later in-key event arrives past the gap, or when the WATERMARK
    * passes `last event + gap` — so closure needs no further traffic from
    * that user, only stream progress. The same (start, count, duration,
    * total) tuple as the batch walk, at ms grain (stream timestamps are ms;
    * the batch path keeps µs for log-replay parity).
    *
    * State per key is O(1) (4 scalars) — this scales to any user count;
    * Spark partitions keys across executors and persists state in the
    * checkpointed state store. */
  def sessionizeStream(events: Dataset[SessEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    require(gapMs > 0, s"session gap must be positive, got $gapMs")
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[Session]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, batch: Iterator[SessEvent], state: GroupState[SessState]) => {
          def emit(s: SessState): Session =
            Session(user, s.startMs, s.n, s.lastMs - s.startMs, s.total)
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close and drop
            val out = state.getOption.map(emit).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessState(s.startMs, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += emit(s)
                  cur = Some(SessState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flatMapGroupsWithState does NOT drop rows older than the
              // watermark, and setTimeoutTimestamp throws if the requested
              // timestamp is not strictly later than the current watermark —
              // so one sufficiently-late event (trivial with a short
              // watermark delay) would crash the whole query. Clamp to
              // watermark+1: the group then times out at the next trigger,
              // which is the correct "this session is already over" outcome.
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
        })
  }
}
