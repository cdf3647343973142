package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ordered-event analytics over the event log: conversion funnels, rolling
  * time-window aggregates, and cohort retention — the three report shapes
  * every product/training-telemetry pipeline derives from raw events.
  *
  * All three shuffle ONCE on the entity key (funnel/rolling) or twice for
  * the cohort join (retention); nothing materializes per-event state on the
  * driver, so the plans hold on a 100 TB event log. Time is integer
  * epoch-microseconds end to end (see [[Sessionize]] for why).
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each `keyCol` entity, the first time of
    * `steps.head`, then the first time of each later step STRICTLY after the
    * previous step and within `windowMicros` of step 1 — the standard
    * "signup → click → purchase inside 7 days" shape. One row per entity
    * with a nullable `ts_<step>` per step (null = never reached).
    *
    * Plan: one shuffle on the key, then one per-partition window pass per
    * step (each `MIN(CASE …)` references the previous step's column, so the
    * passes chain without re-shuffling — the final groupBy reuses the same
    * hash partitioning). */
  def funnel(events: DataFrame, keyCol: String, tsMicros: Column,
      typeCol: String, steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel steps: $steps")
    require(windowMicros > 0, s"funnel window must be positive, got $windowMicros")
    val w = Window.partitionBy(col(keyCol))
    var df = events.withColumn("_tus", tsMicros.cast("long"))
    steps.zipWithIndex.foreach { case (st, i) =>
      val hit =
        if (i == 0) when(col(typeCol) === st, col("_tus"))
        else when(col(typeCol) === st &&
          col("_tus") > col(s"_t${i - 1}") &&
          col("_tus") <= col("_t0") + windowMicros, col("_tus"))
      df = df.withColumn(s"_t$i", min(hit).over(w))
    }
    df.groupBy(col(keyCol))
      .agg(max(col("_t0")).as(s"ts_${steps.head}"),
        steps.tail.zipWithIndex.map { case (st, i) =>
          max(col(s"_t${i + 1}")).as(s"ts_$st")
        }: _*)
  }

  /** Per-entity daily totals plus a trailing `windowDays`-day rolling sum
    * and active-day count (the usage/health time series). Day boundaries
    * and the rolling frame are integer day numbers (RANGE frame), so a gap
    * of inactive days still bounds the window by TIME, not by row count.
    * The rolling sum goes through decimal (exact, order-free) — a double
    * window sum would depend on the engine's frame-evaluation order. */
  def rollingDaily(events: DataFrame, keyCol: String, tsMicros: Column,
      valueCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"rolling window must be positive, got $windowDays")
    val DayUs = 86400000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1L), 0L)
    events
      .withColumn("_tus", tsMicros.cast("long"))
      .withColumn("day", expr(s"_tus div $DayUs"))
      .groupBy(col(keyCol), col("day"))
      .agg(graft.Tables.dsum(col(valueCol)).as("day_value"),
        count(lit(1)).as("n_events"))
      .withColumn("roll_value",
        sum(col("day_value").cast(DecimalType(18, 4))).over(w).cast("double"))
      .withColumn("n_days_active", count(lit(1)).over(w))
  }

  /** LIVE stream-stream interval join: pair each left event with every
    * right event of the same key whose time falls in
    * `[left.ts, left.ts + maxLag]` — the attribution join ("purchase within
    * N minutes of the click") that batch as-of/funnel shapes answer
    * offline, here answered on two live streams.
    *
    * Both sides carry watermarks, which is what BOUNDS the join state:
    * Spark buffers only rows younger than `watermark − maxLag` per side
    * and drops older state as the watermark advances — without the
    * interval condition the state store would grow without limit. Append
    * output: a pair emits once both sides have passed the join window. */
  def intervalJoinStreams(left: DataFrame, right: DataFrame, keyCol: String,
      maxLag: String, watermarkDelay: String = "0 seconds"): DataFrame = {
    val l = left.withWatermark("lts", watermarkDelay)
    val r = right.withWatermark("rts", watermarkDelay)
    l.join(r, col(keyCol) === col(s"r_$keyCol") &&
      col("rts") >= col("lts") &&
      col("rts") <= col("lts") + expr(s"INTERVAL $maxLag"))
  }

  /** Weekly cohort retention: entities are cohorted by the epoch-week of
    * their FIRST event; each (cohort_week, week_offset) cell counts the
    * cohort members active that many weeks later. The activity set is
    * deduped to (entity, week) BEFORE the cohort join, so the join input is
    * one row per entity-week, not per event — at 100 TB that dedup is the
    * difference between joining billions and joining millions of rows. */
  def retention(events: DataFrame, keyCol: String, tsMicros: Column): DataFrame = {
    val WeekUs = 604800000000L
    val wk = events.withColumn("_tus", tsMicros.cast("long"))
      .select(col(keyCol), expr(s"_tus div $WeekUs").as("week"))
    val cohorts = wk.groupBy(col(keyCol)).agg(min(col("week")).as("cohort_week"))
    val active = wk.distinct()
    active.join(cohorts, Seq(keyCol))
      // one row per (entity, week) after the dedup → COUNT(*) is the
      // distinct-entity count without a second distinct aggregation
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Slowly-changing-dimension type-2 history: per key, the `attr` stream
    * collapses into validity intervals — a new row opens only when the
    * attribute CHANGES (lag ≠ current, the gaps-and-islands change mark),
    * `valid_to` is the next change's `valid_from` (exclusive; NULL on the
    * open row), `is_current` marks exactly one row per key. Consecutive
    * repeats of the same value collapse into their first interval.
    *
    * Two window passes over the SAME (key, time, tie) ordering — Catalyst
    * reuses one keyed exchange+sort for both, so the whole build is a
    * single shuffle; the second pass runs on the change rows only. `tie`
    * must be a per-key-unique column (an event id): timestamp ties would
    * otherwise make lag/lead nondeterministic across engines. */
  final case class AttrEvent(key: Long, tus: Long, attr: String, tie: Long)
  final case class Scd2Row(key: Long, attr: String, valid_from: Long,
    valid_to: Long)
  final case class Scd2State(attr: String, from: Long)

  /** LIVE twin of [[scd2History]]: `flatMapGroupsWithState` keeps the open
    * interval per key (O(1) state — attr + valid_from) and emits an
    * interval the moment the attribute CHANGES — exactly the CDC→dimension
    * maintenance loop, no batch rebuild. Emits CLOSED intervals only; the
    * open row lives in state (the serving table upserts it from the latest
    * emitted `valid_to` boundary). Assumes per-key in-time-order arrival
    * across batches — the projector's clock-skew deferral (ev1) provides
    * that upstream. */
  def scd2Stream(ds: org.apache.spark.sql.Dataset[AttrEvent])
      : org.apache.spark.sql.Dataset[Scd2Row] = {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val stateEnc = E.product[Scd2State]
    implicit val outEnc = E.product[Scd2Row]
    ds.groupByKey(_.key)(E.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, events: Iterator[AttrEvent], state: GroupState[Scd2State]) => {
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
          events.toSeq.sortBy(e => (e.tus, e.tie)).foreach { e =>
            open match {
              case Some(s) if s.attr != e.attr =>
                out += Scd2Row(key, s.attr, s.from, e.tus)
                open = Some(Scd2State(e.attr, e.tus))
              case Some(_) => // repeat: interval already open, collapse
              case None => open = Some(Scd2State(e.attr, e.tus))
            }
          }
          open.foreach(state.update)
          out.iterator
        })
  }

  def scd2History(events: DataFrame, keyCol: String, attrCol: String,
      tsMicros: Column, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("tus"), col(tieCol))
    events.withColumn("tus", tsMicros)
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attrCol))
      .withColumn("valid_to", lead(col("tus"), 1).over(w))
      .select(col(keyCol), col(attrCol), col("tus").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }
}
