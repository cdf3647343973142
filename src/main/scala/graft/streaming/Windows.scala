package graft.streaming

import graft.Tables.dsum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window rollups — the Structured Streaming shape for
  * the reference's rate/usage counters (`projector.rs` applies events with
  * bounded lateness; the projection's aggregate views are per-interval
  * counts).
  *
  * Streaming: `withWatermark(delay)` bounds state — a window's aggregate is
  * emitted exactly once (append mode) when the watermark passes its end, and
  * events later than the delay are dropped by the engine. State per key is
  * one open window, so memory is O(active keys), not O(stream length).
  * The same plan runs in batch for the driver gate (watermark is a no-op
  * there), keeping one definition for both paths.
  */
object Windows {

  /** Per-(window, event_type) counts + value sum over tumbling windows.
    * `events` needs occurred_at_ms (epoch millis), event_type, value. */
  def eventRollup(events: DataFrame, windowDur: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): DataFrame =
    events
      .withColumn("__ts", timestamp_millis(col("occurred_at_ms")))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(window(col("__ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("total_value"))
}
