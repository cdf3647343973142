package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coordinator handle-pool transfer slices (reference
  * `operations/src/ensure_realm_config.rs:580-609` `pool_transfer_slice`;
  * `core/src/structs/placement.rs:243` HANDLE_RANGE_SIZE = 1024).
  *
  * When a realm hands coordination to a new node, the old coordinator
  * cedes the UPPER HALF (ceil) of its largest contiguous run of free
  * 1024-wide handle bands. A band is free when it lies fully inside its
  * span and overlaps no consumed range ([start, end) semantics). Ties on
  * run length keep the EARLIEST run (strictly-greater comparison). A run
  * shorter than two bands transfers nothing — "the new coordinator then
  * starts without a pool".
  *
  * Scale: bands explode map-side from the (config-plane-sized) span list;
  * the run fold is one gaps-and-islands window per scenario. */
object HandlePool {

  val HandleRangeSize = 1024L // placement.rs:243

  /** `spans(sc_id, span_idx, span_start, span_end)`;
    * `consumed(sc_id, c_start, c_end)`. Returns one row per scenario:
    * `(sc_id, slice_start, slice_end)` — NULL bounds when no transfer. */
  def transferSlices(spans: DataFrame, consumed: DataFrame): DataFrame = {
    val sz = HandleRangeSize
    val bands = spans
      .withColumn("nbands", greatest(lit(0L),
        floor((col("span_end") - col("span_start")) / sz).cast("long")))
      .withColumn("b", explode(sequence(lit(0L), col("nbands"))))
      .withColumn("start", col("span_start") + col("b") * sz)
      // the band at index == nbands is the span-end sentinel: never free,
      // it closes a trailing run exactly like the reference's 0..=bands
      .withColumn("inside", col("b") < col("nbands"))
    val free = bands.join(consumed,
        bands("sc_id") === consumed("sc_id") &&
          col("c_start") < col("start") + sz && col("start") < col("c_end"),
        "left_outer")
      .drop(consumed("sc_id"))
      .groupBy("sc_id", "span_idx", "b", "start", "inside")
      .agg(max(when(col("c_start").isNotNull, 1L).otherwise(0L))
        .as("hit"))
      .withColumn("free", col("inside") && col("hit") === 0L)
    // gaps-and-islands per span: island id = band index − rank among frees
    val wSpan = Window.partitionBy("sc_id", "span_idx").orderBy("b")
    val runs = free
      .withColumn("rk", row_number().over(wSpan))
      .filter(col("free"))
      .withColumn("rk2", row_number().over(wSpan))
      .withColumn("island", col("rk") - col("rk2"))
      .groupBy("sc_id", "span_idx", "island")
      .agg(min(col("start")).as("run_start"), count(lit(1)).as("len"))
      .withColumn("run_end", col("run_start") + col("len") * sz)
    // the earliest strictly-longest run wins (best.is_none_or(>))
    val wBest = Window.partitionBy("sc_id")
      .orderBy(col("len").desc, col("span_idx"), col("run_start"))
    val best = runs.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .withColumn("slice_start", when(col("len") >= 2,
        col("run_start") + expr("(len + 1) div 2") * sz))
      .withColumn("slice_end", when(col("len") >= 2, col("run_end")))
    spans.select("sc_id").distinct()
      .join(best.select(col("sc_id"), col("slice_start"),
        col("slice_end")), Seq("sc_id"), "left_outer")
  }
}
