package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fail-closed handle-range directory + the node-local allocation cursor
  * (reference `core/src/structs/handle_allocation.rs`).
  *
  * The directory is derived from the replicated grant set: a `range_id`
  * reused with a distinct value is a same-key divergence and conflicted
  * (`:26-39`); any two interval-intersecting ranges under DIFFERENT ids are
  * BOTH conflicted (`:41-56`). Conflicted ids never become allocatable, but
  * their spans still occupy the band space conservatively
  * (`free_band_in`, `:87-107` — "conflicted grants included").
  *
  * The allocation cursor (`:127-151`) draws the lowest unused handle inside
  * the owner's disjoint non-conflicted grants, skipping each range's first
  * handle (the owner's reserved JobControl handle). Because granted ranges
  * are pairwise disjoint (overlap ⇒ conflicted ⇒ excluded) the monotonic
  * cursor's full draw sequence is exactly: every handle in (start, end) of
  * each grant, ordered by (start, range_id, handle) — which is how [[draws]]
  * states it relationally instead of replaying the mutable fold.
  *
  * Scale: everything is per-scenario (per-realm) config-plane data. The
  * divergence check is one groupBy; the overlap check is a self-join keyed
  * by scenario (per-realm grant sets are document-sized by contract — the
  * reference holds them in ONE RealmConfigDocument). [[draws]] explodes
  * only (start, end) interiors, i.e. output-sized work.
  */
object HandleRanges {

  val FirstGrantableHandle = 3L // placement.rs:238
  val HandleRangeSize = 1024L // placement.rs:243

  /** `ranges(sc_id, range_id, owner, start, end)` → one row per DISTINCT
    * stored value (BTreeSet semantics) with `n_values` (distinct values
    * under the id), `conflicted`, and `grant_rank` (the owner's
    * granted_to position — (start, range_id) order — NULL when conflicted).
    */
  def directory(ranges: DataFrame): DataFrame = {
    val vals = ranges.select("sc_id", "range_id", "owner", "start", "end")
      .distinct()
    val div = vals.groupBy("sc_id", "range_id")
      .agg(count(lit(1)).as("n_values"))
    val ov = vals.as("a")
      .join(vals.as("b"),
        col("a.sc_id") === col("b.sc_id") &&
          col("a.range_id") =!= col("b.range_id") &&
          col("a.start") < col("b.end") && col("b.start") < col("a.end"))
      .select(col("a.sc_id").as("sc_id"), col("a.range_id").as("range_id"))
      .distinct()
      .withColumn("ov", lit(true))
    val marked = vals
      .join(div, Seq("sc_id", "range_id"))
      .join(ov, Seq("sc_id", "range_id"), "left_outer")
      .withColumn("conflicted",
        col("n_values") > 1 || coalesce(col("ov"), lit(false)))
      .drop("ov")
    // non-conflicted rows sort first, so their row_numbers are exactly the
    // granted_to positions; conflicted rows then null out
    val w = Window.partitionBy("sc_id", "owner")
      .orderBy(col("conflicted"), col("start"), col("range_id"))
    marked.withColumn("grant_rank",
      when(!col("conflicted"), row_number().over(w).cast("long")))
      .select(col("sc_id"), col("range_id"), col("owner"), col("start"),
        col("end"), col("n_values"), col("conflicted"), col("grant_rank"))
  }

  /** Lowest free 1024-band inside `spans(sc_id, span_idx, span_start,
    * span_end)` — first in (span_idx, band) iteration order, matching the
    * reference's span-order flat_map. A band is occupied when ANY stored
    * grant value (conflicted included) intersects it. One row per scenario:
    * `(sc_id, free_start, free_end)`, NULLs when fully consumed. */
  def freeBand(ranges: DataFrame, spans: DataFrame): DataFrame = {
    val sz = HandleRangeSize
    val bands = spans
      .withColumn("nb", floor((col("span_end") - col("span_start")) / sz))
      .filter(col("nb") > 0)
      .withColumn("b", explode(sequence(lit(0L), col("nb") - 1)))
      .select(col("sc_id"), col("span_idx"), col("b"),
        (col("span_start") + col("b") * sz).as("fs"))
    val vals = ranges.select("sc_id", "range_id", "owner", "start", "end")
      .distinct()
    val free = bands.join(vals,
        bands("sc_id") === vals("sc_id") &&
          col("start") < col("fs") + sz && col("fs") < col("end"),
        "left_anti")
    val w = Window.partitionBy("sc_id")
      .orderBy(col("span_idx"), col("b"))
    val first = free.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("sc_id"), col("fs").as("free_start"),
        (col("fs") + sz).as("free_end"))
    spans.select("sc_id").distinct()
      .join(first, Seq("sc_id"), "left_outer")
  }

  /** The cursor's complete draw sequence over the owner's granted (non-
    * conflicted) ranges: `(sc_id, owner, seq, handle, range_id)`; each
    * range's first handle is reserved and never drawn (`:135`), and the
    * cursor never draws outside the 20-bit handle space — `PlacementHandle
    * ::new` (`handle_allocation.rs:145`) rejects candidates past
    * `MAX_HANDLE`, so a malformed stored grant straddling the boundary
    * yields only its in-space handles and one entirely above it yields
    * none. */
  def draws(ranges: DataFrame): DataFrame = {
    val granted = directory(ranges).filter(!col("conflicted"))
      .filter(col("end") > col("start") + 1)
      .filter(col("start") + 1 < BandPools.HandleSpaceEnd)
    val w = Window.partitionBy("sc_id", "owner")
      .orderBy(col("start"), col("range_id"), col("handle"))
    granted
      .withColumn("handle",
        explode(sequence(col("start") + 1,
          least(col("end") - 1, lit(BandPools.HandleSpaceEnd - 1)))))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col("sc_id"), col("owner"), col("seq"), col("handle"),
        col("range_id"))
  }
}
