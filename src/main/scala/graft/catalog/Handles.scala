package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Placement-handle allocation (reference
  * `operations/src/allocate_handle.rs` (524 LoC) +
  * `core/src/structs/handle_allocation.rs:127-152`
  * `HandleAllocationCursor::allocate`) — the allocator that hp1's
  * pool-slice transfers feed.
  *
  * The cursor draws the lowest unused handle across the node's granted
  * ranges walked in `(start, range_id)` order, skipping empty ranges and
  * NEVER drawing the first handle of a range (the owner's reserved
  * JobControl handle); a draw past every grant is
  * PlacementHandleExhausted. Grants are disjoint (the
  * `HandleRangeDirectory` conflict guard upstream), so a batch of
  * sequential draws for one node is exactly the rank-indexed walk of the
  * concatenated allocatable sequence — the i-th request (in submission
  * order) takes the i-th handle.
  *
  * `requests(seq, req_id, realm_id, node_id)`;
  * `ranges(realm_id, node_id, range_id, start, end)` (end exclusive).
  *
  * Scale: grants are config-plane (a few ranges per node); the enumerated
  * allocatable space is range-width-bounded and joins the batch on rank —
  * no corpus relation exists here. */
object Handles {

  def allocate(requests: DataFrame, ranges: DataFrame): DataFrame = {
    // the allocatable sequence per (realm, node): every handle but the
    // reserved first, ranges walked in (start, range_id) order
    val handleW = Window.partitionBy("realm_id", "node_id")
      .orderBy("start", "range_id", "handle")
    val handles = ranges
      .filter(col("end") > col("start") + 1) // empty grants never draw
      .select(col("realm_id"), col("node_id"), col("range_id"),
        col("start"),
        explode(sequence(col("start") + 1, col("end") - 1)).as("handle"))
      .withColumn("rank", row_number().over(handleW))
      .select(col("realm_id"), col("node_id"), col("handle"),
        col("range_id").as("allocator_range_id"), col("rank"))

    val reqW = Window.partitionBy("realm_id", "node_id").orderBy("seq")
    requests
      .withColumn("rank", row_number().over(reqW))
      .join(handles, Seq("realm_id", "node_id", "rank"), "left")
      .select(col("req_id"),
        when(col("handle").isNull, "PlacementHandleExhausted")
          .otherwise("Ok").as("verdict"),
        col("handle"), col("allocator_range_id"))
  }
}
