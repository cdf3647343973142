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

  /** Job routing (reference `operations/src/jobs/route.rs:64-82` +
    * `core/src/structs/realm.rs:565-595` `job_owner`):
    *
    *  - only a PROVABLY invalid id is absence: non-routable ids and
    *    buckets beyond the strategy's immutable capacity → NotFound;
    *    every other resolution fault is Unavailable (503 — unsynced
    *    state, never absence);
    *  - a resolved id must be JobControl class in THIS realm, else
    *    NotFound; the JobControl binding at the id's handle supplies the
    *    owner via `allocated_by` — a binding without one is Unavailable;
    *  - the owner == the local node → Local; a remote owner with a
    *    request forwards; WITHOUT a request (a bare ownership probe from
    *    an unauthorized path) → Unauthorized.
    *
    * `requests(req_id, job_id, has_request)`; `jobIds(job_id, routable,
    * bucket_in_range, doc_class, scope_realm, handle)` — the structured
    * id's decoded fields; `bindings(handle, doc_class, allocated_by)`. */
  def routeJobs(requests: DataFrame, jobIds: DataFrame, bindings: DataFrame,
      realmId: String, localNode: String): DataFrame = {
    val ids = jobIds.select(col("job_id"), col("routable"),
      col("bucket_in_range"), col("doc_class"), col("scope_realm"),
      col("handle"))
    val jcBind = bindings.filter(col("doc_class") === "JobControl")
      .select(col("handle"), col("allocated_by"),
        lit(true).as("bound"))
    val j = requests
      .join(broadcast(ids), Seq("job_id"), "left")
      .join(broadcast(jcBind), Seq("handle"), "left")
    val verdict =
      when(col("routable").isNull || !col("routable") ||
        !col("bucket_in_range"), "NotFound")
        .when(col("doc_class") =!= "JobControl" ||
          col("scope_realm") =!= realmId, "NotFound")
        .when(col("bound").isNull || col("allocated_by").isNull,
          "Unavailable")
        .when(col("allocated_by") === localNode, "Local")
        .when(col("has_request"), "Forward")
        .otherwise("Unauthorized")
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      when(col("verdict") === "Forward", col("allocated_by")).as("owner"))
  }
}
