package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Durable blob-cleanup queue drain (reference
  * `operations/src/blob/cleanup.rs:111-307`) — the queue up1/po1/cat17
  * feed their rollback rows into.
  *
  * Per queued row, in the drain's order:
  *
  *  1. an UNDECODABLE row is dropped — it would wedge the drain forever
  *     (`:128-136`);
  *  2. a row whose tenant backend was REMOVED is dropped — credentials
  *     can never resolve again (`:138-147`);
  *  3. `DeleteBlob` attempts the delete: success → processed (row
  *     removed), a blob fault → failed (row retained for the next
  *     drain);
  *  4. `ReconcileWrite` reads the owning record (`owns_write`
  *     `:264-307`): an UNREADABLE owner proves nothing — the row waits
  *     (`failed`); an ABSENT record disowns the copy → delete; a record
  *     naming THIS exact physical copy owns it → processed with the blob
  *     KEPT; a record naming a different copy → delete;
  *  5. `RegisterDht` re-attempts the deferred DHT put (transport —
  *     success flag here): failure retains the row.
  *
  * `rows(row_id, work_kind, decodable, backend, delete_ok, dht_ok,
  * owner_readable, owner_present, owner_same)`;
  * `removedBackends(backend)`.
  *
  * Scale: the queue is drained in pages (CLEANUP_PAGE_SIZE); verdicts are
  * one pass over the page batch with the removed-backend set broadcast. */
object BlobCleanup {

  def drain(rows: DataFrame, removedBackends: DataFrame): DataFrame = {
    val j = rows.join(broadcast(removedBackends
      .select(col("backend"), lit(true).as("backend_removed"))),
      Seq("backend"), "left")
    val removed = coalesce(col("backend_removed"), lit(false))
    // the reconcile arm: does the committed record still name this copy?
    val reconcile =
      when(!col("owner_readable"), "Failed") // nothing proven: wait
        .when(col("owner_present") && col("owner_same"), "Processed")
        // disowned (absent or different copy): the delete decides
        .when(col("delete_ok"), "Processed")
        .otherwise("Failed")
    val verdict =
      when(!col("decodable"), "Dropped")
        .when(col("backend").isNotNull && removed, "Dropped")
        .when(col("work_kind") === "DeleteBlob",
          when(col("delete_ok"), "Processed").otherwise("Failed"))
        .when(col("work_kind") === "ReconcileWrite", reconcile)
        .otherwise( // RegisterDht
          when(col("dht_ok"), "Processed").otherwise("Failed"))
    val action =
      when(col("verdict") =!= "Processed", lit(null).cast("string"))
        .when(col("work_kind") === "DeleteBlob", "deleted")
        .when(col("work_kind") === "ReconcileWrite",
          when(col("owner_present") && col("owner_same"), "kept")
            .otherwise("deleted"))
        .otherwise("dht_registered")
    j.withColumn("verdict", verdict).select(
      col("row_id"), col("work_kind"), col("verdict"),
      action.as("action"),
      // processed AND dropped rows leave the queue; failed rows stay
      (col("verdict") =!= "Failed").as("row_removed"))
  }
}
