package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sync-relationship management (reference
  * `operations/src/sync_relationship.rs` (889 LoC) +
  * `core/src/structs/sync_relationship.rs`).
  *
  *  - **create** (`sync_relationship.rs:61-109,143-190`): the source
  *    endpoint must be a canonical S3 ARN carrying a bucket
  *    (`validate_endpoint`, `sync_relationship.rs:147-153` core) →
  *    NotAnS3Arn; the source bucket's outgoing prefix is scanned and any
  *    existing relationship with the same `(source, target, mode)`
  *    CREATE IDENTITY (`same_create_identity` `:235-237`) blocks as
  *    Duplicate — EXCEPT Detached stubs, which only keep retained
  *    reference data readable and must never block re-creating
  *    (`:168-172`); batch creates are transactionally sequential, so an
  *    in-batch same-identity pair resolves first-wins;
  *  - **remove** (`remove_outgoing_relationship` `:119-142`): a
  *    relationship SERVING REFERENCES is detached, not deleted — the
  *    target keeps `BlobVersion::Reference` records bound to this
  *    relationship id and every native-reference read authorizes through
  *    the outgoing record, so a serving-only stub must survive; all
  *    other modes are removed outright; an unknown id is NotFound.
  *
  * `requests(seq, req_id, op, rel_id, source_bucket, source_arn_ok,
  * source, target, mode)`; `store(rel_id, source, target, mode, state,
  * serving)`.
  *
  * Scale: the relationship store is config-plane (per-bucket) — probes
  * broadcast; the in-batch fold windows over batch-sized identities. */
object SyncRelationships {

  def decide(requests: DataFrame, store: DataFrame): DataFrame = {
    // duplicate check: any non-Detached same-identity row in the store
    val liveIdent = store.filter(col("state") =!= "Detached")
      .select(col("source"), col("target"), col("mode"),
        lit(true).as("store_dup")).distinct()
    val byId = store.select(col("rel_id"), col("serving"),
      lit(true).as("id_known"))

    // in-batch fold: only an EARLIER create that actually wrote (valid
    // ARN, and not itself blocked by the store) fences later same-identity
    // creates — a rejected first attempt leaves nothing behind
    val w = Window.partitionBy("source", "target", "mode").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val j = requests
      .join(broadcast(liveIdent), Seq("source", "target", "mode"), "left")
      .join(broadcast(byId), Seq("rel_id"), "left")
      .withColumn("n_written_upto",
        sum(when(col("op") === "create" && col("source_arn_ok") &&
          col("store_dup").isNull, 1L).otherwise(0L)).over(w))

    val verdict =
      when(col("op") === "create",
        when(!col("source_arn_ok"), "NotAnS3Arn")
          .when(col("store_dup").isNotNull, "Duplicate")
          .when(col("n_written_upto") > 1, "Duplicate")
          .otherwise("Ok"))
        .otherwise( // remove
          when(col("id_known").isNull, "NotFound")
            .otherwise("Ok"))

    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      when(ok && col("op") === "create", "Enabled").as("state_out"),
      // serving relationships detach (stub survives); others delete
      when(ok && col("op") === "remove",
        when(col("serving"), "Detached").otherwise("Deleted"))
        .as("removal"),
      (ok && col("op") === "remove" && col("serving")).as("stub_survives"))
  }
}
