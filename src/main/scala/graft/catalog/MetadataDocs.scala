package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metadata-document CRUD admission ladders (reference
  * `operations/src/create_metadata_document.rs` (1699 LoC),
  * `operations/src/delete_metadata_document.rs` (1053),
  * `operations/src/update_metadata_document.rs` (948) — the mutation
  * verdicts of the engine's primary data model; gmd1 covers the read).
  *
  * The payload-content validation itself stays where it already lives:
  * RO-Crate structure under the jl1 machinery (a boolean input here) and
  * the single-entity JSON-LD rules in
  * [[graft.functions.EntityJson]] (exercised for real in umd1).
  */
object MetadataDocs {

  /** `graph_iri_for` (`metadata_registry.rs:31-33`). */
  def graphIriFor(documentId: Column): Column =
    concat(lit("https://w3id.org/aruna/"), documentId)

  /** `normalize_document_path` (`metadata_registry.rs:35-37`): trim
    * whitespace, then ALL leading/trailing slashes. */
  def normPath(path: Column): Column =
    regexp_replace(trim(path), "^/+|/+$", "")

  /** `permission_path_for` (`metadata_registry.rs:39-49`). */
  def permissionPathFor(realmId: Column, groupId: Column, path: Column,
      documentId: Column): Column =
    concat(lit("/"), realmId, lit("/g/"), groupId, lit("/meta/"),
      normPath(path), lit("@"), documentId)

  /** CreateMetadataDocument admission (`create_metadata_document.rs`):
    *
    *  1. ValidateGraph is the FIRST state — an invalid payload fails
    *     before any read (`:1496-1505`; crate validity is jl1's contract,
    *     a boolean here);
    *  2. CheckExisting (`:802`): a registry row for the document id →
    *     DocumentAlreadyExists (skipped for generated ids,
    *     `new_for_generated_document_id` `:157-161`);
    *  3. the create fence (`apply_create_fence` `:393-423`): an acceptance
    *     row whose config matches EXACTLY (`accepted_create_matches`
    *     `:480-505`: realm, group, normalized path, public) replays the
    *     accepted event idempotently — placement is NOT re-resolved; any
    *     mismatch is DocumentAlreadyExists. Batch fold: requests are
    *     transactionally sequential, so a later request of an in-batch
    *     accepted document replays/conflicts against the FIRST Ok request
    *     (the cb1 first-wins shape);
    *  4. placement from the MINTED id, never current path policy
    *     (`resolve_metadata_id` `:508-545`): no binding row or a
    *     non-Metadata class or a scope (realm/group) mismatch →
    *     PlacementBindingUnavailable — fails closed rather than guessing;
    *     a resolvable placement this node does not hold →
    *     OriginHoldsNoBucket (`:225-232` — the caller forwards to a
    *     holder);
    *  5. Ok: the record derives graph_iri / normalized path /
    *     permission_path (`build_record` `:236-263`).
    *
    * `requests(seq, req_id, document_id, realm_id, group_id,
    * document_path, public, payload_valid, skip_existing)`;
    * `registry(document_id)`; `acceptance(document_id, a_realm, a_group,
    * a_path, a_public, a_event_id)`; `placements(document_id, doc_class,
    * scope_kind, scope_id, is_holder)`.
    *
    * Scale: registry/acceptance/placements are corpus keyspaces — request
    * document ids broadcast INTO them; the in-batch fold windows over
    * batch-sized document groups. */
  def createVerdicts(requests: DataFrame, registry: DataFrame,
      acceptance: DataFrame, placements: DataFrame): DataFrame = {
    val probe = requests.select("document_id").distinct()
    val regHits = registry.join(broadcast(probe), Seq("document_id"))
      .select(col("document_id"), lit(true).as("in_registry"))
    val accHits = acceptance.join(broadcast(probe), Seq("document_id"))
      .select(col("document_id"), col("a_realm"), col("a_group"),
        col("a_path"), col("a_public"), col("a_event_id"))
    val plcHits = placements.join(broadcast(probe), Seq("document_id"))
      .select(col("document_id"), col("doc_class"), col("scope_kind"),
        col("scope_id"), col("is_holder"))

    val j = requests
      .join(broadcast(regHits), Seq("document_id"), "left")
      .join(broadcast(accHits), Seq("document_id"), "left")
      .join(broadcast(plcHits), Seq("document_id"), "left")
      .withColumn("norm_path", normPath(col("document_path")))

    val scopeOk =
      (col("scope_kind") === "Realm" && col("scope_id") === col("realm_id")) ||
        (col("scope_kind") === "Group" && col("scope_id") === col("group_id"))
    val storeMatch = col("a_realm") === col("realm_id") &&
      col("a_group") === col("group_id") &&
      col("a_path") === col("norm_path") &&
      col("a_public") === col("public")

    // verdict WITHOUT the in-batch fence (the store fence included): the
    // in-batch winner is derived from these, then later same-id requests
    // re-resolve against the winner
    val verdict0 =
      when(!col("payload_valid"), "InvalidInput")
        .when(col("in_registry").isNotNull && !col("skip_existing"),
          "DocumentAlreadyExists")
        .when(col("a_event_id").isNotNull,
          when(storeMatch, "OkReplayed").otherwise("DocumentAlreadyExists"))
        .when(col("doc_class").isNull || col("doc_class") =!= "Metadata" ||
          !scopeOk, "PlacementBindingUnavailable")
        .when(!col("is_holder"), "OriginHoldsNoBucket")
        .otherwise("Ok")

    // in-batch first-wins: the first request that durably ACCEPTED the id
    // (verdict0 Ok — replays don't write) is the fence every later request
    // of the same id reads
    val w = Window.partitionBy("document_id")
    val v0 = j.withColumn("verdict0", verdict0)
      .withColumn("first_ok_seq",
        min(when(col("verdict0") === "Ok", col("seq"))).over(w))
      .withColumn("w_realm",
        max(when(col("seq") === col("first_ok_seq"), col("realm_id"))).over(w))
      .withColumn("w_group",
        max(when(col("seq") === col("first_ok_seq"), col("group_id"))).over(w))
      .withColumn("w_path",
        max(when(col("seq") === col("first_ok_seq"), col("norm_path"))).over(w))
      .withColumn("w_public",
        max(when(col("seq") === col("first_ok_seq"), col("public"))).over(w))

    val afterWinner = col("first_ok_seq").isNotNull &&
      col("seq") > col("first_ok_seq") &&
      // the store fence already decided these arms before placement ran
      !col("verdict0").isin("InvalidInput", "DocumentAlreadyExists",
        "OkReplayed")
    val batchMatch = col("w_realm") === col("realm_id") &&
      col("w_group") === col("group_id") &&
      col("w_path") === col("norm_path") &&
      col("w_public") === col("public")
    val verdict =
      when(afterWinner, when(batchMatch, "OkReplayed")
        .otherwise("DocumentAlreadyExists"))
        .otherwise(col("verdict0"))

    val ok = col("verdict").isin("Ok", "OkReplayed")
    v0.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      (col("verdict") === "OkReplayed").as("replayed"),
      when(ok, graphIriFor(col("document_id"))).as("graph_iri"),
      when(ok, col("norm_path")).as("norm_path"),
      when(ok, permissionPathFor(col("realm_id"), col("group_id"),
        col("document_path"), col("document_id"))).as("permission_path"),
      // a store replay returns the ORIGINAL accepted event id
      when(col("verdict") === "OkReplayed", col("a_event_id"))
        .as("replayed_event_id"))
  }

  /** DeleteMetadataDocument verdicts (`delete_metadata_document.rs`):
    * the registry read is (group, document)-keyed — absent (or the wrong
    * group) is DocumentNotFound (`:364`); the delete tombstones the graph
    * (status Deleted), queues a graph-prune job, writes the
    * document-lifecycle tombstone carrying
    * `deleted_after_event_id = record.last_event_id` (`:170-176`), removes
    * the registry/index/holder rows, and publishes THREE outbox records
    * (document-lifecycle, graph-lifecycle genesis, registry delete,
    * `:178-298`). Batch fold: the registry row is deleted in the first
    * transaction, so a second in-batch delete of the same document is
    * DocumentNotFound.
    *
    * `requests(seq, req_id, group_id, document_id)`; `registry` carries
    * `(group_id, document_id, graph_iri, last_event_id)`.
    *
    * Scale: request keys broadcast into the registry scan; the dup fold
    * windows over batch-sized groups. */
  def deleteVerdicts(requests: DataFrame, registry: DataFrame): DataFrame = {
    val probe = requests.select("group_id", "document_id").distinct()
    val hits = registry.join(broadcast(probe), Seq("group_id", "document_id"))
      .select(col("group_id"), col("document_id"), col("graph_iri"),
        col("last_event_id"))
    val w = Window.partitionBy("group_id", "document_id").orderBy("seq")
    requests
      .join(broadcast(hits), Seq("group_id", "document_id"), "left")
      .withColumn("nth", row_number().over(w))
      .withColumn("verdict",
        when(col("graph_iri").isNull || col("nth") > 1, "DocumentNotFound")
          .otherwise("Ok"))
      .select(
        col("req_id"), col("verdict"),
        when(col("verdict") === "Ok", col("graph_iri")).as("graph_iri"),
        when(col("verdict") === "Ok", col("last_event_id"))
          .as("deleted_after_event_id"),
        when(col("verdict") === "Ok", "Deleted").as("tombstone_status"),
        (col("verdict") === "Ok").as("prune_job"),
        when(col("verdict") === "Ok", 3L).as("n_outbox"))
  }

  /** UpdateMetadataDocument non-payload ladder
    * (`update_metadata_document.rs:130-169,360-470`):
    *
    *  1. ReadCurrent is the FIRST state — an unknown (group, document) key
    *     is DocumentNotFound BEFORE any validation runs (`:377`);
    *  2. mutation validation: ReplaceRoCrate revalidates the full crate
    *     (jl1's contract, a boolean here); the two entity upserts run
    *     `validate_entity_jsonld` (`:292-345` —
    *     [[graft.functions.EntityJson]], exercised for real) →
    *     InvalidInput:<rule>;
    *  3. Ok: the record takes the request's `public`, bumps
    *     `updated_at_ms`, and the event stamps a NEW `last_event_id`
    *     while `establishing_event_id` stays (`updated_record` `:130-134`,
    *     `update_event_record` `:156-169`); the audit op names the
    *     mutation and a materialization drain is scheduled (`:436-447`).
    *
    * `requests(req_id, group_id, document_id, public, mutation, jsonld,
    * crate_valid)`. */
  def updateVerdicts(requests: DataFrame, registry: DataFrame): DataFrame = {
    val probe = requests.select("group_id", "document_id").distinct()
    val hits = registry.join(broadcast(probe), Seq("group_id", "document_id"))
      .select(col("group_id"), col("document_id"), col("graph_iri"),
        col("public").as("old_public"))
    val entity = graft.functions.EntityJson.verdictUdf(col("jsonld"))
    val verdict =
      when(col("graph_iri").isNull, "DocumentNotFound")
        .when(col("mutation") === "ReplaceRoCrate" && !col("crate_valid"),
          "InvalidInput:crate")
        .when(col("mutation").isin("UpsertDataEntity",
          "UpsertContextualEntity") && entity =!= "ok",
          concat(lit("InvalidInput:"), entity))
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    requests
      .join(broadcast(hits), Seq("group_id", "document_id"), "left")
      .withColumn("verdict", verdict)
      .select(
        col("req_id"), col("verdict"),
        when(ok, col("graph_iri")).as("graph_iri"),
        when(ok, col("public")).as("public_out"),
        // the update flips visibility; the flip itself is observable
        when(ok, col("public") =!= col("old_public")).as("public_changed"),
        when(ok, col("mutation")).as("audit_op"),
        (ok).as("mat_drain"))
  }
}
