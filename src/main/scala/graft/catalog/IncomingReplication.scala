package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incoming version-replication negotiation + head transition (reference
  * `operations/src/replication/incoming_version_replication.rs`).
  *
  * Negotiation ladder (`start`, `:1342-1368`; `ReadExistingVersion` arm,
  * `:1496-1577`; `request_blob_version`, `:655-663`):
  *
  *  1. origin hop_count > 4 rejects (`:1349-1354`); a manifest auth realm —
  *     or a present writer auth realm — different from the local realm
  *     rejects (`:1356-1366`): replication never crosses realms;
  *  2. a missing destination bucket is CREATED on first touch
  *     (`CreateDestinationBucket`); only the re-read failing after the
  *     create rejects — modelled as `bucket_created`;
  *  3. WRITE permission on the destination path, then the optional writer
  *     context's permission (`WriterPermissionDenied`, `:1487-1493`);
  *  4. the existing version at (bucket, key, version_id) short-circuits:
  *     an identical reference → AlreadyReplicatedVersion, a differing
  *     reference → NeedVersionOnly; a materialized copy with the SAME blob
  *     hash → AlreadyReplicatedVersion; a deleted version vs an incoming
  *     delete marker → AlreadyReplicatedVersion; an existing materialized
  *     version being replaced records its blob's logical bytes
  *     (`replaced_logical_bytes`, `:1578-1596`) for the quota delta;
  *  5. incoming delete markers and reference items never need bytes →
  *     NeedVersionOnly; incoming materialized blobs probe the hash on the
  *     backend this node routes the blob to — "a copy on any other backend
  *     cannot satisfy the destination placement" (`read_existing_blob`,
  *     `:636-653`) — present → NeedVersionOnly (adopt the local copy),
  *     absent → NeedBlobAndVersion; a FULL destination backend still
  *     probes ("a copy it already holds costs it nothing") and only
  *     rejects when the bytes are actually needed (`:655-663`).
  *
  * Head transition (`write_object_lookup_after_compare`, `:971-1016`;
  * `build_head_transition_effects`, `blob/blob_keyspace_helper.rs:199`;
  * `apply_liveness`, `:964-969`): a non-current item never touches the
  * pointer; a current item without a generation fails; the incoming
  * (generation, version_id) wins on strictly-greater OR equal vs the
  * existing pointer and loses otherwise; a won transition flips the
  * object-liveness delta = live(incoming kind) − live(previous current
  * version), the usage-accounting input.
  *
  * Scale: every rule is an equi-join on (bucket, key[, version]) or hash —
  * manifest batches join destination state without a shuffle on anything
  * corpus-sized; the quota gate itself is the accepted write-path
  * exclusion (BASELINE.json). */
object IncomingReplication {

  val HopLimit = 4 // incoming_version_replication.rs:1352

  /** Negotiation verdicts for a manifest batch.
    *
    * `manifests(bucket, key, version_id, kind, hop_count, realm,
    * writer_realm, hash, ref_sig)` with kind ∈ materialized |
    * delete_marker | reference; `buckets(bucket)` — existing destination
    * buckets; `perms(bucket, can_write, writer_ok)`;
    * `versions(bucket, key, version_id, state, hash, ref_sig, ref_len)`
    * with state ∈ materialized | deleted | reference;
    * `blobLocations(hash, backend, size)`; `backends(backend, full)`;
    * `routeBackendOf(bucket)` — the backend this node routes a bucket's
    * blobs to is `'b' || (a stable function of the bucket)` supplied as a
    * column on manifests (`route_backend`).
    *
    * Returns `(bucket, key, version_id, verdict, reason, bucket_created,
    * replaced_logical_bytes)` with verdict ∈ rejected |
    * already_replicated | need_version_only | need_blob_and_version. */
  def negotiate(manifests: DataFrame, buckets: DataFrame, perms: DataFrame,
      versions: DataFrame, blobLocations: DataFrame,
      backends: DataFrame, localRealm: String): DataFrame = {
    val ex = versions.select(col("bucket"), col("key"), col("version_id"),
      col("state").as("ex_state"), col("hash").as("ex_hash"),
      col("ref_sig").as("ex_ref_sig"), col("ref_len").as("ex_ref_len"))
    val loc = blobLocations.select(col("hash"), col("backend"),
      col("size").as("loc_size"))
    val ann = manifests
      .join(buckets.select(col("bucket"), lit(true).as("bkt_exists")),
        Seq("bucket"), "left_outer")
      .join(perms, Seq("bucket"), "left_outer")
      .join(ex, Seq("bucket", "key", "version_id"), "left_outer")
      // the probe asks only about the backend this node routes to
      .join(loc.select(col("hash").as("__p_hash"),
        col("backend").as("__p_backend"), col("loc_size").as("probe_size")),
        col("hash") === col("__p_hash") &&
          col("route_backend") === col("__p_backend"), "left_outer")
      .drop("__p_hash", "__p_backend")
      .join(backends.select(col("backend").as("route_backend"),
        col("full").as("backend_full")), Seq("route_backend"), "left_outer")
      // the replaced materialized blob's logical bytes, for the quota delta
      .join(loc.select(col("hash").as("ex_hash"),
        col("loc_size").as("ex_blob_size")).groupBy("ex_hash")
        .agg(max("ex_blob_size").as("ex_blob_size")),
        Seq("ex_hash"), "left_outer")

    ann.select(col("bucket"), col("key"), col("version_id"),
      col("kind"), col("hop_count"), col("realm"), col("writer_realm"),
      col("bkt_exists"), col("can_write"), col("writer_ok"),
      col("ex_state"), col("ex_hash"), col("hash"),
      col("ex_ref_sig"), col("ref_sig"), col("ex_ref_len"),
      col("probe_size"), col("backend_full"), col("ex_blob_size"))
      .withColumn("same_ref", coalesce(
        col("ex_ref_sig") === col("ref_sig"), lit(false)))
      // the already-replicated short-circuit fires at ReadExistingVersion,
      // BEFORE the byte probe — a same-hash manifest never sees the cap
      .withColumn("need_bytes_probe",
        col("kind") === "materialized" && col("probe_size").isNull &&
          !coalesce(col("ex_state") === "materialized" &&
            col("ex_hash") === col("hash"), lit(false)))
      .withColumn("reason",
        when(col("hop_count") > HopLimit, "hop_limit")
          .when(col("realm") =!= localRealm, "realm_mismatch")
          .when(col("writer_realm").isNotNull &&
            col("writer_realm") =!= localRealm, "realm_mismatch")
          .when(!coalesce(col("can_write"), lit(false)), "write_permission")
          .when(!coalesce(col("writer_ok"), lit(false)), "writer_access")
          .when(col("need_bytes_probe") &&
            coalesce(col("backend_full"), lit(false)), "backend_full"))
      .withColumn("verdict",
        when(col("reason").isNotNull, "rejected")
          // identical reference / same blob hash / marker-over-deleted
          .when(col("kind") === "reference" &&
            col("ex_state") === "reference" && col("same_ref"),
            "already_replicated")
          .when(col("kind") === "materialized" &&
            col("ex_state") === "materialized" &&
            col("ex_hash") === col("hash"), "already_replicated")
          .when(col("kind") === "delete_marker" &&
            col("ex_state") === "deleted", "already_replicated")
          .when(col("kind").isin("reference", "delete_marker"),
            "need_version_only")
          .when(col("probe_size").isNotNull, "need_version_only")
          .otherwise("need_blob_and_version"))
      // the bucket create precedes the permission checks, so only hop/realm
      // rejections (issued before ReadDestinationBucket) skip it
      .withColumn("bucket_created", !coalesce(col("bkt_exists"), lit(false))
        && (col("reason").isNull || col("reason").isin("write_permission",
          "writer_access", "backend_full")))
      .withColumn("replaced_logical_bytes",
        when(col("verdict").isin("need_version_only",
          "need_blob_and_version") && col("ex_state") === "materialized",
          coalesce(col("ex_blob_size"), lit(0L)))
          .when(col("verdict").isin("need_version_only",
            "need_blob_and_version") && col("ex_state") === "reference",
            coalesce(col("ex_ref_len"), lit(0L)))
          .when(col("verdict").isin("need_version_only",
            "need_blob_and_version"), lit(0L)))
      .select(col("bucket"), col("key"), col("version_id"), col("verdict"),
        col("reason"), col("bucket_created"), col("replaced_logical_bytes"))
  }

  /** Head-transition outcomes for applied versions.
    *
    * `applies(bucket, key, version_id, generation, kind, current_version)`;
    * `pointers(bucket, key, ptr_version, ptr_generation)`;
    * `currentStates(bucket, key, version_id, state)` — the state of the
    * version each pointer targets. Returns `(bucket, key, version_id,
    * outcome, pointer_written, new_ptr_version, new_ptr_generation,
    * previous_live, next_live, object_delta)`. */
  def headTransition(applies: DataFrame, pointers: DataFrame,
      currentStates: DataFrame): DataFrame = {
    val ptr = pointers.select(col("bucket"), col("key"),
      col("ptr_version"), col("ptr_generation"))
    val cur = currentStates.select(col("bucket"), col("key"),
      col("version_id").as("ptr_version"), col("state").as("cur_state"))
    applies
      .join(ptr, Seq("bucket", "key"), "left_outer")
      .join(cur, Seq("bucket", "key", "ptr_version"), "left_outer")
      .withColumn("outcome",
        when(!col("current_version"), "not_current")
          .when(col("generation").isNull, "missing_generation")
          .when(col("ptr_version").isNull, "pointer_set")
          .when(struct(col("generation"), col("version_id")) >=
            struct(col("ptr_generation"), col("ptr_version")),
            "pointer_advanced")
          .otherwise("pointer_kept"))
      .withColumn("pointer_written",
        col("outcome").isin("pointer_set", "pointer_advanced"))
      .withColumn("new_ptr_version",
        when(col("pointer_written"), col("version_id")))
      .withColumn("new_ptr_generation",
        when(col("pointer_written"), col("generation")))
      // liveness delta feeds usage accounting (apply_liveness, :964-969)
      .withColumn("previous_live", when(col("pointer_written"),
        coalesce(col("cur_state") === "materialized", lit(false))))
      .withColumn("next_live", when(col("pointer_written"),
        col("kind") === "materialized"))
      .withColumn("object_delta", when(col("pointer_written"),
        when(col("next_live"), 1L).otherwise(0L) -
          when(col("previous_live"), 1L).otherwise(0L)))
      .select(col("bucket"), col("key"), col("version_id"), col("outcome"),
        col("pointer_written"), col("new_ptr_version"),
        col("new_ptr_generation"), col("previous_live"), col("next_live"),
        col("object_delta"))
  }
}
