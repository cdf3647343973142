package graft.catalog

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Per-group quota fold state: request order within the group. (Top-level,
  * non-private: Catalyst's generated object projections must be able to
  * instantiate the encoder classes.) */
case class PoFoldRow(req_id: String, grp: String,
    size: Long, ok0: Boolean, gated: Boolean, base: Long, ceiling: Long)
case class PoFoldOut(req_id: String, quota_reject: Boolean, projected: Long)

/** PutObject admission + effects plan (reference
  * `operations/src/s3/put_object.rs` — the largest S3 operation, 2731 LoC).
  *
  * The reference is an effect state machine: write the bytes, then walk
  * Verify → CheckBucket → HashLookup → ObjectLookup → Quota → Commit inside
  * one transaction. The byte transport and the transaction fencing stay out
  * of scope (orchestration, BASELINE.json); everything the machine DECIDES
  * is queryable and is reproduced here for a request batch:
  *
  *  1. `handle_init` (`put_object.rs:260-283`): no body → MissingBody
  *     (nothing was written, so no rollback);
  *  2. `handle_write_finished` (`:284-327`): declared `content_length`
  *     present and != written size → IncompleteBody; then the expected
  *     checksums IN REQUEST ORDER — algorithm absent from the computed
  *     hash family → MissingExpectedChecksum(algo), digest mismatch →
  *     ChecksumMismatch(algo) (first failure wins);
  *  3. `handle_bucket_checked` (`:368-387`): the bucket record re-read in
  *     the transaction must still match the admission-time guard and carry
  *     the caller's group — a vanished record or a group mismatch is
  *     TransactionConflict (the delete/recreate race the re-read defends
  *     against);
  *  4. `handle_hash_lookup_checked` (`:391-436`): the blake3 lookup is
  *     scoped to the backend the write resolved to — a hit means the bytes
  *     already exist there, the put aliases the EXISTING location
  *     (`new_blob` false) and the just-written duplicate copy is queued for
  *     cleanup after commit (`cleanup_location`,
  *     `continue_after_dht_registration` `:884-893`); a miss is a new blob;
  *  5. `handle_object_lookup_read`/`handle_liveness_version_read`
  *     (`:493-541`): `was_live` = a current-version pointer exists AND the
  *     version it points at is not deleted; the new pointer's generation is
  *     `existing.generation + 1` else 1 (`blob.rs:716-723`);
  *  6. the quota gate (`usage_stats.rs:285-448`, started at
  *     `put_object.rs:726-753` only when a ceiling applies AND the write
  *     has bytes): group usage = local counters + remote node snapshots,
  *     skipping the local node's snapshot, nodes outside the realm's
  *     sync-eligible set, and snapshots whose embedded node id disagrees
  *     with their storage key; exceeded iff usage + size > ceiling
  *     (at-ceiling passes) → QuotaExceeded carrying (limit, projected),
  *     and the written blob is rolled back (`reject_over_quota`);
  *  7. commit accounting (`:669-717`): group delta objects +1 unless
  *     `was_live`, logical_bytes +size; stored delta (blobs, bytes) only
  *     when `new_blob` (`usage_stats.rs:87-99`).
  *
  * Batch semantics: requests commit transactionally in submission order
  * (serialized single-writer transactions), so a group's quota fold is
  * sequential — each put sees the logical bytes every earlier COMMITTED put
  * in its group added. Requests never share a key in the fixture (a same-key
  * pair would serialize on the head pointer, out of batch scope).
  *
  * Every error path that wrote bytes rolls the written blob back
  * (`cleanup_failed_write` / `abort` `:1055-1064`): `rollback_delete` is
  * true for every non-Ok verdict except MissingBody.
  *
  * Scale: the request batch is request-plane (bounded by the API batch
  * contract). The only corpus-scale work is the head probe — request keys
  * broadcast INTO the clustered versions-store scan (the drs1 shape); the
  * catalog, blob-location sample, and quota relations broadcast; the quota
  * fold is a per-group linear pass over batch-sized groups. Nothing
  * shuffles the corpus.
  */
object PutObject {

  /** Resolve effective group ceilings (`realm.rs:230-259`): an override row
    * wins even when its quota is NULL (explicitly unlimited); else the realm
    * default; the ceiling scales by the override's grace factor when set,
    * else the realm's. Integer floor, like the reference's u128 division. */
  def ceilings(groups: DataFrame, overrides: DataFrame,
      defaultQuota: Long, defaultGrace: Long): DataFrame =
    groups.join(overrides, Seq("group_id"), "left")
      .select(col("group_id"),
        when(col("has_override"),
          (col("quota_bytes") * coalesce(col("grace"), lit(defaultGrace)))
            .divide(100).cast("long"))
          .otherwise(lit(defaultQuota * defaultGrace / 100))
          .as("ceiling"))

  /** Group base usage for the quota gate (`usage_stats.rs:377-414`): local
    * counters plus eligible remote snapshots — skip the local node's own
    * snapshot, nodes outside the active set, and snapshots whose embedded
    * node id disagrees with their storage key. */
  def baseUsage(usageLocal: DataFrame, nodeUsage: DataFrame,
      activeNodes: Seq[String], localNode: String): DataFrame = {
    val remote = nodeUsage
      .filter(col("key_node") =!= localNode &&
        col("key_node").isin(activeNodes: _*) &&
        col("key_node") === col("embedded_node"))
      .groupBy("group_id").agg(sum("logical_bytes").as("remote_bytes"))
    usageLocal.join(remote, Seq("group_id"), "left")
      .select(col("group_id"),
        (col("logical_bytes") + coalesce(col("remote_bytes"), lit(0L)))
          .as("base_usage"))
  }

  /** The full admission plan for a put batch. `requests(req_id, bucket,
    * key, requester_group, has_body, size, content_length, blake3, backend,
    * exp1_algo, exp1_digest, exp2_algo, exp2_digest)`; `catalog(bucket,
    * group_id)`; `versions` is the maintained versions keyspace;
    * `blobLocations(blake3, backend)`; `groupCeilings(group_id, ceiling)`;
    * `groupUsage(group_id, base_usage)`. */
  def admissionPlan(spark: SparkSession, requests: DataFrame,
      catalog: DataFrame, versions: DataFrame, blobLocations: DataFrame,
      groupCeilings: DataFrame, groupUsage: DataFrame): DataFrame = {
    import spark.implicits._

    // head probe: request keys broadcast INTO the versions scan; one
    // partial-aggregate pass per probed key (no window over the corpus)
    val probeKeys = requests.select("bucket", "key").distinct()
    val heads = versions
      .join(broadcast(probeKeys), Seq("bucket", "key"))
      .groupBy("bucket", "key")
      .agg(count(lit(1)).as("vcount"),
        max_by(col("is_delete_marker"), col("version_ord")).as("head_dm"))

    // the computed hash family the blob write produced: the fixture derives
    // SHA256/CRC32 digests from the content hash; CRC64NVME is never
    // computed (the MissingExpectedChecksum arm)
    def computed(algo: org.apache.spark.sql.Column) =
      when(algo === "SHA256", md5(concat(lit("s:"), col("blake3"))))
        .when(algo === "CRC32", md5(concat(lit("c:"), col("blake3"))))

    def ckFail(a: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =
      when(a.isNotNull && computed(a).isNull,
        concat(lit("MissingExpectedChecksum:"), a))
        .when(a.isNotNull && computed(a) =!= d,
          concat(lit("ChecksumMismatch:"), a))

    val joined = requests
      .join(broadcast(catalog.select(col("bucket"),
        col("group_id").as("cat_group"))), Seq("bucket"), "left")
      .join(broadcast(heads), Seq("bucket", "key"), "left")
      .join(broadcast(blobLocations.select(col("blake3"), col("backend"),
        lit(true).as("dedup_hit"))), Seq("blake3", "backend"), "left")

    val verdict0 =
      when(!col("has_body"), "MissingBody")
        .when(col("content_length").isNotNull &&
          col("content_length") =!= col("size"), "IncompleteBody")
        .when(ckFail(col("exp1_algo"), col("exp1_digest")).isNotNull,
          ckFail(col("exp1_algo"), col("exp1_digest")))
        .when(ckFail(col("exp2_algo"), col("exp2_digest")).isNotNull,
          ckFail(col("exp2_algo"), col("exp2_digest")))
        .when(col("cat_group").isNull ||
          col("cat_group") =!= col("requester_group"), "TransactionConflict")
        .otherwise("Ok")

    // pre has two consumers (the fold input and the final join) and carries
    // the corpus head-probe — persist the request-scale relation so the
    // versions scan runs once, not twice
    val pre = joined
      .withColumn("verdict0", verdict0)
      .withColumn("grp", coalesce(col("cat_group"), lit("none")))
      .join(broadcast(groupCeilings
        .select(col("group_id").as("grp"), col("ceiling"))), Seq("grp"), "left")
      .join(broadcast(groupUsage
        .select(col("group_id").as("grp"), col("base_usage"))), Seq("grp"), "left")
      .withColumn("gated",
        col("ceiling").isNotNull && col("size") > 0)
      .persist()
    graft.Caches.track(pre)

    // sequential quota fold: per group in request order, each committed put
    // adds its logical bytes to what later puts in the group see. Groups are
    // batch-bounded (API request batches), so the in-memory sort is bounded.
    val foldIn = pre.select(col("req_id"), col("grp"), col("size"),
      (col("verdict0") === "Ok").as("ok0"), col("gated"),
      coalesce(col("base_usage"), lit(0L)).as("base"),
      coalesce(col("ceiling"), lit(-1L)).as("ceiling"))
      .as[PoFoldRow]
    val folded = foldIn.groupByKey(_.grp)(Encoders.STRING)
      .flatMapGroups { (_, it) =>
        var used = 0L
        it.toSeq.sortBy(_.req_id).iterator.map { r =>
          val projected = r.base + used + r.size
          val reject = r.ok0 && r.gated && projected > r.ceiling
          if (r.ok0 && !reject) used += r.size
          PoFoldOut(r.req_id, reject, projected)
        }
      }(Encoders.product[PoFoldOut]).toDF()

    val wasLive = coalesce(!col("head_dm").isNull && !col("head_dm"),
      lit(false))
    val ok = col("verdict") === "Ok"
    pre.join(broadcast(folded), Seq("req_id"))
      .withColumn("verdict",
        when(col("verdict0") === "Ok" && col("quota_reject"),
          "QuotaExceeded").otherwise(col("verdict0")))
      .select(
        col("req_id"),
        col("verdict"),
        when(ok, col("dedup_hit").isNull).as("new_blob"),
        when(ok, wasLive).as("was_live"),
        when(ok, when(col("vcount").isNotNull, col("vcount") + 1L)
          .otherwise(1L)).as("generation"),
        (ok && col("dedup_hit").isNotNull).as("dup_cleanup"),
        (!ok && col("verdict") =!= "MissingBody").as("rollback_delete"),
        when(ok && !wasLive, 1L).otherwise(0L).as("d_objects"),
        when(ok, col("size")).otherwise(0L).as("d_logical"),
        when(ok && col("dedup_hit").isNull, 1L).otherwise(0L)
          .as("d_stored_blobs"),
        when(ok && col("dedup_hit").isNull, col("size")).otherwise(0L)
          .as("d_stored_bytes"),
        when(col("verdict") === "QuotaExceeded", col("ceiling"))
          .as("quota_limit"),
        when(col("verdict") === "QuotaExceeded", col("projected"))
          .as("quota_projected"))
  }
}
