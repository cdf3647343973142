package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GA4GH DRS object resolution (reference `api/src/routes/drs.rs`): the
  * interop surface that turns a locator — canonical data W3ID
  * (`https://w3id.org/aruna/data/<hex-hash>`), a W3ID-wrapped or bare
  * versioned ARN (`arn:aruna:<realm>:<node>:s3/<bucket>/<key>@<version>`),
  * or a content-hash ARN (`...:ch/<hex-hash>`) — into a concrete
  * (bucket, key, version) copy with a canonical W3ID, or one of the DRS
  * outcomes `not_found` / `denied` / `bad_request`.
  *
  * `POST /ga4gh/drs/v1/objects` resolves a BATCH of locators
  * (`drs.rs:298-343`), which is exactly the relational form: parse is a
  * codegen'd regexp projection, the versioned path is a (bucket, key,
  * version) equi-join ladder, and the content-hash path is a hash-keyed
  * join onto the version store with a FIRST-SUCCESS window over the
  * mapping order. Semantics pinned from `resolve_versioned` /
  * `resolve_content_hash` (`drs.rs:510-683`):
  *
  *  - scope (realm, node) mismatch → not_found, before any read;
  *  - versioned: missing bucket / key / version, a delete-marker head, or
  *    a version with no stored location → not_found; then READ permission
  *    (the caller's readable-group set) → denied; else found;
  *  - content hash: walk this node's mappings in order, skipping
  *    permission-denied mappings, unresolvable heads and STALE mappings
  *    whose stored bytes no longer carry the requested hash (the blake3
  *    double-check, `drs.rs:664-666`); first survivor wins. When
  *    mappings existed but none survived the outcome is DENIED — the
  *    reference deliberately does not distinguish "all stale/markers"
  *    from "no access" once the hash provably exists on this node;
  *  - unparseable locators → bad_request (`parse_requested_object_id`).
  *
  * Fixture note: the reference's content hashes are 64-hex blake3; the
  * object fixture keys on 32-hex md5, so locators carry `hash || hash`
  * and the join matches on the first half — parse-shape identical.
  */
object Drs {

  val W3idPrefix = "https://w3id.org/aruna/data/"

  /** `requests(object_id)` × the version store. `readableGroups(group_id)`
    * is the caller's read set (broadcast — auth scoping, sp15-style).
    * A version "has no stored location" when `version_ord % 101 == 0`;
    * a content-hash mapping is STALE when `version_ord % 89 == 0`. */
  def bulkResolve(requests: DataFrame, objects: DataFrame, buckets: DataFrame,
      readableGroups: DataFrame, localRealm: String, localNode: String): DataFrame = {
    val id = col("object_id")
    val afterW3id = expr(s"substring(object_id, ${W3idPrefix.length + 1})")
    val isW3id = id.startsWith(W3idPrefix)
    val body = when(isW3id, afterW3id).otherwise(id)
    val isHex64 = isW3id && afterW3id.rlike("^[0-9a-f]{64}$")
    val arnRe = "^arn:aruna:([^:]+):([^:]+):(s3|ch)/(.+)$"
    val isArn = body.rlike(arnRe)
    val arnRealm = regexp_extract(body, arnRe, 1)
    val arnNode = regexp_extract(body, arnRe, 2)
    val arnKind = regexp_extract(body, arnRe, 3)
    val arnPath = regexp_extract(body, arnRe, 4)
    val s3Re = "^([^/]+)/(.+)@([^@/]+)$"
    val s3Ok = arnKind === "s3" && arnPath.rlike(s3Re)
    val chOk = arnKind === "ch" && arnPath.rlike("^[0-9a-f]{64}$")

    // Persisted: the batch is API-sized by contract (the reference's bulk
    // endpoint takes a bounded request list) and every downstream branch —
    // probe-key broadcasts, the four outcome arms — re-derives it
    // otherwise, each recomputation a fresh pass over the request source.
    val parsed = requests.select(id,
      when(isHex64, "hash")
        .when(isArn && s3Ok, "versioned")
        .when(isArn && chOk, "hash")
        .otherwise("bad").as("kind"),
      when(isArn, arnRealm).otherwise(lit(null)).as("p_realm"),
      when(isArn, arnNode).otherwise(lit(null)).as("p_node"),
      when(isHex64, substring(afterW3id, 1, 32))
        .when(isArn && chOk, substring(arnPath, 1, 32))
        .otherwise(lit(null)).as("p_hash"),
      when(isArn && s3Ok, regexp_extract(arnPath, s3Re, 1)).otherwise(lit(null))
        .as("p_bucket"),
      when(isArn && s3Ok, regexp_extract(arnPath, s3Re, 2)).otherwise(lit(null))
        .as("p_key"),
      when(isArn && s3Ok, regexp_extract(arnPath, s3Re, 3)).otherwise(lit(null))
        .as("p_version")).persist()
    graft.Caches.track(parsed)

    val scopeOk = (col("p_realm").isNull ||
      (col("p_realm") === localRealm && col("p_node") === localNode))
    val readable = broadcast(readableGroups
      .select(col("group_id"), lit(true).as("can_read")))
    val grpOfBucket = broadcast(buckets.select(col("bucket"), col("group_id")))

    // Scale shape: the request batch is API-sized (thousands) while the
    // version store is the 100 TB side, and Spark cannot broadcast the
    // OUTER side of a left join — a naive parsed⋈objects left-join would
    // shuffle the whole store by (bucket, key, version). Instead the
    // small side's DISTINCT probe keys broadcast into an INNER join
    // against the store (one scan, zero store shuffle, keys act as a
    // runtime filter), and the request batch left-joins the store-sized-
    // DOWN match set afterwards.

    // versioned ladder: resolution misses -> not_found, permission -> denied
    val versReqs = parsed.filter(col("kind") === "versioned")
    val versKeys = versReqs
      .select(col("p_bucket"), col("p_key"), col("p_version")).distinct()
    val versMatched = objects
      .select(col("bucket").as("p_bucket"), col("key").as("p_key"),
        col("version_ulid").as("p_version"), col("is_delete_marker"),
        col("version_ord"))
      .join(broadcast(versKeys), Seq("p_bucket", "p_key", "p_version"))
    val vers = versReqs
      .join(broadcast(versMatched), Seq("p_bucket", "p_key", "p_version"),
        "left_outer")
      .join(grpOfBucket.withColumnRenamed("bucket", "p_bucket"),
        Seq("p_bucket"), "left_outer")
      .join(readable, Seq("group_id"), "left_outer")
      .select(col("object_id"),
        when(!scopeOk || col("group_id").isNull || col("version_ord").isNull ||
            col("is_delete_marker") || col("version_ord") % 101 === 0,
          "not_found")
          .when(col("can_read").isNull, "denied")
          .otherwise("found").as("outcome"),
        col("p_bucket"), col("p_key"), col("p_version"), col("p_hash"))

    // content-hash walk: first surviving mapping in (bucket, key, version)
    // order — realized as MIN over tab-joined identity strings (tab sorts
    // below every key/bucket character in both engines, so concat order ==
    // tuple order); mappings exist but none survive -> denied.
    // The walk aggregates PER HASH over the store before touching the
    // request batch: a content hash is shared by many versions (that is
    // the point of content addressing), so joining requests first would
    // fan every request out by its hash's version count; aggregating
    // first keeps the expensive pass map-side-partial over one store scan
    // and the request join is then tiny⋈tiny.
    val hashReqs = parsed.filter(col("kind") === "hash" && scopeOk)
    val hashKeys = hashReqs.select(col("p_hash")).distinct()
    val hashAgg = objects.filter(!col("is_delete_marker"))
      .select(col("hash").as("p_hash"), col("bucket"), col("key"),
        col("version_ulid"), col("version_ord"))
      .join(broadcast(hashKeys), Seq("p_hash"))
      .join(grpOfBucket, Seq("bucket"), "left_outer")
      .join(readable, Seq("group_id"), "left_outer")
      .withColumn("ok",
        col("can_read").isNotNull && col("version_ord") % 101 =!= 0 &&
          col("version_ord") % 89 =!= 0)
      .groupBy(col("p_hash"))
      .agg(count(col("version_ord")).as("n_map"),
        min(when(col("ok"),
          concat_ws("\t", col("bucket"), col("key"), col("version_ulid"))))
          .as("best"))
    val hash = hashReqs
      .join(broadcast(hashAgg), Seq("p_hash"), "left_outer")
      .select(col("object_id"),
        when(col("n_map").isNull || col("n_map") === 0, "not_found")
          .when(col("best").isNotNull, "found")
          .otherwise("denied").as("outcome"),
        split(col("best"), "\t").getItem(0).as("p_bucket"),
        split(col("best"), "\t").getItem(1).as("p_key"),
        split(col("best"), "\t").getItem(2).as("p_version"),
        col("p_hash"))

    val scoped = parsed.filter(col("kind") === "hash" && !scopeOk)
      .select(col("object_id"), lit("not_found").as("outcome"),
        lit(null).cast("string").as("p_bucket"),
        lit(null).cast("string").as("p_key"),
        lit(null).cast("string").as("p_version"), col("p_hash"))
    val bad = parsed.filter(col("kind") === "bad")
      .select(col("object_id"), lit("bad_request").as("outcome"),
        lit(null).cast("string").as("p_bucket"),
        lit(null).cast("string").as("p_key"),
        lit(null).cast("string").as("p_version"), col("p_hash"))

    vers.unionByName(hash).unionByName(scoped).unionByName(bad)
      .select(col("object_id"), col("outcome"),
        when(col("outcome") === "found", col("p_bucket")).otherwise(lit(null))
          .as("bucket"),
        when(col("outcome") === "found", col("p_key")).otherwise(lit(null))
          .as("key"),
        when(col("outcome") === "found", col("p_version")).otherwise(lit(null))
          .as("version_id"),
        when(col("outcome") =!= "found", lit(null))
          .when(col("p_hash").isNotNull,
            concat(lit(W3idPrefix), col("p_hash"), col("p_hash")))
          .otherwise(concat(lit(W3idPrefix), lit("arn:aruna:"),
            lit(localRealm), lit(":"), lit(localNode), lit(":s3/"),
            col("p_bucket"), lit("/"), col("p_key"), lit("@"),
            col("p_version"))).as("canonical_w3id"))
  }
}
