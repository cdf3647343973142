package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replica location summary: "which copy of a version sits where" as batch
  * relations (reference `operations/src/replication/location_summary/` and
  * the `/blobs/locations` merge in `api/src/routes/blobs.rs:358-626`).
  *
  * The reference answers one (bucket, key, version) probe with four candidate
  * sources — outbound sync-relationship targets (with the key REWRITTEN
  * through the relationship's prefix mapping), bucket-configured replication
  * targets, queued replication jobs, and the durable holder index — merged
  * into a capped destination set, then classifies each destination
  * Present / Pending / NotStored from the per-node summary. Here each source
  * is a join against a config-sized relation and the merge is a union +
  * first-arrival window, so a BATCH of probes runs in one plan.
  *
  * Scale shape: relationships / bucket targets / the 1024-row queued-scan
  * window are config- or contract-bounded (broadcast); the only corpus-scale
  * inputs are the version store (probe resolution, pushed-prefix scan) and
  * the job keyspace (bounded TakeOrdered). Nothing shuffles the corpus.
  */
object Replication {

  /** 256-row pages × 4 pages (`location_summary/queued.rs:14-15`). */
  val QueuedScanCap = 1024

  /** Destination cap per request (`api/src/routes/blobs.rs:56`). */
  val CandidateLimit = 64

  /** `map_sync_key` (`replication/version_replication.rs:473-494`): strip the
    * source prefix (no match → no target at all, NOT the unstripped key),
    * then join the suffix onto the target prefix gluing exactly one `/` at
    * the seam when the prefix looks like a directory; a bare target prefix
    * concatenates verbatim; no target prefix → suffix with ALL leading
    * slashes trimmed. Pure codegen'd expression — runs on the ingest scan. */
  def mapSyncKey(key: Column, sourcePrefix: Column, targetPrefix: Column): Column = {
    val suffix = when(sourcePrefix.isNull, key)
      .when(key.startsWith(sourcePrefix),
        key.substr(length(sourcePrefix) + 1, length(key)))
      .otherwise(lit(null))
    when(suffix.isNull, lit(null))
      .when(targetPrefix.isNull, regexp_replace(suffix, "^/+", ""))
      .when(targetPrefix.endsWith("/") && suffix.startsWith("/"),
        concat(targetPrefix, suffix.substr(lit(2), length(suffix))))
      .when(!targetPrefix.endsWith("/") && length(suffix) > 0 &&
          !suffix.startsWith("/"),
        concat(targetPrefix, lit("/"), suffix))
      .otherwise(concat(targetPrefix, suffix))
  }

  /** `RelationshipReplicaNodesOperation` (`location_summary/relationships.rs:
    * 37-140`): destinations an enabled outbound relationship will replicate a
    * version to. Admission = the live queue's own rule: Continuous/Reference
    * mode, Enabled state, source is THIS node and THIS bucket, a delete
    * marker only when the relationship replicates deletes, never back to the
    * local node; the key runs through [[mapSyncKey]] so a prefix rewrite is
    * asked about where the copy actually lands (a prefix miss contributes
    * nothing). Distinct (node, bucket, key) — two relationships to one node
    * with different mappings are two destinations.
    *
    * `probes(p_bucket, p_key, p_dm, …)`; relationships is config-sized →
    * broadcast onto the probe relation. */
  def replicaTargets(probes: DataFrame, relationships: DataFrame,
      localNode: String): DataFrame = {
    val admitted = relationships.filter(
      col("mode").isin("Continuous", "Reference") &&
        col("state") === "Enabled" &&
        col("source_node") === localNode &&
        col("target_node") =!= localNode)
    probes.join(broadcast(admitted),
        probes("p_bucket") === admitted("source_bucket"))
      .filter(!col("p_dm") || col("replicate_deletes"))
      .withColumn("t_key",
        mapSyncKey(col("p_key"), col("source_prefix"), col("target_prefix")))
      .filter(col("t_key").isNotNull)
      .select(col("p_bucket"), col("p_key"),
        col("target_node").as("node_id"),
        col("target_bucket").as("t_bucket"), col("t_key"))
      .distinct()
  }

  /** The queued-job scan window (`location_summary/queued.rs:64-137`): the
    * keyspace is walked in key order for at most 4×256 rows, shared by every
    * probe of the batch. TakeOrdered — top-1024 per map task, merged. */
  def queuedWindow(jobs: DataFrame): DataFrame =
    jobs.orderBy(col("job_key")).limit(QueuedScanCap)

  /** Probe-independent scan outcome: undecodable records inside the window
    * are `skipped` (the walk continues), and the walk is `truncated` when a
    * fifth page would exist — either one means a queued copy may be missing.
    * One row (skipped, truncated). */
  def queuedScanFlags(jobs: DataFrame): DataFrame = {
    val inWin = queuedWindow(jobs)
      .agg(sum(when(!col("decodable"), 1L).otherwise(0L)).as("skipped"))
    jobs.agg((count(lit(1)) > QueuedScanCap).as("truncated"))
      .crossJoin(inWin)
      .select(col("skipped"), col("truncated"))
  }

  /** Per-probe nodes with a covering queued job: `covers` mirrors
    * `ReplicateScopeOperation::should_enqueue_version` — bucket match, a
    * delete marker only when the job replicates markers, then the scope
    * target: whole Bucket, key Prefix, exact Object, or exact Version
    * (`queued.rs:78-92`). Only decodable window rows participate. */
  def queuedNodes(probes: DataFrame, jobs: DataFrame): DataFrame = {
    val win = broadcast(queuedWindow(jobs).filter(col("decodable")))
    probes.join(win,
        col("p_bucket") === col("j_bucket") &&
          (!col("p_dm") || col("j_markers")) &&
          (col("j_kind") === "Bucket" ||
            (col("j_kind") === "Prefix" && col("p_key").startsWith(col("j_prefix"))) ||
            (col("j_kind") === "Object" && col("j_key") === col("p_key")) ||
            (col("j_kind") === "Version" && col("j_key") === col("p_key") &&
              col("j_version") === col("p_version"))))
      .select(col("p_bucket"), col("p_key"), col("j_node").as("node_id"))
      .distinct()
  }

  /** Deterministic md5 residue in [0, m) over the given identity — stands in
    * for "this node has a location record / holder entry", the same
    * closed-form-fixture device the blobs/objects tables use. */
  def residue(m: Int, cols: Column*): Column =
    graft.functions.Md5HexLong(concat_ws("|", cols: _*), 1, 15) % m

  /** The `/blobs/locations` merge (`api/src/routes/blobs.rs:358-626`) for a
    * probe batch: one relation of classified copies.
    *
    * Candidate destinations (node, bucket, key) arrive in four phases —
    * 1 relationship targets (the only source that knows a REWRITTEN path),
    * 2 bucket-configured targets, 3 queued nodes (≠ local), 4 holder-index
    * nodes; phases 1–3 are `expected` (planned copies), holders are not.
    * The set caps at [[CandidateLimit]] destinations by arrival order
    * (first phase wins; sorted within a phase, the reference's BTreeSet
    * walk), later arrivals of a kept destination only widen `expected`.
    *
    * Each kept destination classifies like `copy_response`/`peer_copy`
    * (`blobs.rs:308-339,601-616`): held → Present (with its storage kind);
    * not held on a non-materialized version (a delete marker — no copy is
    * coming for it anywhere) → NotStored; not held but expected → Pending;
    * not held and NOT expected (holder-index-only candidate that does not
    * hold this version under the asked path) → dropped from the answer. The
    * local node's own summary is always row one. "held" and the holder
    * index are md5-residue fixtures ([[residue]]); holders key on the
    * CONTENT hash (a delete marker has no hash and no holders), destination
    * summaries on (node, path, version).
    *
    * Per-probe trailer columns (the response's `limits`/`complete`):
    * q_truncated / q_skipped (queued scan), capped (destination cap hit),
    * path_unknown (some asked node answered under NO path — its copy list
    * may be short), complete = no limit fired. */
  def blobLocations(probesIn: DataFrame, relationships: DataFrame,
      bucketTargets: DataFrame, jobs: DataFrame, localNode: String,
      holderNodes: Int = 8): DataFrame = {
    // the probe relation is request-sized but resolved through a
    // corpus-scale head window — five consumers below (three phases, the
    // holder cross, the meta join) must not re-run that resolution
    val probes = probesIn.persist()
    graft.Caches.track(probes)
    val pcols = Seq(col("p_bucket"), col("p_key"))

    val rel = replicaTargets(probes, relationships, localNode)
      .select(pcols :+ col("node_id") :+ col("t_bucket").as("bucket") :+
        col("t_key").as("key"): _*)
      .withColumn("phase", lit(1)).withColumn("expected", lit(true))

    val cfg = probes.join(broadcast(
        bucketTargets.filter(col("target_node") =!= localNode)),
        col("p_bucket") === col("cfg_bucket"))
      .filter(!col("p_dm") || col("cfg_markers"))
      .select(pcols :+ col("target_node").as("node_id") :+
        col("cfg_target_bucket").as("bucket") :+ col("p_key").as("key"): _*)
      .withColumn("phase", lit(2)).withColumn("expected", lit(true))

    val qn = queuedNodes(probes, jobs).filter(col("node_id") =!= localNode)
      .join(probes.select(col("p_bucket"), col("p_key")), Seq("p_bucket", "p_key"))
      .select(pcols :+ col("node_id") :+ col("p_bucket").as("bucket") :+
        col("p_key").as("key"): _*)
      .withColumn("phase", lit(3)).withColumn("expected", lit(true))

    // durable holder index: nodes that store these BYTES (keyed by content
    // hash; a non-materialized version has no hash and no holders)
    val hold = probes.filter(!col("p_dm"))
      .crossJoin(broadcast(nodeSet(holderNodes)))
      .filter(residue(3, col("p_hash"), col("h_node")) === 0)
      .select(pcols :+ col("h_node").as("node_id") :+
        col("p_bucket").as("bucket") :+ col("p_key").as("key"): _*)
      .withColumn("phase", lit(4)).withColumn("expected", lit(false))

    val arrivals = rel.unionByName(cfg).unionByName(qn).unionByName(hold)
      .groupBy(col("p_bucket"), col("p_key"), col("node_id"), col("bucket"),
        col("key"))
      .agg(min(col("phase")).as("phase"), max(col("expected")).as("expected"))
    // NOTE (r8): the window chain below was measured AGAINST a rewrite that
    // folded nodeW/probeW into groupBy aggregates + broadcast joins — the
    // rewrite was ~30% SLOWER. All four windows cluster on (p_bucket,
    // p_key) prefixes, so hashpartitioning(p_bucket, p_key) satisfies every
    // ClusteredDistribution here and the whole chain runs in ONE exchange
    // with per-window re-sorts of a request-scale relation; the aggregate
    // version paid two extra persists and two broadcast-subquery jobs for
    // exchanges that never existed. Keep the windows.
    val order = Window.partitionBy(col("p_bucket"), col("p_key"))
      .orderBy(col("phase"), col("node_id"), col("bucket"), col("key"))
    val probeW = Window.partitionBy(col("p_bucket"), col("p_key"))
    val candidates = arrivals
      .withColumn("arrival", row_number().over(order))
      .withColumn("capped", max(col("arrival")).over(probeW) > CandidateLimit)
      .filter(col("arrival") <= CandidateLimit)

    val meta = probes.select(col("p_bucket"), col("p_key"),
      col("p_version"), col("p_dm"))
    val peerRows = candidates.join(meta, Seq("p_bucket", "p_key"))
      .withColumn("is_local", lit(false))
    val localRows = meta
      .withColumn("node_id", lit(localNode))
      .withColumn("bucket", col("p_bucket"))
      .withColumn("key", col("p_key"))
      .withColumn("expected", lit(true))
      .withColumn("capped", lit(false)) // widened by the probe window below
      .withColumn("is_local", lit(true))

    val cols = Seq("p_bucket", "p_key", "p_version", "p_dm", "node_id",
      "bucket", "key", "expected", "capped", "is_local").map(col)
    val all = localRows.select(cols: _*).unionByName(peerRows.select(cols: _*))
      .withColumn("held",
        residue(5, col("node_id"), col("bucket"), col("key"),
          col("p_version")) < 2)
      .withColumn("state",
        when(col("held"), "Present")
          .when(col("p_dm"), "NotStored")
          .otherwise("Pending"))
      .withColumn("storage",
        when(!col("held"), lit(null))
          .when(residue(2, col("node_id"), col("key")) === 0, "NodeManaged")
          .otherwise("GroupBackend"))
      // peer_copy: a holder-only candidate that does not hold this version
      // under the asked path is dropped (blobs.rs:601-607)
      .withColumn("dropped", !col("is_local") && !col("held") && !col("expected"))

    // HolderPathUnknown: an asked node for which EVERY destination dropped
    val nodeW = Window.partitionBy(col("p_bucket"), col("p_key"), col("node_id"))
    val flagged = all
      .withColumn("node_answered",
        max(when(col("dropped"), 0).otherwise(1)).over(nodeW) === 1)
      .withColumn("path_unknown",
        max(when(col("node_answered"), 0).otherwise(1)).over(probeW) === 1)
      .withColumn("capped",
        max(when(col("capped"), 1).otherwise(0)).over(probeW) === 1)
      .filter(!col("dropped"))

    flagged
      .crossJoin(broadcast(queuedScanFlags(jobs)
        .select(col("skipped").as("q_skipped"),
          col("truncated").as("q_truncated"))))
      .withColumn("complete",
        !col("q_truncated") && col("q_skipped") === 0 && !col("capped") &&
          !col("path_unknown"))
      .select(col("p_bucket"), col("p_key"), col("p_version").as("version_id"),
        col("is_local").as("local"), col("node_id"), col("bucket"), col("key"),
        col("state"), col("storage"), col("q_truncated"), col("q_skipped"),
        col("capped"), col("path_unknown"), col("complete"))
  }

  /** PutBucketReplication validation ladder (reference
    * `api/src/s3/s3_service.rs:300-375` `parse_replication_targets` + the
    * operation's bucket check, `operations/src/s3/put_bucket_replication.rs:122`):
    * the write-side twin of [[replicaTargets]]'s admission rule — it
    * produces the bucket-target config that the location merge consumes.
    *
    * `rules(req_id, bucket, rule_seq, status, dest_arn, dm_status)` — one
    * row per XML rule in document order (`rule_seq`); `dm_status` is the
    * nullable DeleteMarkerReplication status. Per request, in order:
    *
    *  1. WorkspaceSource — a `ws-` bucket cannot be a replication source
    *     (checked before any rule parses);
    *  2. rules with status ≠ Enabled are skipped entirely (no validation);
    *  3. each Enabled rule, in `rule_seq` order, first failure wins:
    *     ArnParse (not `arn:aruna:realm:node:resource`, missing/empty
    *     path, or unknown resource type — all `ArunaArn::parse` /
    *     `ArunaArnType::parse` errors, `core/src/structs/replication.rs:
    *     110-148,317-325`), ArnNotS3 (a well-formed `ch/` ARN), then
    *     RealmMismatch, ArnPrefix (target must name a bucket, not a
    *     prefix), WorkspaceTarget, SelfReplication (same node AND same
    *     bucket — same bucket name on another node is legal);
    *  4. NoEnabledTargets — no rule survived (all disabled);
    *  5. NoSuchBucket — the source bucket is not in the catalog (the
    *     operation's existence read; parse errors outrank it because the
    *     API parses before driving the operation);
    *  6. OK — each admitted rule becomes one config target
    *     `(node_id, target_bucket, replicate_dm)` where `replicate_dm`
    *     is true iff `dm_status` is present and Enabled.
    *
    * Output: OK requests emit one row per admitted rule (verdict "OK");
    * failed requests one row with the failing `rule_seq` (null for
    * request-level arms 1/4/5) and null target columns.
    *
    * Scale: the ARN grammar is pure codegen'd regexp on the rule scan, the
    * request fold is one partial-aggregated groupBy on req_id, and the
    * bucket catalog broadcasts — a config write-path batch never shuffles
    * anything request-scale more than once. */
  def putReplicationVerdicts(buckets: DataFrame, rules: DataFrame,
      localNode: String, localRealm: String): DataFrame = {
    val arnRe = "^arn:aruna:([^:]+):([^:]+):(.+)$"
    val resRe = "^([^/]+)/(.+)$"
    val parsed = rules.filter(col("status") === "Enabled")
      .withColumn("a_whole", regexp_extract(col("dest_arn"), arnRe, 0))
      .withColumn("a_realm", regexp_extract(col("dest_arn"), arnRe, 1))
      .withColumn("a_node", regexp_extract(col("dest_arn"), arnRe, 2))
      .withColumn("a_res", regexp_extract(col("dest_arn"), arnRe, 3))
      .withColumn("a_type", regexp_extract(col("a_res"), resRe, 1))
      .withColumn("a_path", regexp_extract(col("a_res"), resRe, 2))
      .withColumn("t_bucket", regexp_extract(col("a_path"), "^([^/]+)", 1))
      .withColumn("code",
        when(col("a_whole") === "", "ArnParse")
          .when(col("a_type") === "", "ArnParse") // missing or empty path
          .when(!col("a_type").isin("s3", "ch"), "ArnParse")
          .when(col("a_type") === "ch", "ArnNotS3")
          .when(col("a_realm") =!= localRealm, "RealmMismatch")
          .when(col("a_path").contains("/"), "ArnPrefix")
          .when(col("t_bucket").startsWith("ws-"), "WorkspaceTarget")
          .when(col("a_node") === localNode && col("t_bucket") === col("bucket"),
            "SelfReplication"))
    val perReq = parsed.groupBy("req_id", "bucket").agg(
      min(when(col("code").isNotNull, struct(col("rule_seq"), col("code"))))
        .as("first_fail"),
      count(lit(1)).as("n_enabled"))
    val reqs = rules.select("req_id", "bucket").distinct()
      .join(perReq, Seq("req_id", "bucket"), "left")
      .join(broadcast(buckets.select(col("bucket"),
        lit(true).as("bucket_exists"))), Seq("bucket"), "left")
      .withColumn("verdict",
        when(col("bucket").startsWith("ws-"), "WorkspaceSource")
          .when(col("first_fail").isNotNull, col("first_fail.code"))
          .when(col("n_enabled").isNull, "NoEnabledTargets")
          .when(col("bucket_exists").isNull, "NoSuchBucket")
          .otherwise("OK"))
    val nullS = lit(null).cast("string")
    val failed = reqs.filter(col("verdict") =!= "OK")
      .select(col("req_id"), col("bucket"),
        when(col("verdict") === col("first_fail.code"),
          col("first_fail.rule_seq")).as("rule_seq"),
        col("verdict"), nullS.as("node_id"), nullS.as("target_bucket"),
        lit(null).cast("boolean").as("replicate_dm"))
    val accepted = parsed.filter(col("code").isNull)
      .join(broadcast(reqs.filter(col("verdict") === "OK").select("req_id")),
        Seq("req_id"), "left_semi")
      .select(col("req_id"), col("bucket"), col("rule_seq"),
        lit("OK").as("verdict"), col("a_node").as("node_id"),
        col("t_bucket").as("target_bucket"),
        coalesce(col("dm_status") === "Enabled", lit(false)).as("replicate_dm"))
    accepted.unionByName(failed)
  }

  /** Candidate holder nodes n1..nK (the realm's peer set). */
  private def nodeSet(k: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.range(1, k + 1)
      .select(concat(lit("n"), col("id").cast("string")).as("h_node"))
  }
}
