package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Create/abort-side S3 ladders: AbortMultipartUpload
  * (abort_multipart_upload.rs), CreateBucket (create_bucket.rs),
  * CreateMultipartUpload (s3_service.rs:1801-1866 + util.rs), and the
  * PutBucketReplication grammar (s3_service.rs:300-375) with its round-trip
  * into the location merge's bucket-target phase. */
class CreatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val uploads = Seq(
    ("u1", "b1", "k1", "Open"),
    ("u2", "b1", "k2", "Completed"),
    ("u3", "b1", "k3", "Aborted"),
    ("u4", "b2", "k4", "Open")
  ).toDF("upload_id", "bucket", "key", "status")

  private lazy val parts = Seq(
    ("u1", 1, 100L), ("u1", 2, 250L), ("u4", 1, 7L)
  ).toDF("upload_id", "part_number", "size")

  test("abortVerdicts: existence, target-mismatch-before-status, not-open, " +
    "cleanup accounting (abort_multipart_upload.rs:115-151,230-286)") {
    val req = Seq(
      ("u1", "b1", "k1"), // Ok, 2 parts
      ("u2", "b1", "k2"), // UploadNotOpen
      ("u2", "b1", "kX"), // mismatch OUTRANKS not-open
      ("u1", "bX", "k1"), // bucket mismatch
      ("u9", "b1", "k1"), // NoSuchUpload
      ("u4", "b2", "k4")  // Ok, 1 part
    ).toDF("upload_id", "bucket", "key")
    val out = Multipart.abortVerdicts(uploads, parts, req)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out.contains(("u1", "Ok", Some(2L), Some(3L), Some(350L))))
    assert(out.contains(("u4", "Ok", Some(1L), Some(2L), Some(7L))))
    assert(out.exists(r => r._1 == "u2" && r._2 == "UploadNotOpen" && r._3.isEmpty))
    assert(out.contains(("u2", "UploadTargetMismatch", None, None, None)))
    assert(out.contains(("u1", "UploadTargetMismatch", None, None, None)))
    assert(out.contains(("u9", "NoSuchUpload", None, None, None)))
  }

  test("createBucketVerdicts: catalog hit, in-batch first-wins, group usage " +
    "fold (create_bucket.rs:113-127,153-166)") {
    val catalog = Seq(("b1", "g1")).toDF("bucket", "group_id")
    val req = Seq(
      (1, "b1", "gA"), // exists in catalog
      (2, "nb", "gA"), // first create wins
      (3, "nb", "gB"), // same batch, later seq -> already exists
      (4, "n2", "gA")  // unique new
    ).toDF("seq", "bucket", "group_id")
    val out = Creates.createBucketVerdicts(catalog, req)
      .collect().map(r => r.getInt(0) -> ((r.getString(3), r.getLong(4)))).toMap
    assert(out(1) == (("BucketAlreadyExists", 2L))) // gA created nb + n2
    assert(out(2) == (("OK", 2L)))
    assert(out(3) == (("BucketAlreadyExists", 0L))) // gB created nothing
    assert(out(4) == (("OK", 2L)))
  }

  test("createMultipartVerdicts: SSE-first ladder, key sanitation, checksum " +
    "whitelist, hint + group resolution (util.rs:131-196, s3_service.rs:1815-1830)") {
    val req = Seq(
      ("r1", "b", "a/k", true, false, false, null, null, true, "bg", "ug"),
      ("r2", "b", "", false, false, false, null, null, true, "bg", "ug"),
      ("r3", "b", "a/../k", false, false, false, "SHA256", null, true, "bg", "ug"),
      ("r4", "b", "a/k", false, false, false, "MD5", null, true, "bg", "ug"),
      ("r5", "b", "a/k", false, false, false, "SHA1", "COMPOSITE", true, "bg", "ug"),
      ("r6", "b", "a/k", false, false, false, null, "WHATEVER", false, "bg", "ug"),
      ("r7", "b", "a/k", false, false, false, null, null, false, "bg", "ug")
    ).toDF("req_id", "bucket", "key", "sse", "sse_kms", "sse_customer",
      "checksum_algorithm", "checksum_type", "has_bucket_info",
      "bucket_group", "user_group")
    val out = Creates.createMultipartVerdicts(req)
      .collect().map(r => r.getString(0) -> (r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)),
        Option(r.getString(4)))).toMap
    assert(out("r1")._1 == "SseNotSupported")
    assert(out("r2")._1 == "EmptyKey")
    assert(out("r3")._1 == "UnconfinedKey") // key checked before checksum
    assert(out("r4")._1 == "UnsupportedChecksum")
    assert(out("r5") == (("Ok", Some("SHA1"), Some("Composite"), Some("bg"))))
    // type-only hint: FullObject only for literal COMPOSITE; user group
    // when bucket info did not resolve
    assert(out("r6") == (("Ok", None, Some("FullObject"), Some("ug"))))
    assert(out("r7") == (("Ok", None, None, Some("ug")))) // no hint at all
  }

  test("confinedKeyCol ≡ isConfinedRelativePath on the blob.rs matrix " +
    "(native Column twin of the Scala predicate)") {
    val cases = Seq("a/b/c.bin", "/abs/path", "a/../b", "bucket/./object",
      "a//b", ".", "..", "a/bc", "a/bl", "", "...", "./a",
      "a/.", "././.", "x", "a/..", "../a", "a/b/", "", "a.b/c..d")
    val got = cases.toDF("k")
      .select(col("k"), graft.functions.Paths.confinedKeyCol(col("k")).as("c"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { k =>
      assert(got(k) == graft.functions.Paths.isConfinedRelativePath(k),
        s"mismatch for '$k'")
    }
  }

  test("putReplicationVerdicts: first-fail rule order + admitted rows round-" +
    "trip as the location merge's bucket-target phase (s3_service.rs:300-375)") {
    val buckets = Seq(("b1", "g1"), ("b2", "g1")).toDF("bucket", "group_id")
    val rules = Seq(
      // q1: rule 1 disabled+bad (skipped), rule 2 admits, rule 3 admits w/ dm
      ("q1", "b1", 1, "Disabled", "garbage", null),
      ("q1", "b1", 2, "Enabled", "arn:aruna:rlmA:n7:s3/tb1", null),
      ("q1", "b1", 3, "Enabled", "arn:aruna:rlmA:n8:s3/tb2", "Enabled"),
      // q2: first enabled failure (seq 2) wins over the later one (seq 3)
      ("q2", "b1", 1, "Enabled", "arn:aruna:rlmA:n7:s3/tb1", null),
      ("q2", "b1", 2, "Enabled", "arn:aruna:rlmB:n7:s3/tb1", null),
      ("q2", "b1", 3, "Enabled", "garbage", null),
      // q3: all disabled
      ("q3", "b1", 1, "Disabled", "arn:aruna:rlmA:n7:s3/tb1", null),
      // q4: ws source outranks everything
      ("q4", "ws-x", 1, "Enabled", "garbage", null),
      // q5: unknown source bucket, rules clean
      ("q5", "nope", 1, "Enabled", "arn:aruna:rlmA:n7:s3/tb1", null),
      // q6: same bucket on ANOTHER node is legal; same node+bucket is not
      ("q6", "b2", 1, "Enabled", "arn:aruna:rlmA:n9:s3/b2", null),
      ("q7", "b2", 1, "Enabled", "arn:aruna:rlmA:n0:s3/b2", null)
    ).toDF("req_id", "bucket", "rule_seq", "status", "dest_arn", "dm_status")
    val out = Replication.putReplicationVerdicts(buckets, rules, "n0", "rlmA")
    val rows = out.collect().map(r => (r.getString(0), Option(r.get(2)),
      r.getString(3), Option(r.getString(4)),
      Option(r.get(6)).map(_.asInstanceOf[Boolean]))).toList
    assert(rows.count(_._1 == "q1") == 2) // two admitted targets
    assert(rows.filter(_._1 == "q1").map(_._5).toSet == Set(Some(false), Some(true)))
    assert(rows.filter(_._1 == "q2") ==
      List(("q2", Some(2), "RealmMismatch", None, None)))
    assert(rows.contains(("q3", None, "NoEnabledTargets", None, None)))
    assert(rows.contains(("q4", None, "WorkspaceSource", None, None)))
    assert(rows.contains(("q5", None, "NoSuchBucket", None, None)))
    assert(rows.exists(r => r._1 == "q6" && r._3 == "OK"))
    assert(rows.contains(("q7", Some(1), "SelfReplication", None, None)))

    // round-trip: the admitted config IS rs2's phase-2 input shape
    val cfg = out.filter(col("verdict") === "OK")
      .select(col("bucket").as("cfg_bucket"), col("node_id").as("target_node"),
        col("target_bucket").as("cfg_target_bucket"),
        col("replicate_dm").as("cfg_markers"))
    val probes = Seq(("b1", "pk", "v1", false, "hh"))
      .toDF("p_bucket", "p_key", "p_version", "p_dm", "p_hash")
    val rels = Seq.empty[(String, String, String, String, String, String,
      String, String, Boolean)].toDF("mode", "state", "source_node",
      "target_node", "source_bucket", "target_bucket", "source_prefix",
      "target_prefix", "replicate_deletes")
    val jobs = Seq(("jk", true, "zz", false, "Object", "", "none", "v0", "n5"))
      .toDF("job_key", "decodable", "j_bucket", "j_markers", "j_kind",
        "j_prefix", "j_key", "j_version", "j_node")
    val loc = Replication.blobLocations(probes, rels, cfg, jobs, "n0")
      .collect()
    // q1's two admitted targets answer the b1 probe as non-local
    // destinations (plus the local row)
    val nodes = loc.map(_.getString(4)).toSet
    assert(Set("n7", "n8").subsetOf(nodes) && nodes.contains("n0"))
  }

  test("createGroupVerdicts: override cap, default cap, zero cap, unlimited, " +
    "cap-bounded scan (create_group.rs:81-116,354-362)") {
    val owned = (1 to 5).map(i => ("u1", s"g$i")) ++
      Seq(("u2", "gA"), ("u3", "gB"), ("u4", "gC"), ("u4", "gD"))
    val caps = Seq(("u1", 3L), ("u2", 0L), ("u3", 10L))
      .toDF("user_id", "max_groups")
    val reqs = Seq(("r1", "u1"), ("r2", "u2"), ("r3", "u3"),
      ("r4", "u4"), ("r5", "u9")).toDF("req_id", "user_id")
    val out = Creates.createGroupVerdicts(reqs,
      owned.toDF("user_id", "group_id"), caps, Some(2L))
      .collect().map(r => r.getString(0) ->
        ((r.getString(2), Option(r.get(3)), r.getLong(4)))).toMap
    // u1: override cap 3 < 5 owned -> reject, scan stopped at the cap
    assert(out("r1") == (("OwnedGroupLimitReached", Some(3L), 3L)))
    // u2: zero cap rejects before any read
    assert(out("r2") == (("OwnedGroupLimitReached", Some(0L), 0L)))
    // u3: override 10, owns 1 -> Ok
    assert(out("r3") == (("Ok", Some(10L), 1L)))
    // u4: default cap 2, owns 2 -> full
    assert(out("r4") == (("OwnedGroupLimitReached", Some(2L), 2L)))
    // u9: owns nothing
    assert(out("r5") == (("Ok", Some(2L), 0L)))
  }

  test("createGroupVerdicts with no default cap is unlimited") {
    val owned = (1 to 50).map(i => ("u1", s"g$i")).toDF("user_id", "group_id")
    val caps = Seq.empty[(String, Long)].toDF("user_id", "max_groups")
    val out = Creates.createGroupVerdicts(
      Seq(("r1", "u1")).toDF("req_id", "user_id"), owned, caps, None)
      .collect().head
    assert(out.getString(2) == "Ok" && out.isNullAt(3) && out.getLong(4) == 50L)
  }

  test("createGroupVerdicts plan: owned-group index probed, never " +
    "broadcast whole") {
    val owned = spark.range(100000).selectExpr(
      "concat('u', id % 5000) AS user_id", "concat('g', id) AS group_id")
    val caps = Seq(("u1", 3L)).toDF("user_id", "max_groups")
    val out = Creates.createGroupVerdicts(
      Seq(("r1", "u1"), ("r2", "u2")).toDF("req_id", "user_id"),
      owned, caps, Some(100L))
    assert(out.collect().length == 2)
    val bad = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("BroadcastExchange") &&
        p.collectLeaves().exists(_.nodeName.contains("Range")) &&
        !p.toString.contains("Join") => p
    }
    assert(bad.isEmpty,
      s"owned-group index broadcast without a probe join:\n${bad.mkString}")
  }
}
