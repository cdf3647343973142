package graft.catalog

import graft.SparkSpec

class WorkflowOutputsSpec extends SparkSpec {
  import spark.implicits._

  test("expand: prefix rules, match cap, stray path fails the whole selection, trailing-slash trim") {
    def ns: String = null
    val sels = Seq(
      ("w1", "/out/*", true, "/out", "b", "res/w1/"),   // ok, key trimmed
      ("w2", "/out/*", true, ns, "b", "res/w2"),        // missing prefix
      ("w3", "/out/*", true, "/out", "b", "res/w3"),    // one stray -> all fail
      ("w4", "/out/*", true, "/out", "b", "res/w4"),    // over cap (3 files, cap 2)
      ("w5", "/out/f5", false, ns, "b", "res/f5"))      // literal passthrough
      .toDF("sel_id", "container_path", "wildcard", "path_prefix",
        "dest_bucket", "dest_key")
    val matches = Seq(
      ("w1", "/out/a/f1"), ("w1", "/out/f2"),
      ("w2", "/out/f1"),
      ("w3", "/out/f1"), ("w3", "/elsewhere/f2"),
      ("w4", "/out/f1"), ("w4", "/out/f2"), ("w4", "/out/f3"))
      .toDF("sel_id", "path")
    val got = WorkflowOutputs.expand(sels, matches, maxMatches = 2L)
      .collect().groupBy(_.getString(0))
    val w1 = got("w1").sortBy(r => Option(r.getString(1)).getOrElse(""))
    assert(w1.map(r => (r.getString(1), r.getString(3))).toSeq == Seq(
      ("/out/a/f1", "res/w1/a/f1"), ("/out/f2", "res/w1/f2")), w1.toSeq)
    assert(got("w2").map(_.getString(4)).toSeq == Seq("missing_prefix"))
    assert(got("w3").map(_.getString(4)).toSeq == Seq("outside_prefix"))
    assert(got("w4").map(_.getString(4)).toSeq == Seq("too_many_matches"))
    assert(got("w5").head.getString(3) == "res/f5")
  }

  test("merge: export wins its key, first-wins dedup, overflow trailer") {
    val inv = Seq(("b", "k1", 10L, 1L), ("b", "k2", 20L, 2L))
      .toDF("bucket", "key", "size", "seq")
    val cap = Seq(
      ("b", "k2", "/out/f2", 21L, 100L),     // beats inventory's k2
      ("b", "k3", "/out/f3", 30L, 101L),
      ("b", "k3", "/dup/f3", 30L, 102L))     // later duplicate loses
      .toDF("bucket", "key", "container_path", "size", "seq")
    val got = WorkflowOutputs.merge(inv, cap, maxObjects = 3L)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("k1").getAs[String]("source") == "inventory")
    assert(got("k2").getAs[String]("source") == "export" &&
      got("k2").getAs[Long]("size") == 21L)
    assert(got("k3").getAs[String]("container_path") == "/out/f3")
    assert(got.size == 3 && !got("k1").getAs[Boolean]("manifest_overflow"))
    val over = WorkflowOutputs.merge(inv, cap, maxObjects = 2L)
      .collect()
    assert(over.forall(_.getAs[Boolean]("manifest_overflow")))
  }

  test("staging reference: idempotent no-op needs source AND all four metadata fields") {
    val reqs = Seq(
      ("b", "k1", "s1", 10L, "ct", "e1", 100L, true, true),  // unchanged
      ("b", "k2", "s1", 10L, "ct", "e1", 100L, true, true),  // etag differs
      ("b", "k3", "s1", 10L, "ct", "e1", 100L, true, true),  // over deleted head
      ("b", "k4", "s1", 10L, "ct", "e1", 100L, false, true), // bucket guard
      ("b", "k5", "s1", 10L, "ct", "e1", 100L, true, false)) // connector
      .toDF("bucket", "key", "src_sig", "content_length", "content_type",
        "etag", "last_modified", "bucket_ok", "connector_ok")
    val ptrs = Seq(("b", "k1", 1L), ("b", "k2", 1L), ("b", "k3", 1L))
      .toDF("bucket", "key", "ptr_version")
    val vers = Seq(
      ("b", "k1", 1L, "reference", "s1", 10L, "ct", "e1", 100L),
      ("b", "k2", 1L, "reference", "s1", 10L, "ct", "eX", 100L),
      ("b", "k3", 1L, "deleted", "s1", 10L, "ct", "e1", 100L))
      .toDF("bucket", "key", "version_id", "state", "src_sig",
        "content_length", "content_type", "etag", "last_modified")
    val got = StagingReference.materialize(reqs, ptrs, vers)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("k1").getAs[String]("verdict") == "unchanged" &&
      !got("k1").getAs[Boolean]("changed"))
    // changed etag -> new version over a LIVE head: objects delta 0
    val k2 = got("k2")
    assert(k2.getAs[String]("verdict") == "created" &&
      k2.getAs[Long]("objects_delta") == 0L &&
      k2.getAs[Long]("referenced_bytes_delta") == 10L, k2.toString)
    // previous head deleted -> objects +1
    assert(got("k3").getAs[Long]("objects_delta") == 1L)
    assert(got("k4").getAs[String]("verdict") == "bucket_guard")
    assert(got("k5").getAs[String]("verdict") == "connector_changed")
  }

  test("export plan: omission ladder, quad-confirmed path choice, safe-zip + reserved names, dup detection") {
    def ns: String = null
    val ents = Seq(
      // external: no exact URL, no hash
      ("e1", true, ns, false, ns, "docs/a", "docs/a", ns),
      // foreign exact realm, hash bound to a foreign realm -> unsupported
      ("e2", true, "rX", true, "rX", "docs/b", "docs/b", ns),
      // raw path NOT confirmed by quads -> falls back to qp1
      ("e3", true, "r1", false, ns, "raw/p", "quad/p", ns),
      // confirmed raw with ./ prefix -> stripped explicit
      ("e4", true, "r1", false, ns, "./d/e.txt", "./d/e.txt", ns),
      // reserved name -> synthesized
      ("e5", true, "r1", false, ns, "ro-crate-metadata.json",
        "ro-crate-metadata.json", ns),
      // two entities claim one explicit path
      ("e6", true, "r1", false, ns, "dup/p", "dup/p", ns),
      ("e7", true, "r1", false, ns, "dup/p", "dup/p", ns),
      ("e8", false, "r1", false, ns, "x", "x", ns))
      .map { case (id, f, ex, h, hr, rp, q1, q2) =>
        (id, f, ex, h, hr, rp, q1, q2, "ab" * 32) }
      .toDF("ent_id", "is_file", "exact_realm", "has_hash", "hash_realm",
        "raw_path", "qp1", "qp2", "hash_hex")
    val got = ExportPlan.plan(ents, "r1", 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("e1").getAs[String]("verdict") == "omitted_external")
    assert(got("e2").getAs[String]("verdict") == "omitted_unsupported")
    val e3 = got("e3")
    assert(e3.getAs[String]("verdict") == "planned" &&
      e3.getAs[String]("local_path") == "quad/p" &&
      e3.getAs[String]("zip_path") == "quad/p", e3.toString)
    assert(got("e4").getAs[String]("zip_path") == "d/e.txt")
    val e5 = got("e5")
    assert(e5.getAs[String]("verdict") == "planned" &&
      e5.getAs[String]("zip_path") == null &&
      e5.getAs[Boolean]("path_synthesized"), e5.toString)
    assert(got("e6").getAs[String]("verdict") == "dup_path" &&
      got("e7").getAs[String]("verdict") == "dup_path")
    assert(got("e8").getAs[String]("verdict") == "not_file")
  }
}
