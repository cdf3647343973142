package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UploadPart admission ladder (upload_part.rs). */
class UploadPartSpec extends SparkSpec {
  import spark.implicits._

  private lazy val uploads = Seq(
    ("u1", "b1", "k1", "Open", "be-1"),
    ("u2", "b1", "k2", "Completed", "be-2"),
    ("u3", "b2", "k3", "Open", "be-0")
  ).toDF("upload_id", "bucket", "key", "status", "backend")

  private lazy val parts = Seq(("u1", 2, 500L))
    .toDF("upload_id", "part_number", "size")

  private def run(rows: Seq[(String, String, String, String, Int, Boolean,
      Boolean, Boolean, Option[Long], Long, Option[String], Option[String],
      Option[String], Option[String], Option[String])]) =
    UploadPart.verdicts(rows.toDF("req_id", "upload_id", "bucket", "key",
      "part_number", "has_body", "stream_failed", "blob_error",
      "content_length", "size", "exp1_algo", "exp1_digest", "exp2_algo",
      "exp2_digest", "concurrent_status"), uploads, parts)
      .collect().map(r => r.getString(0) -> r).toMap

  private val none = Option.empty[String]
  private def base(id: String, up: String, b: String, k: String, pn: Int) =
    (id, up, b, k, pn, true, false, false, Option.empty[Long], 100L,
      none, none, none, none, none)

  test("pre-write ladder: NoSuchUpload, target-mismatch-before-status, " +
    "not-open, missing body — none roll back (upload_part.rs:139-166)") {
    val out = run(Seq(
      base("r1", "u9", "b1", "k1", 1),
      base("r2", "u2", "bX", "k2", 1),      // mismatch outranks not-open
      base("r3", "u2", "b1", "k2", 1),
      base("r4", "u1", "b1", "k1", 1).copy(_6 = false)))
    assert(out("r1").getString(1) == "NoSuchUpload")
    assert(out("r2").getString(1) == "UploadTargetMismatch")
    assert(out("r3").getString(1) == "UploadNotOpen")
    assert(out("r4").getString(1) == "MissingBody")
    assert(out.values.forall(!_.getBoolean(2)), "pre-write arms never roll back")
  }

  test("post-write ladder rolls back: stream vs server fault distinct, " +
    "content-length, ordered checksum walk (upload_part.rs:186-223)") {
    val shaOf = (id: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s"s:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = run(Seq(
      base("r1", "u1", "b1", "k1", 1).copy(_7 = true),  // stream fault
      base("r2", "u1", "b1", "k1", 1).copy(_8 = true),  // server fault
      base("r3", "u1", "b1", "k1", 1).copy(_9 = Some(99L)), // length mismatch
      base("r4", "u1", "b1", "k1", 1)
        .copy(_11 = Some("CRC64NVME"), _12 = Some("x")), // never computed
      base("r5", "u1", "b1", "k1", 1)
        .copy(_11 = Some("SHA256"), _12 = Some("wrong")),
      base("r6", "u1", "b1", "k1", 1)                    // exp1 ok, exp2 bad
        .copy(_11 = Some("SHA256"), _12 = Some(shaOf("r6")),
          _13 = Some("CRC32"), _14 = Some("bad"))))
    assert(out("r1").getString(1) == "WriteFailed")
    assert(out("r2").getString(1) == "BlobWriteFailed")
    assert(out("r3").getString(1) == "IncompleteBody")
    assert(out("r4").getString(1) == "MissingExpectedChecksum:CRC64NVME")
    assert(out("r5").getString(1) == "ChecksumMismatch:SHA256")
    assert(out("r6").getString(1) == "ChecksumMismatch:CRC32")
    assert(out.values.forall(_.getBoolean(2)), "every post-write arm rolls back")
  }

  test("transactional re-read: same verdict strings, now WITH rollback " +
    "(upload_part.rs:328-345)") {
    val out = run(Seq(
      base("r1", "u1", "b1", "k1", 1).copy(_15 = Some("Gone")),
      base("r2", "u1", "b1", "k1", 1).copy(_15 = Some("Aborted"))))
    assert(out("r1").getString(1) == "NoSuchUpload" && out("r1").getBoolean(2))
    assert(out("r2").getString(1) == "UploadNotOpen" && out("r2").getBoolean(2))
  }

  test("Ok: replaced part cleans up its old blob, backend follows the " +
    "upload record's pin (upload_part.rs:361-431, part_follows_pin)") {
    val out = run(Seq(
      base("r1", "u1", "b1", "k1", 2), // replaces the existing (u1,2)
      base("r2", "u1", "b1", "k1", 3), // fresh part number
      base("r3", "u3", "b2", "k3", 1)))
    assert(out("r1").getString(1) == "Ok" && out("r1").getBoolean(3) &&
      out("r1").getLong(4) == 500L)
    assert(out("r2").getString(1) == "Ok" && !out("r2").getBoolean(3) &&
      out("r2").isNullAt(4))
    assert(out("r3").getString(6) == "be-0")
    assert(out("r1").getLong(5) == 100L)
  }

  test("plan: upload/part keyspaces probed, never broadcast whole") {
    val bigUploads = spark.range(100000).selectExpr(
      "concat('u', id) AS upload_id", "'b1' AS bucket",
      "concat('k', id) AS key", "'Open' AS status", "'be-0' AS backend")
    val bigParts = spark.range(100000).selectExpr(
      "concat('u', id % 20000) AS upload_id",
      "CAST(id % 5 + 1 AS INT) AS part_number", "id AS size")
    val reqs = Seq(base("r1", "u7", "b1", "k7", 1)).toDF("req_id",
      "upload_id", "bucket", "key", "part_number", "has_body",
      "stream_failed", "blob_error", "content_length", "size", "exp1_algo",
      "exp1_digest", "exp2_algo", "exp2_digest", "concurrent_status")
    val out = UploadPart.verdicts(reqs, bigUploads, bigParts)
    assert(out.collect().length == 1)
    val bad = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("BroadcastExchange") &&
        p.collectLeaves().exists(_.nodeName.contains("Range")) &&
        !p.toString.contains("Join") => p
    }
    assert(bad.isEmpty,
      s"upload keyspace broadcast without a probe join:\n${bad.mkString}")
  }
}
