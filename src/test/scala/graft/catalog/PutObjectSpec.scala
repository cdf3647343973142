package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PutObject admission plan (put_object.rs): verdict ladder order,
  * backend-scoped dedup, liveness/generation, quota-config resolution,
  * snapshot eligibility, and the sequential per-group quota fold. */
class PutObjectSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val catalog = Seq(("b1", "g1"), ("b2", "g2"))
    .toDF("bucket", "group_id")

  // k-live: head is a plain version (2 versions); k-dm: head is a marker
  private lazy val versions = Seq(
    ("b1", "k-live", 1L, false), ("b1", "k-live", 2L, false),
    ("b1", "k-dm", 1L, false), ("b1", "k-dm", 2L, true)
  ).toDF("bucket", "key", "version_ord", "is_delete_marker")

  private lazy val blobLoc = Seq(("h-dup", "fs")).toDF("blake3", "backend")

  private def req(id: String, bucket: String = "b1", key: String = "k-new",
      grp: String = "g1", hasBody: Boolean = true, size: Long = 10L,
      clen: Option[Long] = Some(10L), blake3: String = "h-x",
      backend: String = "fs",
      e1a: Option[String] = None, e1d: Option[String] = None,
      e2a: Option[String] = None, e2d: Option[String] = None) =
    (id, bucket, key, grp, hasBody, size, clen, blake3, backend,
      e1a, e1d, e2a, e2d)

  private def run(rows: Seq[(String, String, String, String, Boolean, Long,
      Option[Long], String, String, Option[String], Option[String],
      Option[String], Option[String])],
      ceilings: Seq[(String, Option[Long])] = Seq("g1" -> None, "g2" -> None),
      usage: Seq[(String, Long)] = Seq("g1" -> 0L, "g2" -> 0L)) = {
    val reqs = rows.toDF("req_id", "bucket", "key", "requester_group",
      "has_body", "size", "content_length", "blake3", "backend",
      "exp1_algo", "exp1_digest", "exp2_algo", "exp2_digest")
    PutObject.admissionPlan(spark, reqs, catalog, versions, blobLoc,
      ceilings.toDF("group_id", "ceiling"), usage.toDF("group_id", "base_usage"))
      .collect().map(r => r.getString(0) -> r).toMap
  }

  test("verdict ladder: body, length, checksum order, bucket guard " +
    "(put_object.rs:260-283,284-327,368-387)") {
    val shaOk = md5hex("s:h-x")
    val out = run(Seq(
      // missing body outranks a wrong length AND a bad checksum
      req("r1", hasBody = false, clen = Some(99L), e1a = Some("SHA256"),
        e1d = Some("bad")),
      // incomplete body outranks the bad checksum
      req("r2", clen = Some(99L), e1a = Some("SHA256"), e1d = Some("bad")),
      // expected algo the writer never computed
      req("r3", e1a = Some("CRC64NVME"), e1d = Some("x")),
      // first expected fails first
      req("r4", e1a = Some("SHA256"), e1d = Some("bad"),
        e2a = Some("CRC32"), e2d = Some("bad")),
      // first passes, second fails -> second named
      req("r5", e1a = Some("SHA256"), e1d = Some(shaOk),
        e2a = Some("CRC32"), e2d = Some("bad")),
      // checksum failure outranks the group mismatch
      req("r6", grp = "gX", e1a = Some("SHA256"), e1d = Some("bad")),
      // bucket vanished between admission and txn
      req("r7", bucket = "bX"),
      // caller group disagrees with the record
      req("r8", grp = "gX"),
      // declared length absent -> no length check
      req("r9", clen = None)))
    assert(out("r1").getString(1) == "MissingBody")
    assert(!out("r1").getBoolean(6)) // nothing written -> no rollback
    assert(out("r2").getString(1) == "IncompleteBody")
    assert(out("r2").getBoolean(6)) // written -> rolled back
    assert(out("r3").getString(1) == "MissingExpectedChecksum:CRC64NVME")
    assert(out("r4").getString(1) == "ChecksumMismatch:SHA256")
    assert(out("r5").getString(1) == "ChecksumMismatch:CRC32")
    assert(out("r6").getString(1) == "ChecksumMismatch:SHA256")
    assert(out("r7").getString(1) == "TransactionConflict")
    assert(out("r8").getString(1) == "TransactionConflict")
    assert(out("r9").getString(1) == "Ok")
  }

  test("dedup is backend-scoped; alias queues the duplicate copy " +
    "(put_object.rs:389-436,884-893)") {
    val out = run(Seq(
      req("r1", blake3 = "h-dup", backend = "fs"),  // hit -> alias
      req("r2", blake3 = "h-dup", backend = "s3"),  // same hash, other backend
      req("r3", blake3 = "h-new", backend = "fs"))) // miss
    assert(!out("r1").getBoolean(2) && out("r1").getBoolean(5)) // alias+cleanup
    assert(out("r1").getLong(9) == 0L && out("r1").getLong(10) == 0L) // no stored delta
    assert(out("r2").getBoolean(2) && !out("r2").getBoolean(5))
    assert(out("r3").getBoolean(2))
    assert(out("r3").getLong(9) == 1L && out("r3").getLong(10) == 10L)
  }

  test("liveness + generation: live head, marker head, fresh key " +
    "(put_object.rs:493-541, blob.rs:716-723)") {
    val out = run(Seq(
      req("r1", key = "k-live"), req("r2", key = "k-dm"), req("r3")))
    assert(out("r1").getBoolean(3) && out("r1").getLong(4) == 3L &&
      out("r1").getLong(7) == 0L) // was_live -> no object delta
    assert(!out("r2").getBoolean(3) && out("r2").getLong(4) == 3L &&
      out("r2").getLong(7) == 1L)
    assert(!out("r3").getBoolean(3) && out("r3").getLong(4) == 1L &&
      out("r3").getLong(7) == 1L)
  }

  test("quota fold: at-ceiling passes, sequential commits consume headroom, " +
    "failed puts don't, zero-size and unlimited bypass " +
    "(usage_stats.rs:285-448, put_object.rs:726-771)") {
    val ceilings = Seq("g1" -> Some(100L), "g2" -> None)
    val usage = Seq("g1" -> 80L, "g2" -> 1000000L)
    val out = run(Seq(
      req("r1", size = 15L, clen = Some(15L)),  // 80+15  = 95 <= 100: ok
      req("r2", size = 5L, clen = Some(5L)),    // 95+5   = 100: AT ceiling ok
      req("r3", size = 1L, clen = Some(1L)),    // 100+1 over -> reject
      req("r4", size = 0L, clen = Some(0L)),    // zero bytes never gated
      req("r5", bucket = "b2", grp = "g2", size = 999L, clen = Some(999L))),
      ceilings, usage)
    assert(out("r1").getString(1) == "Ok")
    assert(out("r2").getString(1) == "Ok")
    assert(out("r3").getString(1) == "QuotaExceeded")
    assert(out("r3").getLong(11) == 100L && out("r3").getLong(12) == 101L)
    assert(out("r3").getBoolean(6)) // quota reject rolls the blob back
    assert(out("r4").getString(1) == "Ok")
    assert(out("r5").getString(1) == "Ok") // unlimited group
  }

  test("rejected put does not consume headroom for later puts in the group") {
    val ceilings = Seq("g1" -> Some(100L), "g2" -> None)
    val usage = Seq("g1" -> 80L, "g2" -> 0L)
    val out = run(Seq(
      req("r1", size = 50L, clen = Some(50L)),  // 130 over -> reject
      req("r2", size = 20L, clen = Some(20L))), // 80+20 = 100 -> ok
      ceilings, usage)
    assert(out("r1").getString(1) == "QuotaExceeded")
    assert(out("r2").getString(1) == "Ok")
  }

  test("ceilings: override wins (incl. explicit NULL = unlimited), grace " +
    "scales, default else (realm.rs:230-259)") {
    val groups = Seq("g1", "g2", "g3").toDF("group_id")
    val ovr = Seq(
      ("g1", Some(1000L), Some(150L), true),
      ("g2", Option.empty[Long], Option.empty[Long], true)
    ).toDF("group_id", "quota_bytes", "grace", "has_override")
    val out = PutObject.ceilings(groups, ovr, 2000L, 110L)
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("g1").contains(1500L))  // 1000 * 150 / 100
    assert(out("g2").isEmpty)          // explicit unlimited
    assert(out("g3").contains(2200L))  // default 2000 * 110 / 100
  }

  test("baseUsage: local + eligible snapshots only (usage_stats.rs:377-414)") {
    val local = Seq(("g1", 100L)).toDF("group_id", "logical_bytes")
    val snaps = Seq(
      ("g1", "nd-0", "nd-0", 11L), // local node's own snapshot: skip
      ("g1", "nd-1", "nd-1", 20L), // eligible
      ("g1", "nd-2", "nd-9", 40L), // embedded id disagrees: skip
      ("g1", "nd-3", "nd-3", 80L), // not in active set: skip
      ("g1", "nd-4", "nd-4", 160L) // eligible
    ).toDF("group_id", "key_node", "embedded_node", "logical_bytes")
    val out = PutObject.baseUsage(local, snaps,
      Seq("nd-0", "nd-1", "nd-2", "nd-4"), "nd-0").collect()
    assert(out.length == 1 && out(0).getLong(1) == 280L)
  }
}
