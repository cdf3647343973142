package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class IncomingReplicationSpec extends SparkSpec {
  import spark.implicits._

  private def man(rows: (String, String, Long, String, Long, String,
      Option[String], String, String, String)*): DataFrame =
    rows.toDF("bucket", "key", "version_id", "kind", "hop_count", "realm",
      "writer_realm", "hash", "ref_sig", "route_backend")

  private val noVersions = Seq.empty[(String, String, Long, String, String,
    String, Long)].toDF("bucket", "key", "version_id", "state", "hash",
    "ref_sig", "ref_len")

  test("negotiate: rejection precedence and the create-before-permissions bucket rule") {
    val m = man(
      ("b1", "k1", 1L, "materialized", 5L, "r1", None, "h1", "s1", "be0"),
      ("b1", "k2", 1L, "materialized", 0L, "rX", None, "h1", "s1", "be0"),
      ("b1", "k3", 1L, "materialized", 0L, "r1", Some("rX"), "h1", "s1", "be0"),
      ("bNew", "k4", 1L, "materialized", 0L, "r1", Some("r1"), "h1", "s1", "be0"),
      ("bNoW", "k5", 1L, "materialized", 0L, "r1", None, "h1", "s1", "be0"))
    val buckets = Seq("b1", "bNoW").map(Tuple1(_)).toDF("bucket")
    val perms = Seq(("b1", true, true), ("bNew", true, true),
      ("bNoW", false, true)).toDF("bucket", "can_write", "writer_ok")
    val locs = Seq(("h1", "be0", 10L)).toDF("hash", "backend", "size")
    val bks = Seq(("be0", false)).toDF("backend", "full")
    val got = IncomingReplication
      .negotiate(m, buckets, perms, noVersions, locs, bks, "r1")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("k1").getAs[String]("reason") == "hop_limit")
    assert(got("k2").getAs[String]("reason") == "realm_mismatch")
    assert(got("k3").getAs[String]("reason") == "realm_mismatch")
    // a missing bucket is created on first touch even when the permission
    // check later rejects; hop/realm rejections never reach the create
    assert(got("k4").getAs[String]("verdict") == "need_version_only" &&
      got("k4").getAs[Boolean]("bucket_created"))
    assert(got("k5").getAs[String]("reason") == "write_permission" &&
      !got("k5").getAs[Boolean]("bucket_created"))
  }

  test("negotiate: short-circuits, adopt-vs-need-bytes, full backend only blocks needed bytes") {
    val m = man(
      // same blob hash already there -> already, even on the FULL backend
      ("b1", "k1", 1L, "materialized", 0L, "r1", None, "hSame", "s1", "beF"),
      // replacing a different materialized version, local copy adoptable
      ("b1", "k2", 2L, "materialized", 0L, "r1", None, "hLoc", "s1", "be0"),
      // bytes needed, backend full -> rejected
      ("b1", "k3", 3L, "materialized", 0L, "r1", None, "hNew", "s1", "beF"),
      // bytes needed, backend ok
      ("b1", "k4", 4L, "materialized", 0L, "r1", None, "hNew", "s1", "be0"),
      // identical reference vs differing reference
      ("b1", "k5", 5L, "reference", 0L, "r1", None, "h0", "sSame", "be0"),
      ("b1", "k6", 6L, "reference", 0L, "r1", None, "h0", "sDiff", "be0"),
      // delete marker over a deleted version vs over a materialized one
      ("b1", "k7", 7L, "delete_marker", 0L, "r1", None, "h0", "s1", "be0"),
      ("b1", "k8", 8L, "delete_marker", 0L, "r1", None, "h0", "s1", "be0"))
    val versions = Seq(
      ("b1", "k1", 1L, "materialized", "hSame", "s1", 0L),
      ("b1", "k2", 2L, "materialized", "hOld", "s1", 0L),
      ("b1", "k5", 5L, "reference", "hX", "sSame", 70L),
      ("b1", "k6", 6L, "reference", "hX", "sDiff2", 80L),
      ("b1", "k7", 7L, "deleted", "hX", "s1", 0L),
      ("b1", "k8", 8L, "materialized", "hOld", "s1", 0L))
      .toDF("bucket", "key", "version_id", "state", "hash", "ref_sig",
        "ref_len")
    val buckets = Seq(Tuple1("b1")).toDF("bucket")
    val perms = Seq(("b1", true, true)).toDF("bucket", "can_write",
      "writer_ok")
    val locs = Seq(("hLoc", "be0", 11L), ("hOld", "be1", 42L))
      .toDF("hash", "backend", "size")
    val bks = Seq(("be0", false), ("beF", true)).toDF("backend", "full")
    val got = IncomingReplication
      .negotiate(m, buckets, perms, versions, locs, bks, "r1")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("k1").getAs[String]("verdict") == "already_replicated")
    val k2 = got("k2")
    assert(k2.getAs[String]("verdict") == "need_version_only" &&
      k2.getAs[Long]("replaced_logical_bytes") == 42L, k2.toString)
    assert(got("k3").getAs[String]("reason") == "backend_full")
    assert(got("k4").getAs[String]("verdict") == "need_blob_and_version")
    assert(got("k5").getAs[String]("verdict") == "already_replicated")
    val k6 = got("k6")
    assert(k6.getAs[String]("verdict") == "need_version_only" &&
      k6.getAs[Long]("replaced_logical_bytes") == 80L, k6.toString)
    assert(got("k7").getAs[String]("verdict") == "already_replicated")
    assert(got("k8").getAs[String]("verdict") == "need_version_only" &&
      got("k8").getAs[Long]("replaced_logical_bytes") == 42L)
  }

  test("headTransition: generation ladder, equal advances, liveness delta") {
    val applies = Seq(
      ("b", "k1", 5L, Some(3L), "materialized", false), // not current
      ("b", "k2", 5L, None, "materialized", true),      // missing gen
      ("b", "k3", 5L, Some(3L), "materialized", true),  // no pointer
      ("b", "k4", 5L, Some(3L), "materialized", true),  // beats (2, 9)
      ("b", "k5", 5L, Some(3L), "delete_marker", true), // EQUAL advances
      ("b", "k6", 5L, Some(3L), "materialized", true))  // loses to (3, 7)
      .map { case (b, k, v, g, kd, c) =>
        (b, k, v, g.map(Long.box).orNull.asInstanceOf[java.lang.Long], kd, c)
      }
      .toDF("bucket", "key", "version_id", "generation", "kind",
        "current_version")
    val pointers = Seq(("b", "k4", 9L, 2L), ("b", "k5", 5L, 3L),
      ("b", "k6", 7L, 3L)).toDF("bucket", "key", "ptr_version",
      "ptr_generation")
    val cur = Seq(("b", "k4", 9L, "materialized"), ("b", "k5", 5L, "deleted"),
      ("b", "k6", 7L, "materialized"))
      .toDF("bucket", "key", "version_id", "state")
    val got = IncomingReplication.headTransition(applies, pointers, cur)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(got("k1").getAs[String]("outcome") == "not_current")
    assert(got("k2").getAs[String]("outcome") == "missing_generation")
    val k3 = got("k3")
    assert(k3.getAs[String]("outcome") == "pointer_set" &&
      !k3.getAs[Boolean]("previous_live") &&
      k3.getAs[Long]("object_delta") == 1L, k3.toString)
    val k4 = got("k4")
    assert(k4.getAs[String]("outcome") == "pointer_advanced" &&
      k4.getAs[Boolean]("previous_live") &&
      k4.getAs[Long]("object_delta") == 0L, k4.toString)
    // equal (generation, version) still advances; marker over deleted: 0-0
    val k5 = got("k5")
    assert(k5.getAs[String]("outcome") == "pointer_advanced" &&
      k5.getAs[Long]("object_delta") == 0L && !k5.getAs[Boolean]("next_live"),
      k5.toString)
    assert(got("k6").getAs[String]("outcome") == "pointer_kept" &&
      !got("k6").getAs[Boolean]("pointer_written"))
  }
}
