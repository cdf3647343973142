package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Point reads + dashboard predicate (get_user.rs, get_group.rs,
  * get_realm_config.rs, dashboard.rs). */
class ReadsSpec extends SparkSpec {
  import spark.implicits._

  test("getUsers: auth outranks parse outranks read (get_user.rs:90-168)") {
    val users = Seq(("u1", "alice", 2L)).toDF("user_id", "name", "n_subjects")
    val out = Reads.getUsers(Seq(
      ("r1", "u1", false, false), // denied: auth first, parse never runs
      ("r2", "uX", true, false),
      ("r3", "uX", true, true),
      ("r4", "u1", true, true))
      .toDF("req_id", "user_id", "authorized", "id_parses"), users)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "Unauthorized")
    assert(out("r2").getString(1) == "InvalidUserId")
    assert(out("r3").getString(1) == "UserNotFound")
    assert(out("r4").getString(1) == "Ok" &&
      out("r4").getString(2) == "alice" && out("r4").getLong(3) == 2L)
  }

  test("getGroups: GroupNotFound vs the distinct AuthDocNotFound " +
    "inconsistency (get_group.rs:48-77)") {
    val groups = Seq(("g1", "one"), ("g2", "two")).toDF("group_id", "name")
    val auth = Seq(("g1", 3L)).toDF("group_id", "n_roles")
    val out = Reads.getGroups(
      Seq(("r1", "g1"), ("r2", "g2"), ("r3", "gX"))
        .toDF("req_id", "group_id"), groups, auth)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "Ok" && out("r1").getLong(3) == 3L)
    assert(out("r2").getString(1) == "AuthDocNotFound")
    assert(out("r3").getString(1) == "GroupNotFound")
  }

  test("getRealmConfigs point read (get_realm_config.rs:73-96)") {
    val cfg = Seq(("r-1", "main", 3L)).toDF("realm_id", "description", "n_nodes")
    val out = Reads.getRealmConfigs(
      Seq(("q1", "r-1"), ("q2", "r-9")).toDF("req_id", "realm_id"), cfg)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("q1").getString(1) == "Ok" && out("q1").getString(2) == "main")
    assert(out("q2").getString(1) == "DocumentNotFound")
  }

  test("docReads asymmetry: absent realm auth is Ok(None), absent user doc " +
    "is NotFound (read_realm_authorization.rs vs read_user_document.rs)") {
    val ra = Seq(("rm-1", 3L)).toDF("key", "n_roles")
    val users = Seq(("u1", "alice")).toDF("key", "name")
    val out = Reads.docReads(Seq(
      ("r1", "realm_auth", "rm-1"), ("r2", "realm_auth", "rm-9"),
      ("r3", "user_doc", "u1"), ("r4", "user_doc", "u9"))
      .toDF("req_id", "op", "key"), ra, users)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(2) == "Ok" && out("r1").getBoolean(3) &&
      out("r1").getLong(4) == 3L)
    assert(out("r2").getString(2) == "Ok" && !out("r2").getBoolean(3))
    assert(out("r3").getString(2) == "Ok" && out("r3").getString(5) == "alice")
    assert(out("r4").getString(2) == "NotFound")
  }

  test("blobPermissionPaths: candidates sort by (permission_path, " +
    "version_id); alias-less blobs keep an Ok empty row " +
    "(resolve_blob_permission_paths.rs:70-79)") {
    val idx = Seq(
      ("b1", "/p/z", "002"), ("b1", "/p/a", "009"), ("b1", "/p/a", "001"))
      .toDF("blake3", "permission_path", "version_id")
    val out = Reads.blobPermissionPaths(
      Seq(("r1", "b1"), ("r2", "bX")).toDF("req_id", "blake3"), idx)
      .collect().map(r => (r.getString(0), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3))))
    val r1 = out.filter(_._1 == "r1").sortBy(_._2.get.asInstanceOf[Int])
    assert(r1.map(t => (t._3.get, t._4.get)) ===
      Seq(("/p/a", "001"), ("/p/a", "009"), ("/p/z", "002")))
    assert(out.filter(_._1 == "r2") ===
      Seq(("r2", None, None, None)))
  }

  test("dashboardNotify: exactly the ten relevant kinds notify; watch/node " +
    "traffic never does (dashboard.rs:23-39 target_filtering)") {
    assert(Reads.DashboardKinds.size == 10)
    val relevant = Reads.DashboardKinds.map(k => (1L, k))
    val ignored = Seq("WatchInterest", "WatchSubscription", "NodeInfo")
      .map(k => (2L, k))
    val mixed = Seq((3L, "NodeInfo"), (3L, "User"))
    val out = Reads.dashboardNotify(
      (relevant ++ ignored ++ mixed).toDF("batch_id", "target_kind"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(out(1L) == ((true, 10L)))
    assert(out(2L) == ((false, 0L)))
    assert(out(3L) == ((true, 1L)))
  }
}
