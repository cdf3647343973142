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
