package graft.catalog

import graft.SparkSpec

/** Group role/membership admin ladders (add/remove_group_role,
  * add/remove_user_to/from_group). */
class GroupAdminSpec extends SparkSpec {
  import spark.implicits._

  private val groups = Seq("G1", "G2").toDF("group_id")
  private val authDocs = Seq("G1").toDF("group_id") // G2: record, no doc
  private val authRoles = Seq(
    ("G1", "r-admin", "admin"), ("G1", "r-dev", "dev"))
    .toDF("group_id", "role_id", "role_name")
  private val assignments = Seq(
    ("G1", "r-admin", "alice"),
    ("G1", "r-dev", "alice"), ("G1", "r-dev", "bob"))
    .toDF("group_id", "role_id", "user_id")
  private val noReducer = Seq(("x", "x")).toDF("group_id", "stored_target")
    .filter("false")

  private def req(id: String, op: String, grp: String = "G1",
      user: String = "bob", actor: String = "root", auth: Boolean = true,
      roleName: String = "nr", roleId: String = "r-dev",
      hasList: Boolean = false) =
    (id, op, grp, "rlm", user, actor, auth, roleName, roleId, hasList)

  private def run(rows: Seq[(String, String, String, String, String,
      String, Boolean, String, String, Boolean)],
      lists: Seq[(String, String)] = Nil,
      users: Seq[(String, String)] = Nil,
      perms: Seq[(String, String)] = Nil) =
    GroupAdmin.decide(
      rows.toDF("req_id", "op", "group_id", "realm_id", "user_id",
        "actor_id", "authorized", "role_name", "role_id", "has_role_list"),
      lists.toDF("req_id", "role_id"), users.toDF("req_id", "user_id"),
      perms.toDF("req_id", "permission"), groups, authDocs, authRoles,
      assignments, noReducer)
      .collect().map(r => r.getString(0) -> r).toMap

  test("add_role: validate BEFORE auth; reserved trims; wrong-realm nil; " +
    "public non-READ; missing doc is GroupNotFound (add_group_role.rs)") {
    val out = run(Seq(
      req("r1", "add_role", roleName = " user ", auth = false), // validate first
      req("r2", "add_role", roleName = "ok2"),
      req("r3", "add_role", roleName = "ok3"),
      req("r4", "add_role", roleName = "ok4"),
      req("r5", "add_role", grp = "G2", roleName = "ok5")),
      users = Seq(("r2", "nil@other"), ("r3", "nil@rlm"), ("r4", "nil@rlm")),
      perms = Seq(("r3", "WRITE"), ("r4", "READ")))
    assert(out("r1").getString(2) == "ReservedRoleName")
    assert(out("r2").getString(2) == "InvalidAssignedUser")
    assert(out("r3").getString(2) == "InvalidPublicRole")
    assert(out("r4").getString(2) == "Ok" && out("r4").getBoolean(7))
    assert(out("r5").getString(2) == "GroupNotFound") // doc missing
  }

  test("remove_role: exact-named admin undeletable; doc missing is " +
    "AuthDocNotFound (remove_group_role.rs:291-299)") {
    val out = run(Seq(
      req("r1", "remove_role", roleId = "r-admin"),
      req("r2", "remove_role", roleId = "r-dev"),
      req("r3", "remove_role", grp = "G2", roleId = "r-dev")))
    assert(out("r1").getString(2) == "AdminRoleUndeletable")
    assert(out("r2").getString(2) == "Ok")
    assert(out("r3").getString(2) == "AuthDocNotFound")
  }

  test("add_user: nil id first; any missing role fails; was_member/" +
    "newly_added (add_user_to_group.rs:606-621,266-271)") {
    val out = run(Seq(
      req("r1", "add_user", user = "nil", auth = false),
      req("r2", "add_user", user = "carol"),
      req("r3", "add_user", user = "bob")),
      lists = Seq(("r2", "r-dev"), ("r2", "r-x"), ("r3", "r-dev")))
    assert(out("r1").getString(2) == "InvalidUserId")
    assert(out("r2").getString(2) == "RoleNotFound")
    assert(out("r3").getString(2) == "Ok" &&
      out("r3").getBoolean(3) && !out("r3").getBoolean(4))
  }

  test("remove_user: self-leave skips auth; last-admin guard binds only " +
    "when the admin role would empty (remove_user_from_group.rs)") {
    val out = run(Seq(
      // self-leave with NO permission still proceeds
      req("r1", "remove_user", user = "bob", actor = "bob", auth = false),
      // alice is the sole admin: implicit removal -> LastAdmin
      req("r2", "remove_user", user = "alice"),
      // explicit list NOT naming the admin role -> bob-only removal fine,
      // and alice keeps admin membership elsewhere -> still_member
      req("r3", "remove_user", user = "alice", hasList = true)),
      lists = Seq(("r3", "r-dev")))
    assert(out("r1").getString(2) == "Ok" && out("r1").getBoolean(3))
    assert(out("r2").getString(2) == "LastAdmin")
    assert(out("r3").getString(2) == "Ok" && out("r3").getBoolean(5))
  }
}
