package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Realm role admin (add_realm_role.rs, add_user_to_realm_role.rs). */
class RealmRolesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val authDocs = Seq("r1").toDF("realm_id") // r2 has no doc
  private lazy val authRoles = Seq(("r1", "ro-a"), ("r1", "ro-b"))
    .toDF("realm_id", "role_id")
  private lazy val assignments = Seq(("r1", "ro-a", "u1"))
    .toDF("realm_id", "role_id", "user_id")
  private lazy val reducers = Seq(("r1", "realm:r1")) // matching
    .toDF("realm_id", "stored_target")
  private val noRows = Seq.empty[(String, String)]

  private def run(reqs: Seq[(String, String, String, String, String, Boolean)],
      users: Seq[(String, String)] = noRows,
      perms: Seq[(String, String)] = noRows,
      roles: Seq[(String, String)] = noRows,
      reducerRows: Seq[(String, String)] = Seq(("r1", "realm:r1"))) =
    RealmRoles.decide(
      reqs.toDF("req_id", "op", "realm_id", "role_name", "user_id",
        "authorized"),
      users.toDF("req_id", "user_id"), perms.toDF("req_id", "permission"),
      roles.toDF("req_id", "role_id"), authDocs, authRoles, assignments,
      reducerRows.toDF("realm_id", "stored_target"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("add_role: validate BEFORE auth — reserved trimmed name, foreign " +
    "nil, public non-READ all fire on an UNAUTHORIZED request " +
    "(add_realm_role.rs:538-541 validates in start)") {
    val out = run(Seq(
      ("r1", "add_role", "r1", " realm_admin ", "u0", false),
      ("r2", "add_role", "r1", "fine", "u0", false),
      ("r3", "add_role", "r1", "f2", "u0", false),
      ("r4", "add_role", "r1", "f3", "u0", true),
      ("r5", "add_role", "r2", "f4", "u0", true),   // no auth doc
      ("r6", "add_role", "r1", "f5", "u0", true)),
      users = Seq(("r2", "nil@r9"), ("r3", "nil@r1"), ("r4", "nil@r1"),
        ("r6", "u7")),
      perms = Seq(("r3", "WRITE"), ("r4", "READ"), ("r6", "READ")))
    assert(out("r1").getString(2) == "ReservedRoleName")
    assert(out("r2").getString(2) == "InvalidAssignedUser")
    assert(out("r3").getString(2) == "InvalidPublicRole")
    assert(out("r4").getString(2) == "Ok" && out("r4").getBoolean(3) &&
      out("r4").getLong(4) == 1L) // public READ-only role admits
    assert(out("r5").getString(2) == "RealmAuthDocNotFound")
    assert(out("r6").getString(2) == "Ok" && !out("r6").getBoolean(3))
  }

  test("add_role: reducer TargetMismatch (absent state is fresh)") {
    val out = run(Seq(
      ("r1", "add_role", "r1", "x", "u0", true)),
      reducerRows = Seq(("r1", "group:r1")))
    assert(out("r1").getString(2) == "TargetMismatch")
  }

  test("assign_user: nil first, AuthDocNotFound, sorted-list RoleNotFound, " +
    "upsert n_already (add_user_to_realm_role.rs:522,239-245,273-287)") {
    val out = run(Seq(
      ("r1", "assign_user", "r1", "x", "nil@r1", false), // nil before auth
      ("r2", "assign_user", "r1", "x", "u1", false),
      ("r3", "assign_user", "r2", "x", "u1", true),
      ("r4", "assign_user", "r1", "x", "u1", true),      // ro-x missing
      ("r5", "assign_user", "r1", "x", "u1", true),      // ok: already in ro-a
      ("r6", "assign_user", "r1", "x", "u2", true)),     // ok: fresh user
      roles = Seq(("r3", "ro-a"), ("r4", "ro-a"), ("r4", "ro-x"),
        ("r5", "ro-a"), ("r5", "ro-b"), ("r6", "ro-a")))
    assert(out("r1").getString(2) == "InvalidUserId")
    assert(out("r2").getString(2) == "Unauthorized")
    assert(out("r3").getString(2) == "AuthDocNotFound")
    assert(out("r4").getString(2) == "RoleNotFound")
    assert(out("r5").getString(2) == "Ok" && out("r5").getLong(5) == 2L &&
      out("r5").getLong(6) == 1L)
    assert(out("r6").getString(2) == "Ok" && out("r6").getLong(6) == 0L)
  }
}
