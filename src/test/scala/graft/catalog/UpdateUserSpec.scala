package graft.catalog

import graft.SparkSpec

/** UpdateUser ladder (update_user.rs:176-199,313-335,675-700). */
class UpdateUserSpec extends SparkSpec {
  import spark.implicits._

  private val users = Seq(
    ("u1", "u1", "Alice"), ("u2", "CORRUPT", "Mallory"))
    .toDF("user_id", "stored_id", "name")
  private val baseAttrs = Seq(("u1", "a"), ("u1", "b"))
    .toDF("user_id", "key")
  private val noReducer = Seq(("x", "x")).toDF("user_id", "stored_target")
    .filter("false")

  private def req(id: String, tgt: String = "u1", tgtRealm: String = "r1",
      authUser: String = "adm", actorUser: String = "adm",
      restricted: Boolean = false, authorized: Boolean = true,
      name: Option[String] = None) =
    (id, tgt, tgtRealm, "r1", "r1", "r1", authUser, actorUser, restricted,
      authorized, name)

  private def run(rows: Seq[(String, String, String, String, String,
      String, String, String, Boolean, Boolean, Option[String])],
      rm: Seq[(String, Long, String)] = Nil,
      st: Seq[(String, Long, String, String)] = Nil) =
    UpdateUser.verdicts(
      rows.toDF("req_id", "target_user", "target_realm", "auth_realm",
        "actor_realm", "self_realm", "auth_user", "actor_user",
        "restricted", "authorized", "new_name"),
      rm.toDF("req_id", "ord", "key"),
      st.toDF("req_id", "ord", "key", "value"), users, baseAttrs, noReducer)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap

  test("auth: realm isolation, actor==auth-user, restricted self refused, " +
    "unrestricted self skips the permission check") {
    val out = run(Seq(
      req("r1", tgtRealm = "r2"),
      req("r2", actorUser = "other"),
      req("r3", authUser = "u1", actorUser = "u1", restricted = true),
      req("r4", authUser = "u1", actorUser = "u1", authorized = false),
      req("r5", authorized = false)))
    assert(out("r1")._1 == "Unauthorized")
    assert(out("r2")._1 == "Unauthorized")
    assert(out("r3")._1 == "Unauthorized")
    assert(out("r4")._1 == "Ok") // self, no permission needed
    assert(out("r5")._1 == "Unauthorized") // non-self needs it
  }

  test("stored-id guard, name byte rules") {
    val out = run(Seq(
      req("r1", tgt = "u2"),
      req("r2", tgt = "u9"),
      req("r3", name = Some("  ")),
      req("r4", name = Some("N" * 257)),
      req("r5", name = Some(" Bob ")),
      req("r6", name = Some("N" * 256))))
    assert(out("r1")._1 == "UserIdMismatch")
    assert(out("r2")._1 == "UserNotFound")
    assert(out("r3")._1 == "InvalidUserName")
    assert(out("r4")._1 == "InvalidUserName")
    assert(out("r5") == (("Ok", Some("Bob"), Some(2L))))
    assert(out("r6")._1 == "Ok")
  }

  test("removals validate before sets; remove-before-set overlap ends " +
    "present; cap applies to the POST-update count") {
    val out = run(Seq(req("r1"), req("r2"), req("r3")),
      rm = Seq(("r1", 9L, "bad rm!"), ("r2", 0L, "a"), ("r2", 1L, "b")),
      st = Seq(("r1", 0L, "bad st!", "v"),
        // r2: remove a+b, set b back + 127 fresh -> 128 exactly, at cap
        ("r2", 0L, "b", "v")) ++
        (1 to 127).map(i => ("r2", i.toLong, s"k$i", "v")) ++
        // r3: no removals, 127 fresh + 2 base -> 129 over cap
        (0 to 126).map(i => ("r3", i.toLong, s"k$i", "v")))
    assert(out("r1")._1 == "InvalidAttributeKey:bad rm!")
    assert(out("r2") == (("Ok", Some("Alice"), Some(128L))))
    assert(out("r3")._1 == "TooManyAttributes")
  }
}
