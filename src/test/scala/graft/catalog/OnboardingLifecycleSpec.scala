package graft.catalog

import graft.SparkSpec

/** Onboarding-secret lifecycle (create/inspect/delete/list_onboarding_
  * secret(s).rs) — the ladder around ob1's reserve/consume. */
class OnboardingLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val now = 1000L
  private lazy val store = Seq(
    // enrollment, hash, expires, state, state_node
    ("e1", "h1", 2000L, "Available", Option.empty[String]),
    ("e2", "h2", 2000L, "Finalizing", Some("nA")),
    ("e3", "h3", 500L, "Finalizing", Some("nA")), // expired, claimed by nA
    ("e4", "h4", 500L, "Available", Option.empty[String])
  ).toDF("enrollment_id", "secret_hash", "expires_at", "state", "state_node")

  private def run(rows: Seq[(String, String, String, String, String)]) =
    Onboarding.lifecycle(rows.map(r => (r._1, r._2, r._3, r._4, r._5, now))
      .toDF("req_id", "op", "enrollment_id", "node_id", "secret_hash",
        "now_ms"), store)
      .collect().map(r => r.getString(0) -> r).toMap

  test("create overwrites unconditionally; delete pairs; list counts dead " +
    "secrets (create:96-122, delete:104-135, list:72-186)") {
    val out = run(Seq(
      ("r1", "create", "e1", "nA", "hX"),  // exists: still Ok, resets state
      ("r2", "create", "e9", "nA", "h9"),
      ("r3", "delete", "e1", "nA", "x"),
      ("r4", "delete", "e9", "nA", "x"),
      ("r5", "list", "x", "nA", "x")))
    assert(out("r1").getString(2) == "Ok" && out("r1").getString(3) == "Available")
    assert(out("r2").getString(2) == "Ok")
    assert(out("r3").getString(2) == "Ok" && out("r3").getLong(4) == 2L)
    assert(out("r4").getString(2) == "NotFound")
    assert(out("r5").getString(2) == "Ok" && out("r5").getLong(5) == 4L)
  }

  test("inspect: claimed-by-other BEFORE expiry, finalizing-self escapes " +
    "expiry, then the hash (inspect_onboarding_secret.rs:151-170)") {
    val out = run(Seq(
      ("r1", "inspect", "e2", "nB", "h2"),  // other node finalizing
      ("r2", "inspect", "e3", "nB", "h3"),  // other node + expired: claimed wins
      ("r3", "inspect", "e3", "nA", "h3"),  // self mid-finalize: expiry waived
      ("r4", "inspect", "e4", "nA", "h4"),  // plain expiry
      ("r5", "inspect", "e1", "nA", "zz"),  // bad hash
      ("r6", "inspect", "e1", "nA", "h1"),
      ("r7", "inspect", "eX", "nA", "h")))
    assert(out("r1").getString(2) == "AlreadyClaimed")
    assert(out("r2").getString(2) == "AlreadyClaimed")
    assert(out("r3").getString(2) == "Ok" && out("r3").getLong(6) == 500L)
    assert(out("r4").getString(2) == "Expired")
    assert(out("r5").getString(2) == "InvalidSecret")
    assert(out("r6").getString(2) == "Ok")
    assert(out("r7").getString(2) == "NotFound")
  }

  test("sync tickets: 5 control targets + one per realm user; verify's " +
    "node/expiry/membership arms (issue_onboarding_sync_ticket.rs:66-158, " +
    "onboarding.rs:188-207)") {
    val users = Seq(("u1", "rA"), ("u2", "rA"), ("u3", "rB"))
      .toDF("user_id", "realm_id")
    def req(id: String, op: String, realm: String, tNode: String,
        tExp: Long, hasDoc: Boolean) =
      (id, op, realm, "n1", 100L, 300L, tNode, tExp, hasDoc)
    val out = Onboarding.syncTickets(Seq(
      req("r1", "issue", "rA", "x", 0L, true),
      req("r2", "issue", "rC", "x", 0L, true),  // no users: 5 targets
      req("r3", "verify", "rA", "n1", 200L, true),
      req("r4", "verify", "rA", "n2", 200L, true),
      req("r5", "verify", "rA", "n1", 99L, true),
      req("r6", "verify", "rA", "n1", 200L, false))
      .toDF("req_id", "op", "realm_id", "node_id", "now_s", "ttl_s",
        "t_node", "t_expires", "has_document"), users)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(2) == "Ok" && out("r1").getLong(3) == 7L &&
      out("r1").getLong(4) == 400L)
    assert(out("r2").getLong(3) == 5L)
    assert(out("r3").getString(2) == "Ok")
    assert(out("r4").getString(2) == "InvalidSecret")
    assert(out("r5").getString(2) == "InvalidSecret")
    assert(out("r6").getString(2) == "InvalidSecret")
  }

  test("joiner admission: lexicographically-first reserved label named, " +
    "then crr1's location/weight normalize " +
    "(bootstrap_onboarding_finalize.rs:268-288, node_info.rs:17-22)") {
    val reqs = Seq(
      ("r1", Some(" eu "), Some(7L)),
      ("r2", Some("x"), Some(0L)),          // both reserved labels below
      ("r3", Some("y" * 65), None),
      ("r4", None, None))
      .toDF("req_id", "node_location", "node_weight")
    val labels = Seq(
      ("r1", "team/a"),
      ("r2", "aruna-engine.org/storage-class/hot"),
      ("r2", "aruna-engine.org/kind"),
      ("r3", "team/b")).toDF("req_id", "label_key")
    val out = Onboarding.joinerAdmission(reqs, labels)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "Ok" &&
      out("r1").getString(2) == "eu" && out("r1").getLong(3) == 7L)
    // BTreeMap order: "aruna-engine.org/kind" < ".../storage-class/hot"
    assert(out("r2").getString(1) == "ReservedNodeLabel:aruna-engine.org/kind")
    assert(out("r3").getString(1) == "NodeLocationTooLong")
    assert(out("r4").getString(1) == "Ok" && out("r4").getString(2) == "" &&
      out("r4").getLong(3) == 100L)
  }
}
