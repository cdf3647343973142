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
}
