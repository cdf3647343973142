package graft.catalog

import graft.SparkSpec

/** User-access credential ops (create/get/list/revoke_user_access.rs,
  * blob.rs:893-931). */
class UserAccessSpec extends SparkSpec {
  import spark.implicits._

  private val creds = Seq(
    // key, user, group, expiry, revoked_at
    ("AK1", "u1", "g1", 1000L, Option.empty[Long]),
    ("AK2", "u1", "g1", 2000L, Some(500L)),
    ("AK3", "u2", "g1", 3000L, Option.empty[Long])
  ).toDF("access_key", "user_id", "group_id", "expiry_ms", "revoked_at_ms")

  private def run(rows: Seq[(String, String, String, String, Long)]) =
    UserAccess.verdicts(
      rows.toDF("req_id", "op", "key_id", "user_id", "now_ms"), creds)
      .collect().map(r => r.getString(0) -> r).toMap

  test("create key ladder; existing key still admits (no existence read, " +
    "create_user_access.rs:88-120; blob.rs:901-913)") {
    val out = run(Seq(
      ("r1", "create", "", "u9", 0L),
      ("r2", "create", "K" * 129, "u9", 0L),
      ("r3", "create", "K" * 128, "u9", 100L),
      ("r4", "create", "no-dash", "u9", 0L),
      ("r5", "create", "AK1", "u9", 0L))) // collides, still Ok
    assert(out("r1").getString(2) == "InvalidLength")
    assert(out("r2").getString(2) == "InvalidLength")
    assert(out("r3").getString(2) == "Ok" &&
      out("r3").getLong(3) == 100L + UserAccess.DefaultTtlMs)
    assert(out("r4").getString(2) == "NotAlphanumeric")
    assert(out("r5").getString(2) == "Ok")
  }

  test("get: inclusive expiry boundary + revoked predicate " +
    "(blob.rs:923-928)") {
    val out = run(Seq(
      ("r1", "get", "AK1", "u9", 1000L),  // expiry == now -> expired
      ("r2", "get", "AK1", "u9", 999L),   // one ms before -> live
      ("r3", "get", "AK2", "u9", 0L),     // revoked
      ("r4", "get", "AKX", "u9", 0L)))    // missing
    assert(out("r1").getBoolean(4) && !out("r1").getBoolean(5))
    assert(!out("r2").getBoolean(4))
    assert(out("r3").getBoolean(5))
    assert(out("r4").getString(2) == "NotFound")
  }

  test("revoke idempotency: already-revoked keeps its stamp " +
    "(revoke_user_access.rs:100-110)") {
    val out = run(Seq(
      ("r1", "revoke", "AK1", "u9", 7777L),
      ("r2", "revoke", "AK2", "u9", 7777L),
      ("r3", "revoke", "AKX", "u9", 7777L)))
    assert(out("r1").getBoolean(6) && out("r1").getLong(7) == 7777L)
    assert(!out("r2").getBoolean(6) && out("r2").getLong(7) == 500L)
    assert(out("r3").getString(2) == "NotFound")
  }

  test("list counts dead credentials too (list_user_access.rs:94-101 " +
    "filters identity only)") {
    val out = run(Seq(
      ("r1", "list", "x", "u1", 0L),  // live + revoked both counted
      ("r2", "list", "x", "u3", 0L))) // no creds -> empty Ok
    assert(out("r1").getLong(8) == 2L)
    assert(out("r2").getString(2) == "Ok" && out("r2").getLong(8) == 0L)
  }

  test("plan: the credential keyspace is probed, never broadcast whole") {
    // corpus side from range (shows as a Range leaf); a reverted
    // broadcast(creds) would put the Range under a BroadcastExchange with
    // no probe join inside it
    val bigCreds = spark.range(100000).selectExpr(
      "concat('AK', id) AS access_key", "concat('u', id % 1000) AS user_id",
      "'g1' AS group_id", "id AS expiry_ms",
      "CAST(NULL AS BIGINT) AS revoked_at_ms")
    val reqs = Seq(("r1", "get", "AK7", "u1", 0L),
      ("r2", "list", "x", "u2", 0L))
      .toDF("req_id", "op", "key_id", "user_id", "now_ms")
    val out = UserAccess.verdicts(reqs, bigCreds)
    assert(out.collect().length == 2)
    val bad = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("BroadcastExchange") &&
        p.collectLeaves().exists(_.nodeName.contains("Range")) &&
        !p.toString.contains("Join") => p
    }
    assert(bad.isEmpty,
      s"credential keyspace broadcast without a probe join:\n${bad.mkString}")
  }
}
