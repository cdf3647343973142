package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OIDC login-path ops (register_or_get_oidc_user.rs,
  * ensure_canonical_user_token_subject.rs, structs.rs:20-26). */
class OidcSpec extends SparkSpec {
  import spark.implicits._

  test("subject key is the structured JSON encoding — delimiter collisions " +
    "impossible (oidc_subject_key_uses_structured_encoding)") {
    val got = Seq(("https://issuer.example", "subject-1"), ("a:b", "c"),
      ("a", "b:c")).toDF("iss", "sub")
      .select(Oidc.subjectKey(col("iss"), col("sub")).as("k"))
      .collect().map(_.getString(0))
    assert(got(0) ==
      """{"kind":"oidc","issuer":"https://issuer.example","sub":"subject-1"}""")
    assert(got(1) != got(2), "a:b/c must differ from a/b:c")
  }

  test("registerOrGet: hit adopts silently, miss creates+announces, " +
    "in-batch same-claim requests resolve first-wins " +
    "(register_or_get_oidc_user.rs:154-345)") {
    val idx = Seq(("https://i.example", "known", "U-existing"))
      .toDF("iss", "sub", "user_id")
      .select(Oidc.subjectKey(col("iss"), col("sub")).as("subject_key"),
        col("user_id"))
    val reqs = Seq(
      (1L, "r1", "https://i.example", "known", "N1"),   // hit -> adopt
      (2L, "r2", "https://i.example", "fresh", "N2"),   // miss -> create
      (3L, "r3", "https://i.example", "fresh", "N3"),   // in-batch dup
      (4L, "r4", "https://i.example", "fresh", "N4")    // still the first's
    ).toDF("seq", "req_id", "issuer", "sub", "new_user_id")
    val out = Oidc.registerOrGet(reqs, idx).collect()
      .map(r => r.getString(0) ->
        ((r.getString(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(out("r1") == (("Adopted", "U-existing", false)))
    assert(out("r2") == (("Created", "N2", true)))
    assert(out("r3") == (("Adopted", "N2", false)))
    assert(out("r4") == (("Adopted", "N2", false)))
  }

  test("canonicalSubject: unknown/corrupt user Unauthorized, empty list Ok " +
    "with zero reads, walk stops at first failure " +
    "(ensure_canonical_user_token_subject.rs:106-148)") {
    val users = Seq(("u1", "u1"), ("u2", "u2"), ("u3", "u3"), ("u4", "u4"),
      ("u5", "XX")).toDF("user_id", "stored_id")
    val subj = Seq(
      ("u1", 0L, "k-a"), ("u1", 1L, "k-b"), ("u1", 2L, "k-c"),
      ("u2", 0L, "k-d"), ("u2", 1L, "k-missing"), ("u2", 2L, "k-e"),
      ("u3", 0L, "k-f"), ("u3", 1L, "k-foreign")
    ).toDF("user_id", "ord", "subject_key")
    val idx = Seq(
      ("k-a", "u1"), ("k-b", "u1"), ("k-c", "u1"),
      ("k-d", "u2"), ("k-e", "u2"),
      ("k-f", "u3"), ("k-foreign", "u9")
    ).toDF("subject_key", "user_id")
    val reqs = Seq("u1", "u2", "u3", "u4", "u5", "u9x")
      .zipWithIndex.map { case (u, i) => (s"r$i", u) }
      .toDF("req_id", "user_id")
    val out = Oidc.canonicalSubject(reqs, users, subj, idx).collect()
      .map(r => r.getString(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(out("r0") == (("Ok", Some(3L))))          // full walk
    assert(out("r1") == (("Forbidden", Some(2L))))   // stops at missing (ord 1)
    assert(out("r2") == (("Forbidden", Some(2L))))   // foreign pointer (ord 1)
    assert(out("r3") == (("Ok", Some(0L))))          // empty claim list
    assert(out("r4") == (("Unauthorized", None)))    // corrupt stored id
    assert(out("r5") == (("Unauthorized", None)))    // unknown user
  }

  test("getUsers: two-hop point read — index hit reads the user; index " +
    "miss AND dangling index row both finalize UserNotFound " +
    "(get_oidc_user.rs:137,170)") {
    val idx = Seq(
      (Oidc.subjectKeyStr("https://i.example", "s1"), "u1"),
      (Oidc.subjectKeyStr("https://i.example", "s2"), "u-gone"))
      .toDF("subject_key", "user_id")
    val users = Seq(("u1", "Alice", 1700000000001L))
      .toDF("user_id", "display_name", "created_at_ms")
    val reqs = Seq(
      ("r1", "https://i.example", "s1"),  // both hops hit
      ("r2", "https://i.example", "s2"),  // dangling index row
      ("r3", "https://i.example", "s3"))  // index miss
      .toDF("req_id", "issuer", "sub")
    val out = Oidc.getUsers(reqs, idx, users).collect()
      .map(r => r.getString(0) -> ((r.getString(1), Option(r.getString(2)),
        Option(r.getString(3))))).toMap
    assert(out("r1") == (("Ok", Some("u1"), Some("Alice"))))
    assert(out("r2") == (("UserNotFound", None, None)))
    assert(out("r3") == (("UserNotFound", None, None)))
  }

  test("plan: subject index and user keyspaces probed, never broadcast " +
    "whole") {
    val idx = spark.range(100000).selectExpr(
      "concat('k', id) AS subject_key", "concat('u', id % 5000) AS user_id")
    val reqs = Seq((1L, "r1", "https://i.example", "s7", "N1"))
      .toDF("seq", "req_id", "issuer", "sub", "new_user_id")
    val out = Oidc.registerOrGet(reqs, idx)
    assert(out.collect().length == 1)
    val bad = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("BroadcastExchange") &&
        p.collectLeaves().exists(_.nodeName.contains("Range")) &&
        !p.toString.contains("Join") => p
    }
    assert(bad.isEmpty,
      s"subject index broadcast without a probe join:\n${bad.mkString}")
  }
}
