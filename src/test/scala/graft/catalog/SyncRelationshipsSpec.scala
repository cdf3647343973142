package graft.catalog

import graft.SparkSpec

/** Sync-relationship management (sync_relationship.rs). */
class SyncRelationshipsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val store = Seq(
    // rel_id, source, target, mode, state, serving
    ("sr-1", "s3-a/x", "t1", "Once", "Enabled", false),
    ("sr-2", "s3-a/y", "t2", "Reference", "Enabled", true),
    ("sr-3", "s3-a/z", "t3", "Reference", "Detached", true)
  ).toDF("rel_id", "source", "target", "mode", "state", "serving")

  private def run(rows: Seq[(Long, String, String, String, Boolean, String,
      String, String)]) =
    SyncRelationships.decide(rows.map(r =>
      (r._1, r._2, r._3, r._4, "b", r._5, r._6, r._7, r._8))
      .toDF("seq", "req_id", "op", "rel_id", "source_bucket",
        "source_arn_ok", "source", "target", "mode"), store)
      .collect().map(r => r.getString(0) -> r).toMap

  test("create: ARN gate, live-identity Duplicate, Detached stubs never " +
    "block, in-batch first-wins with failed firsts leaving no fence " +
    "(sync_relationship.rs:61-190,235-237)") {
    val out = run(Seq(
      (1L, "r1", "create", "x", false, "s3-q/a", "tq", "Once"),
      (2L, "r2", "create", "x", true, "s3-a/x", "t1", "Once"),   // live dup
      (3L, "r3", "create", "x", true, "s3-a/x", "t1", "Continuous"), // mode differs
      (4L, "r4", "create", "x", true, "s3-a/z", "t3", "Reference"), // detached: ok
      (5L, "r5", "create", "x", false, "s3-n/n", "tn", "Once"),  // bad arn first
      (6L, "r6", "create", "x", true, "s3-n/n", "tn", "Once"),   // then creates
      (7L, "r7", "create", "x", true, "s3-n/n", "tn", "Once")))  // batch dup
    assert(out("r1").getString(2) == "NotAnS3Arn")
    assert(out("r2").getString(2) == "Duplicate")
    assert(out("r3").getString(2) == "Ok") // identity includes the mode
    assert(out("r4").getString(2) == "Ok" && out("r4").getString(3) == "Enabled")
    assert(out("r5").getString(2) == "NotAnS3Arn")
    assert(out("r6").getString(2) == "Ok")
    assert(out("r7").getString(2) == "Duplicate")
  }

  test("remove: serving relationships detach (stub survives for native " +
    "reference reads), others delete outright, unknown NotFound " +
    "(sync_relationship.rs:119-142)") {
    val out = run(Seq(
      (1L, "r1", "remove", "sr-1", true, "s", "t", "Once"),
      (2L, "r2", "remove", "sr-2", true, "s", "t", "Once"),
      (3L, "r3", "remove", "sr-9", true, "s", "t", "Once")))
    assert(out("r1").getString(2) == "Ok" &&
      out("r1").getString(4) == "Deleted" && !out("r1").getBoolean(5))
    assert(out("r2").getString(2) == "Ok" &&
      out("r2").getString(4) == "Detached" && out("r2").getBoolean(5))
    assert(out("r3").getString(2) == "NotFound")
  }
}
