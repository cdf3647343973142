package graft.catalog

import graft.SparkSpec

/** Placement-handle allocation (allocate_handle.rs,
  * handle_allocation.rs:136-151). */
class HandlesSpec extends SparkSpec {
  import spark.implicits._

  test("cursor walk: (start, range_id) order, reserved first handle " +
    "skipped, empty grants skipped, exhaustion past the grants") {
    val ranges = Seq(
      ("r1", "n1", "rg-b", 20L, 23L), // allocatable 21, 22
      ("r1", "n1", "rg-a", 10L, 13L), // walked FIRST (lower start): 11, 12
      ("r1", "n1", "rg-e", 30L, 31L), // empty (width 1): never drawn
      ("r1", "n2", "rg-z", 50L, 52L)  // other node: 51
    ).toDF("realm_id", "node_id", "range_id", "start", "end")
    val reqs = (1 to 6).map(i => (i.toLong, s"q$i", "r1", "n1")) ++
      Seq((7L, "q7", "r1", "n2"))
    val out = Handles.allocate(
      reqs.toDF("seq", "req_id", "realm_id", "node_id"), ranges)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("q1") == (("Ok", Some(11L), Some("rg-a"))))
    assert(out("q2") == (("Ok", Some(12L), Some("rg-a"))))
    assert(out("q3") == (("Ok", Some(21L), Some("rg-b"))))
    assert(out("q4") == (("Ok", Some(22L), Some("rg-b"))))
    assert(out("q5")._1 == "PlacementHandleExhausted")
    assert(out("q6")._1 == "PlacementHandleExhausted")
    assert(out("q7") == (("Ok", Some(51L), Some("rg-z"))))
  }

  test("job routing: provably-invalid is NotFound, unsynced is " +
    "Unavailable, local/forward/unauthorized dispatch " +
    "(route.rs:64-82, realm.rs:565-595)") {
    val ids = Seq(
      ("j-ok", true, true, "JobControl", "r1", 3L),
      ("j-remote", true, true, "JobControl", "r1", 4L),
      ("j-nonroute", false, true, "JobControl", "r1", 3L),
      ("j-bucket", true, false, "JobControl", "r1", 3L),
      ("j-class", true, true, "Metadata", "r1", 3L),
      ("j-realm", true, true, "JobControl", "rX", 3L),
      ("j-unbound", true, true, "JobControl", "r1", 9L),
      ("j-noowner", true, true, "JobControl", "r1", 5L)
    ).toDF("job_id", "routable", "bucket_in_range", "doc_class",
      "scope_realm", "handle")
    val bindings = Seq(
      (3L, "JobControl", Some("n-local")),
      (4L, "JobControl", Some("n-far")),
      (5L, "JobControl", Option.empty[String])
    ).toDF("handle", "doc_class", "allocated_by")
    def req(id: String, job: String, hasReq: Boolean) = (id, job, hasReq)
    val out = Handles.routeJobs(Seq(
      req("r1", "j-ok", true), req("r2", "j-remote", true),
      req("r3", "j-remote", false), req("r4", "j-nonroute", true),
      req("r5", "j-bucket", true), req("r6", "j-class", true),
      req("r7", "j-realm", true), req("r8", "j-unbound", true),
      req("r9", "j-noowner", true), req("r10", "j-gone", true))
      .toDF("req_id", "job_id", "has_request"), ids, bindings,
      "r1", "n-local")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2))))).toMap
    assert(out("r1") == (("Local", None)))
    assert(out("r2") == (("Forward", Some("n-far"))))
    assert(out("r3") == (("Unauthorized", None)))
    assert(out("r4") == (("NotFound", None)))
    assert(out("r5") == (("NotFound", None))) // bucket out of range: proof
    assert(out("r6") == (("NotFound", None)))
    assert(out("r7") == (("NotFound", None)))
    assert(out("r8") == (("Unavailable", None))) // unsynced, never absence
    assert(out("r9") == (("Unavailable", None)))
    assert(out("r10") == (("NotFound", None)))
  }
}
