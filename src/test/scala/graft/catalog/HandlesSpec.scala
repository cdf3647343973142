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
}
