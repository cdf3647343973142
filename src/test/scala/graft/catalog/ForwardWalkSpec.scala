package graft.catalog

import graft.SparkSpec

class ForwardWalkSpec extends SparkSpec {
  import spark.implicits._

  test("forward walk: terminals stop the rank order, failures accumulate, all-miss and fail-closed rules") {
    val requests = Seq(
      ("q1", "update", "forward", false), // unavailable then ok at rank 1
      ("q2", "create", "forward", false), // not_found is a FAILURE for create
      ("q3", "update", "forward", true),  // local_self + not_found -> all miss
      ("q4", "create", "forward", false), // possibly-sent stops before rank 1
      ("q5", "update", "forward_empty", false), // fail closed
      ("q6", "delete", "local", false),
      ("q7", "update", "forward", false)) // reject terminates undeliverable
      .toDF("req_id", "op", "route", "local_miss")
    val attempts = Seq(
      ("q1", 0L, "na", "unavailable"), ("q1", 1L, "nb", "ok"),
      ("q1", 2L, "nc", "ok"), // never reached
      ("q2", 0L, "na", "not_found"), ("q2", 1L, "nb", "unavailable"),
      ("q3", 0L, "nl", "local_self"), ("q3", 1L, "nb", "not_found"),
      ("q4", 0L, "na", "err_possibly_sent"),
      ("q4", 1L, "nb", "denied_unauthorized"),
      ("q7", 0L, "na", "err_not_sent"), ("q7", 1L, "nb", "reject"))
      .toDF("req_id", "rank", "node_id", "resp")
    val got = ForwardWalk.fold(requests, attempts)
      .collect().map(r => r.getString(0) -> r).toMap
    val q1 = got("q1")
    assert(q1.getAs[String]("outcome") == "accepted" &&
      q1.getAs[String]("accepted_by") == "nb" &&
      q1.getAs[Long]("n_attempted") == 2L &&
      q1.getAs[Long]("n_failures") == 1L, q1.toString)
    val q2 = got("q2")
    assert(q2.getAs[String]("outcome") == "undeliverable" &&
      q2.getAs[String]("detail") == "failures" &&
      q2.getAs[Long]("n_failures") == 2L, q2.toString)
    // update where the local miss plus every remote answer is not_found
    assert(got("q3").getAs[String]("outcome") == "not_found" &&
      got("q3").getAs[String]("detail") == "all_not_found")
    assert(got("q4").getAs[String]("outcome") == "undeliverable" &&
      got("q4").getAs[String]("detail") == "possibly_sent" &&
      got("q4").getAs[Long]("n_attempted") == 1L)
    assert(got("q5").getAs[String]("outcome") == "undeliverable" &&
      got("q5").getAs[String]("detail") == "config_unavailable")
    assert(got("q6").getAs[String]("outcome") == "local" &&
      got("q6").getAs[String]("detail") == null)
    assert(got("q7").getAs[String]("outcome") == "undeliverable" &&
      got("q7").getAs[String]("detail") == "rejected" &&
      got("q7").getAs[Long]("n_failures") == 1L)
  }
}
