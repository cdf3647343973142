package graft.catalog

import graft.SparkSpec

/** PutBucketCors admission (api cors.rs:21-38,107-186; bucket_cors.rs). */
class PutCorsSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = Seq(("b1", "g1")).toDF("bucket", "group_id")

  private def run(reqs: Seq[(String, String)],
      rules: Seq[(String, Long, Option[Long])],
      vals: Seq[(String, Long, String, Long, String)]) =
    Cors.putCorsVerdicts(reqs.toDF("req_id", "bucket"),
      rules.toDF("req_id", "rule_ord", "max_age"),
      vals.toDF("req_id", "rule_ord", "field", "val_ord", "value"), buckets)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(3))))).toMap

  test("config/rule/value first-fail order; normalization fingerprint " +
    "(cors.rs:21-38,107-143,158-186)") {
    val okVals = Seq(
      ("q", 0L, "method", 0L, " get "), ("q", 0L, "origin", 0L, " https://a "))
    val out = run(
      Seq(("q", "b1"), ("q0", "b1"), ("q1", "b1"), ("q2", "b1"),
        ("q3", "b1"), ("q4", "bX")),
      rules = Seq(("q", 0L, Some(60L)),
        // q1: rule 0 clean, rule 1 negative max_age -> rule ORDER pins
        ("q1", 0L, None), ("q1", 1L, Some(-1L)),
        // q2: invalid method (rank 0) beats empty origin (rank 1)
        ("q2", 0L, None),
        // q3: missing-origins check beats the rule's own bad method
        ("q3", 0L, None),
        ("q4", 0L, None)),
      vals = okVals ++ Seq(
        ("q1", 0L, "method", 0L, "PUT"), ("q1", 0L, "origin", 0L, "*"),
        ("q1", 1L, "method", 0L, "GET"), ("q1", 1L, "origin", 0L, "o"),
        ("q2", 0L, "method", 0L, "PATCH"), ("q2", 0L, "origin", 0L, " "),
        ("q3", 0L, "method", 0L, "PATCH"),
        ("q4", 0L, "method", 0L, "GET"), ("q4", 0L, "origin", 0L, "*")))
    assert(out("q")._1 == "Ok")
    // trimmed + uppercased method in the fingerprint: recompute it
    val sig = java.security.MessageDigest.getInstance("MD5")
      .digest("0:method:GET|0:origin:https://a".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out("q")._2.contains(sig))
    assert(out("q0")._1 == "MalformedXML:no_rules")
    assert(out("q1")._1 == "MalformedXML:negative_max_age")
    assert(out("q2")._1 == "MalformedXML:invalid_method")
    assert(out("q3")._1 == "MalformedXML:methods_origins")
    assert(out("q4")._1 == "NotFound")
  }
}
