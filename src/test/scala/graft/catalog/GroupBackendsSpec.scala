package graft.catalog

import graft.SparkSpec

/** Group storage-backend admission (group_backends/validation.rs,
  * replace.rs:67-87). */
class GroupBackendsSpec extends SparkSpec {
  import spark.implicits._

  private val noKv = Seq.empty[(String, Long, String, String)]
  private val noEx = Seq.empty[(String, String, String)]

  private def run(
      reqs: Seq[(String, String, String, String, Option[String])],
      pub: Seq[(String, Long, String, String)],
      sec: Seq[(String, Long, String, String)] = noKv,
      ex: Seq[(String, String, String)] = noEx) =
    GroupBackends.decide(
      reqs.toDF("req_id", "op", "name", "kind", "ex_kind"),
      pub.toDF("req_id", "seq", "k", "v"),
      sec.toDF("req_id", "seq", "k", "v"),
      ex.toDF("req_id", "key", "value"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap

  private val s3Pub = Seq(
    (1L, "endpoint", "https://s3.example.com"), (2L, "bucket", "data"))
  private val s3Sec = Seq(
    (1L, "access_key_id", "id"), (2L, "secret_access_key", "key"))
  private def v(id: String) = (id, "validate", "b", "S3", None)

  test("normalize: lowercased keys, unknown/empty/dup in entry order " +
    "(validation.rs:218-241)") {
    val out = run(
      Seq(v("r1"), v("r2"), v("r3"), v("r4")),
      pub = s3Pub.map { case (s, k2, v2) => ("r1", s, k2, v2) } ++
        Seq(("r1", 9L, "Region", "eu")) ++ // casing normalizes, allowed
        s3Pub.map { case (s, k2, v2) => ("r2", s, k2, v2) } ++
        Seq(("r2", 9L, "role_arn", "x")) ++ // absent ON PURPOSE: unknown
        s3Pub.map { case (s, k2, v2) => ("r3", s, k2, v2) } ++
        Seq(("r3", 9L, "region", "  ")) ++
        s3Pub.map { case (s, k2, v2) => ("r4", s, k2, v2) } ++
        Seq(("r4", 9L, "BUCKET", "again")),
      sec = (s3Sec.map { case (s, k2, v2) => ("r1", s, k2, v2) } ++
        s3Sec.map { case (s, k2, v2) => ("r2", s, k2, v2) } ++
        s3Sec.map { case (s, k2, v2) => ("r3", s, k2, v2) } ++
        s3Sec.map { case (s, k2, v2) => ("r4", s, k2, v2) }))
    assert(out("r1") == "Ok")
    assert(out("r2") == "UnknownPublicKey:role_arn")
    assert(out("r3") == "EmptyValue:region")
    assert(out("r4") == "DuplicateKey:bucket")
  }

  test("reference validation table: endpoint screens, unsafe bucket/root, " +
    "bool parse, azure one-of (validation.rs tests)") {
    def pubWith(id: String, endpoint: String, bucket: String = "data",
        root: Option[String] = None, fps: Option[String] = None) =
      Seq((id, 1L, "endpoint", endpoint), (id, 2L, "bucket", bucket)) ++
        root.map(r => (id, 3L, "root", r)) ++
        fps.map(f => (id, 4L, "force_path_style", f))
    val out = run(
      Seq(v("r1"), v("r2"), v("r3"), v("r4"), v("r5"), v("r6"),
        ("r7", "validate", "b", "Azblob", None),
        ("r8", "validate", "b", "Azblob", None)),
      pub = pubWith("r1", "http://s3.example.com") ++
        pubWith("r2", "https://127.1") ++
        pubWith("r3", "https://0xa9fea9fe") ++
        pubWith("r4", "https://s3.example.com", bucket = "da@ta") ++
        pubWith("r5", "https://s3.example.com", root = Some("../up")) ++
        pubWith("r6", "https://s3.example.com", fps = Some("yes")) ++
        Seq(("r7", 1L, "endpoint", "https://az.example.com"),
          ("r7", 2L, "container", "c"), ("r7", 3L, "account_name", "a"),
          ("r8", 1L, "endpoint", "https://az.example.com"),
          ("r8", 2L, "container", "c"), ("r8", 3L, "account_name", "a")),
      sec = (1 to 6).flatMap(i =>
        s3Sec.map { case (s, k2, v2) => (s"r$i", s, k2, v2) }) ++
        Seq(("r8", 1L, "sas_token", "st"))) // r7 has neither azure secret
    assert(out("r1") == "InsecureEndpoint")
    assert(out("r2") == "AmbiguousEndpoint")
    assert(out("r3") == "AmbiguousEndpoint")
    assert(out("r4") == "UnsafeBucket")
    assert(out("r5") == "UnsafeRoot")
    assert(out("r6") == "InvalidBool")
    assert(out("r7") == "MissingEitherSecret")
    assert(out("r8") == "Ok")
  }

  test("check_identity: validate-then-identity order, type first, identity " +
    "keys in per-kind order; credentials and name MAY change " +
    "(replace.rs:67-87, validation.rs:78-92)") {
    val ex = Seq(
      ("r1", "endpoint", "https://s3.example.com"), ("r1", "bucket", "data"),
      ("r2", "endpoint", "https://s3.example.com"), ("r2", "bucket", "data"),
      ("r3", "endpoint", "https://other.example.com"),
      ("r3", "bucket", "zzz"),
      ("r4", "endpoint", "https://s3.example.com"), ("r4", "bucket", "data"))
    val out = run(
      Seq(("r1", "replace", "renamed", "S3", Some("S3")),
        ("r2", "replace", "b", "S3", Some("Gcs")),   // kind immutable
        ("r3", "replace", "b", "S3", Some("S3")),    // endpoint first
        ("r4", "replace", "b", "S3", None),          // not found
        ("r5", "replace", "b", "S3", Some("S3"))),   // invalid input first
      pub = Seq("r1", "r2", "r3", "r4").flatMap(id =>
        s3Pub.map { case (s, k2, v2) => (id, s, k2, v2) }) ++
        Seq(("r5", 1L, "endpoint", "http://x"), ("r5", 2L, "bucket", "d")),
      sec = Seq("r1", "r2", "r3", "r4", "r5").flatMap(id =>
        s3Sec.map { case (s, k2, v2) => (id, s, k2, v2) }),
      ex = ex)
    assert(out("r1") == "Ok") // new name + same identity admits
    assert(out("r2") == "Immutable:type")
    assert(out("r3") == "Immutable:endpoint") // endpoint before bucket
    assert(out("r4") == "NotFound")
    assert(out("r5") == "InsecureEndpoint") // validation precedes identity
  }

  test("lifecycle: idempotent disable stamp, disabled-only removal, the " +
    "holding-data guard (disable.rs:103-131, remove.rs:100-282)") {
    val backends = Seq(
      ("g1", "bk1", false, "be1"), // enabled
      ("g1", "bk2", true, "be2"),  // disabled, not holding
      ("g1", "bk3", true, "be3")   // disabled, holding data
    ).toDF("group_id", "backend_id", "disabled", "backend")
    val holders = Seq("be3").toDF("backend")
    val out = GroupBackends.lifecycle(Seq(
      ("r1", "set_disabled", "g1", "bk1", true),
      ("r2", "set_disabled", "g1", "bk2", true),  // already there: no write
      ("r3", "set_disabled", "g2", "bk1", true),  // wrong group
      ("r4", "remove", "g1", "bk1", false),       // still enabled
      ("r5", "remove", "g1", "bk2", false),       // drained: removable
      ("r6", "remove", "g1", "bk3", false),       // holds data
      ("r7", "remove", "g1", "bkX", false))
      .toDF("req_id", "op", "group_id", "backend_id", "target_disabled"),
      backends, holders)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(2) == "Ok" && out("r1").getBoolean(3))
    assert(out("r2").getString(2) == "Ok" && !out("r2").getBoolean(3))
    assert(out("r3").getString(2) == "NotFound")
    assert(out("r4").getString(2) == "NotRemovable")
    assert(out("r5").getString(2) == "Ok" && out("r5").getBoolean(5))
    assert(out("r6").getString(2) == "NotRemovable")
    assert(out("r7").getString(2) == "NotRemovable")
  }
}
