package graft.catalog

import graft.SparkSpec

/** PutBucketRouting admission (reference
  * `operations/src/s3/bucket_routing.rs` operation tests at `:405-520` +
  * `core/src/structs/routing.rs:1049-1103` validation table). */
class RoutingAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val noRules =
    Seq.empty[(Long, Int, String, Boolean, String, String)]

  private def run(
      reqs: Seq[(Long, String, String)],
      rules: Seq[(Long, Int, String, Boolean, String, String)],
      owned: Seq[(String, String)] = Seq(("g1", "gb-1")),
      buckets: Seq[(String, String)] = Seq(("b", "g1")),
      unavailable: Seq[String] = Nil) =
    Routing.admitTenantRules(
      reqs.toDF("req_id", "bucket", "group_id"),
      rules.toDF("req_id", "rule_idx", "key_prefix", "exact", "kind",
        "target"),
      owned.toDF("group_id", "backend_id"),
      buckets.toDF("bucket", "owner_group"),
      unavailable.toDF("group_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(3),
        Option(r.getString(4)).getOrElse("-"),
        Option(r.getString(5)).getOrElse("-"),
        if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap

  test("writes_bucket_rules / empty clear: ok replaces the vector " +
    "(bucket_routing.rs:405-427)") {
    val out = run(
      reqs = Seq((1L, "b", "g1"), (2L, "b", "g1")),
      rules = Seq((1L, 0, "archive/", false, "class", "cold"),
        (1L, 1, "hot/", false, "class", "hot")))
    assert(out(1L) == (("ok", "-", "-", 2L)))
    assert(out(2L) == (("ok", "-", "-", 0L))) // empty vector = valid clear
  }

  test("rejects_operator_target: a node-backend target never stores " +
    "(bucket_routing.rs:429-448, routing.rs OperatorBackendTarget)") {
    val out = run(Seq((1L, "b", "g1")),
      Seq((1L, 0, "archive/", false, "node", "cold")))
    assert(out(1L) == (("error", "operator_backend_target", "-", -1L)))
  }

  test("rejects_foreign_backend vs accepts_owned_backend " +
    "(bucket_routing.rs:450-495)") {
    val out = run(
      reqs = Seq((1L, "b", "g1"), (2L, "b", "g1")),
      rules = Seq((1L, 0, "archive/", false, "group", "gb-9"),
        (2L, 0, "archive/", false, "group", "gb-1")))
    assert(out(1L) == (("error", "foreign_backend", "gb-9", -1L)))
    assert(out(2L) == (("ok", "-", "-", 1L)))
  }

  test("rejects_foreign_bucket: record moved to another group → " +
    "GroupMismatch (bucket_routing.rs:497-520)") {
    val out = run(Seq((1L, "b", "g2")), noRules,
      owned = Seq(("g2", "gb-1")))
    assert(out(1L) == (("error", "group_mismatch", "-", -1L)))
  }

  test("missing_bucket_aborts: NoSuchBucket (bucket_routing.rs:522-541)") {
    val out = run(Seq((1L, "nope", "g1")), noRules)
    assert(out(1L) == (("error", "no_such_bucket", "-", -1L)))
  }

  test("inputs unavailable: the group's backend load failure beats " +
    "everything (bucket_routing.rs:113-118)") {
    val out = run(Seq((1L, "nope", "g1")),
      Seq((1L, 0, "a/", false, "node", "x")), unavailable = Seq("g1"))
    assert(out(1L) == (("error", "inputs_unavailable", "-", -1L)))
  }

  test("rejects_duplicate_rules: second (exact,prefix) occurrence; " +
    "exact-flag flip de-duplicates (routing.rs:1049-1055)") {
    val out = run(
      reqs = Seq((1L, "b", "g1"), (2L, "b", "g1")),
      rules = Seq(
        (1L, 0, "a/", false, "class", "cold"),
        (1L, 1, "a/", false, "class", "tape"),
        (2L, 0, "a/", false, "class", "cold"),
        (2L, 1, "a/", true, "class", "tape")))
    assert(out(1L) == (("error", "duplicate_rule", "a/", -1L)))
    assert(out(2L) == (("ok", "-", "-", 2L))) // exact flip: not a dup
  }

  test("validates_class_names table (routing.rs:1058-1068)") {
    val ok = Seq("hot", "cold-2", "a", "x" * 32)
    val bad = Seq("", "Hot", "co ld", "cold_2", "x" * 33)
    val all = ok ++ bad
    val out = run(
      reqs = all.indices.map(i => (i.toLong, "b", "g1")),
      rules = all.zipWithIndex.map { case (c, i) =>
        (i.toLong, 0, "a/", false, "class", c) })
    ok.indices.foreach(i => assert(out(i.toLong)._1 == "ok", all(i)))
    bad.indices.foreach { j =>
      val i = (ok.size + j).toLong
      assert(out(i) == (("error", "invalid_class", bad(j), -1L)), bad(j))
    }
  }

  test("pass order: validate_rule_set clears the WHOLE vector before any " +
    "target check — a later duplicate beats an earlier node target " +
    "(routing.rs:572-580); and validation precedes the bucket read " +
    "(bucket_routing.rs:121-155)") {
    val out = run(
      reqs = Seq((1L, "b", "g1"), (2L, "nope", "g1")),
      rules = Seq(
        // rule 0 is a pass-2 error, rules 1+2 a pass-1 duplicate
        (1L, 0, "z/", false, "node", "op-1"),
        (1L, 1, "a/", false, "class", "cold"),
        (1L, 2, "a/", false, "class", "tape"),
        // invalid rules on a MISSING bucket: the rule error reports
        (2L, 0, "a/", false, "class", "BAD")))
    assert(out(1L) == (("error", "duplicate_rule", "a/", -1L)))
    assert(out(2L) == (("error", "invalid_class", "BAD", -1L)))
  }

  test("admittedBucketRules: last admitted writer wins per bucket") {
    val reqs = Seq((1L, "b", "g1"), (2L, "b", "g1"), (3L, "b", "g1"),
      (4L, "c", "g1"))
    val rules = Seq(
      (1L, 0, "a/", false, "class", "cold"),
      (2L, 0, "b/", false, "class", "hot"),
      (3L, 0, "c/", false, "node", "x"), // rejected: not a winner
      (4L, 0, "d/", false, "group", "gb-1"))
    val adm = Routing.admitTenantRules(
      reqs.toDF("req_id", "bucket", "group_id"),
      rules.toDF("req_id", "rule_idx", "key_prefix", "exact", "kind",
        "target"),
      Seq(("g1", "gb-1")).toDF("group_id", "backend_id"),
      Seq(("b", "g1"), ("c", "g1")).toDF("bucket", "owner_group"),
      Seq.empty[String].toDF("group_id"))
    val store = Routing.admittedBucketRules(adm,
      rules.toDF("req_id", "rule_idx", "key_prefix", "exact", "kind",
        "target"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(store == Set(("b", "b/"), ("c", "d/")))
  }
}
