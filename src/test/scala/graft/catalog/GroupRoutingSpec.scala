package graft.catalog

import graft.SparkSpec

/** PutGroupRouting / GetGroupRouting (reference
  * `operations/src/group_routing.rs` — operation tests at `:470-648`:
  * writes_group_default, rejects_operator_target, rejects_foreign_backend,
  * loads_own_backends, reads_absent_record, reads_stored_target). */
class GroupRoutingSpec extends SparkSpec {
  import spark.implicits._

  private val cleanIndex = Seq(("g1", "g1", "gb-1", false))

  private def admit(
      reqs: Seq[(Long, String, Option[String], Option[String])],
      index: Seq[(String, String, String, Boolean)] = cleanIndex,
      unavailable: Seq[String] = Nil) =
    Routing.admitGroupDefault(
      reqs.toDF("req_id", "group_id", "kind", "target"),
      index.toDF("idx_group_id", "record_group_id", "backend_id",
        "disabled"),
      unavailable.toDF("group_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2),
        Option(r.getString(3)).getOrElse("-"),
        Option(r.getString(4)).getOrElse("-"),
        Option(r.getString(5)).getOrElse("-"),
        Option(r.getString(6)).getOrElse("-")))).toMap

  test("writes_group_default: a class default stores even with zero owned " +
    "backends (group_routing.rs:470-499)") {
    val out = admit(Seq((1L, "g9", Some("class"), Some("cold"))),
      index = Nil)
    assert(out(1L) == (("ok", "-", "-", "class", "cold")))
  }

  test("the clear (no target) validates trivially and stores the record " +
    "(group_routing.rs:184-189, :218-221)") {
    val out = admit(Seq((1L, "g1", None, None)))
    assert(out(1L) == (("ok", "-", "-", "-", "-")))
  }

  test("rejects_operator_target (group_routing.rs:501-520)") {
    val out = admit(Seq((1L, "g1", Some("node"), Some("cold"))))
    assert(out(1L) == (("error", "operator_backend_target", "-", "-", "-")))
  }

  test("rejects_foreign_backend: unregistered id never stores " +
    "(group_routing.rs:543-565)") {
    val out = admit(Seq((1L, "g1", Some("group"), Some("gb-9")),
      (2L, "g1", Some("group"), Some("gb-1"))))
    assert(out(1L) == (("error", "foreign_backend", "gb-9", "-", "-")))
    assert(out(2L) == (("ok", "-", "-", "group", "gb-1")))
  }

  test("loads_own_backends: disabled and dangling-index rows are not " +
    "owned (group_routing.rs:567-621 + :110-114)") {
    val index = Seq(
      ("g1", "g1", "gb-1", false),
      ("g1", "g1", "gb-2", true), // disabled
      ("g1", "g5", "gb-3", false)) // dangling: record moved to g5
    val out = admit(Seq(
      (1L, "g1", Some("group"), Some("gb-2")),
      (2L, "g1", Some("group"), Some("gb-3")),
      (3L, "g1", Some("group"), Some("gb-1"))), index = index)
    assert(out(1L) == (("error", "foreign_backend", "gb-2", "-", "-")))
    assert(out(2L) == (("error", "foreign_backend", "gb-3", "-", "-")))
    assert(out(3L) == (("ok", "-", "-", "group", "gb-1")))
  }

  test("invalid class spelling rejects; loader failure wins the ladder") {
    val out = admit(Seq(
      (1L, "g1", Some("class"), Some("Hot!")),
      (2L, "g2", Some("class"), Some("hot"))),
      unavailable = Seq("g2"))
    assert(out(1L) == (("error", "invalid_class", "Hot!", "-", "-")))
    assert(out(2L) == (("error", "inputs_unavailable", "-", "-", "-")))
  }

  test("store: last ok write wins per group, a clear keeps the record; " +
    "read: absent record = no default, not an error " +
    "(group_routing.rs:302-407, reads_absent_record/reads_stored_target)") {
    val adm = Routing.admitGroupDefault(
      Seq(
        (1L, "g1", Some("class"), Some("hot")),
        (2L, "g1", Some("class"), Some("cold")),
        (3L, "g2", Some("class"), Some("hot")),
        (4L, "g2", Option.empty[String], Option.empty[String]), // clear
        (5L, "g3", Some("node"), Some("x"))) // rejected: never stores
        .toDF("req_id", "group_id", "kind", "target"),
      cleanIndex.toDF("idx_group_id", "record_group_id", "backend_id",
        "disabled"),
      Seq.empty[String].toDF("group_id"))
    val store = Routing.groupRoutingStore(adm)
    val out = Routing.getGroupRouting(
      Seq("g1", "g2", "g3", "g4").toDF("group_id"), store)
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1),
        Option(r.getString(2)).getOrElse("-"),
        Option(r.getString(3)).getOrElse("-"),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out("g1") == ((true, "class", "cold", 2L)))
    assert(out("g2") == ((true, "-", "-", 4L))) // cleared, record stands
    assert(out("g3") == ((false, "-", "-", -1L))) // write rejected
    assert(out("g4") == ((false, "-", "-", -1L))) // never written
  }
}
