package graft.catalog

import graft.SparkSpec

/** SetRealmQuota validation (set_realm_quota.rs:129-160,378-436). */
class SetQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def reqRow(id: String, realm: String = "r1", warn: Long = 85L,
      grace: Long = 110L, maxDev: Boolean = false,
      dflt: Option[Long] = Some(1000000L)) =
    (id, realm, warn, grace, maxDev, dflt)

  private val noOvr = Seq.empty[(String, Long, String, Option[Long],
    Option[Long])]
  private val noCaps = Seq.empty[(String, Long, String)]

  private def run(
      reqs: Seq[(String, String, Long, Long, Boolean, Option[Long])],
      ovr: Seq[(String, Long, String, Option[Long], Option[Long])] = noOvr,
      caps: Seq[(String, Long, String)] = noCaps,
      realms: Seq[String] = Seq("r1"),
      reducers: Seq[(String, String)] = Nil) = {
    val rd = if (reducers.isEmpty)
      Seq(("__none__", "__none__")).toDF("realm_id", "stored_target")
        .filter("false")
    else reducers.toDF("realm_id", "stored_target")
    SetQuota.verdicts(
      reqs.toDF("req_id", "realm_id", "warn_pct", "grace_pct",
        "has_max_devices", "default_quota_bytes"),
      ovr.toDF("req_id", "ord", "group_id", "quota_bytes", "grace"),
      caps.toDF("req_id", "ord", "user_id"),
      realms.toDF("realm_id"), rd, "g1")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
  }

  test("validate_quota runs BEFORE the document read: invalid config on a " +
    "missing realm is InvalidQuota (set_realm_quota.rs:129-140)") {
    val out = run(Seq(
      reqRow("q1", realm = "missing", warn = 0L),
      reqRow("q2", realm = "missing")))
    assert(out("q1")._1 == "InvalidQuota:warn_threshold")
    assert(out("q2")._1 == "RealmConfigNotFound")
  }

  test("scalar arms: warn bounds inclusive, grace floor, max_devices") {
    val out = run(Seq(
      reqRow("q1", warn = 1L), reqRow("q2", warn = 100L),
      reqRow("q3", warn = 101L), reqRow("q4", grace = 100L),
      reqRow("q5", grace = 99L), reqRow("q6", maxDev = true)))
    assert(out("q1")._1 == "Ok" && out("q2")._1 == "Ok")
    assert(out("q3")._1 == "InvalidQuota:warn_threshold")
    assert(out("q4")._1 == "Ok")
    assert(out("q5")._1 == "InvalidQuota:grace_factor")
    assert(out("q6")._1 == "InvalidQuota:max_devices")
  }

  test("override scan: FIRST failing row in declaration order decides; " +
    "within a row dup beats grace checks (BTreeSet insert first)") {
    val out = run(Seq(reqRow("q1"), reqRow("q2")),
      ovr = Seq(
        // q1: ord1 duplicates ord0's group, ord2 has bad grace -> dup wins
        ("q1", 0L, "ga", Some(1L), None),
        ("q1", 1L, "ga", Some(1L), Some(90L)),
        ("q1", 2L, "gb", Some(1L), Some(90L)),
        // q2: ord0 grace-without-quota fires before ord1's bad grace
        ("q2", 0L, "ga", None, Some(120L)),
        ("q2", 1L, "gb", Some(1L), Some(90L))))
    assert(out("q1")._1 == "InvalidQuota:dup_group_override")
    assert(out("q2")._1 == "InvalidQuota:grace_without_quota")
  }

  test("duplicate user cap; reducer target mismatch only on a stored " +
    "DIFFERENT target (absent state is fresh, always valid)") {
    val out = run(Seq(
      reqRow("q1"), reqRow("q2", realm = "r2"), reqRow("q3", realm = "r3")),
      caps = Seq(("q1", 0L, "u1"), ("q1", 1L, "u1")),
      realms = Seq("r1", "r2", "r3"),
      reducers = Seq(("r2", "other"), ("r3", "realm-config:r3")))
    assert(out("q1")._1 == "InvalidQuota:dup_user_cap")
    assert(out("q2")._1 == "TargetMismatch")
    assert(out("q3")._1 == "Ok")
  }

  test("probe ceiling (realm.rs:230-259): override wins incl. NULL quota = " +
    "unlimited, override grace else request grace, else default quota") {
    val out = run(Seq(
      reqRow("q1"), // override with own grace: 2000 * 150 / 100
      reqRow("q2"), // override without grace: 2000 * 110 / 100
      reqRow("q3"), // override NULL quota -> unlimited
      reqRow("q4", dflt = Some(3000L)), // no override -> default * grace
      reqRow("q5", dflt = None)),       // no override, no default -> NULL
      ovr = Seq(
        ("q1", 0L, "g1", Some(2000L), Some(150L)),
        ("q2", 0L, "g1", Some(2000L), None),
        ("q3", 0L, "g1", None, None)))
    assert(out("q1") == (("Ok", Some(3000L))))
    assert(out("q2") == (("Ok", Some(2200L))))
    assert(out("q3") == (("Ok", None)))
    assert(out("q4") == (("Ok", Some(3300L))))
    assert(out("q5") == (("Ok", None)))
  }
}
