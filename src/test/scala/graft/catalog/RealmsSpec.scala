package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Realm genesis + token issuance (create_realm.rs, create_token.rs). */
class RealmsSpec extends SparkSpec {
  import spark.implicits._

  private def realmReq(rows: Seq[(String, String, String, String,
      Option[String], Option[Long], Option[String], Option[String])]) =
    Realms.createRealmPlan(rows.toDF("req_id", "realm_id", "node_id",
      "description", "node_location", "node_weight", "oidc1_id", "oidc2_id"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("location normalization: trim, empty-after-trim unset, 64-char " +
    "boundary (placement.rs:33-51,622-628)") {
    val out = realmReq(Seq(
      ("r1", "rA", "n1", "d", Some("  eu-1  "), None, None, None),
      ("r2", "rA", "n1", "d", Some("   "), None, None, None),
      ("r3", "rA", "n1", "d", Some("y" * 64), None, None, None),  // at limit
      ("r4", "rA", "n1", "d", Some("x" * 65), None, None, None),  // over
      ("r5", "rA", "n1", "d", None, None, None, None)))
    assert(out("r1").getString(1) == "Ok" && out("r1").getString(2) == "eu-1")
    assert(out("r2").getString(2) == "")
    assert(out("r3").getString(1) == "Ok")
    assert(out("r4").getString(1) == "NodeLocationTooLong")
    assert(out("r5").getString(2) == "")
  }

  test("weight clamp 1..=10000, absent defaults to 100 — NOT clamped to 1") {
    val out = realmReq(Seq(
      ("r1", "rA", "n1", "d", None, Some(0L), None, None),
      ("r2", "rA", "n1", "d", None, Some(99999L), None, None),
      ("r3", "rA", "n1", "d", None, Some(250L), None, None),
      ("r4", "rA", "n1", "d", None, None, None, None)))
    assert(out("r1").getLong(3) == 1L)
    assert(out("r2").getLong(3) == 10000L)
    assert(out("r3").getLong(3) == 250L)
    assert(out("r4").getLong(3) == 100L)
  }

  test("genesis constants: root pool spans the band space, creator range " +
    "is the first band, handles 3/1, event counts 15+n/16+n " +
    "(create_realm.rs:110-147, realm.rs:423-465)") {
    val out = realmReq(Seq(
      ("r1", "rA", "n1", "d", None, None, Some("idp-b"), Some("adp-a")),
      ("r2", "rA", "n1", "d", None, None, None, None)))
    val r1 = out("r1")
    assert(r1.getLong(4) == 3L && r1.getLong(5) == 3L + 1023L * 1024L)
    assert(r1.getLong(6) == 3L && r1.getLong(7) == 1027L)
    assert(r1.getLong(8) == 3L && r1.getLong(9) == 1L)
    assert(r1.getString(10) == "realm_admin" &&
      r1.getString(11) == "/rA/admin/**")
    assert(r1.getLong(12) == 2L && r1.getLong(13) == 4L)
    assert(r1.getString(14) == "adp-a,idp-b") // providers sort by id
    assert(r1.getLong(15) == 17L && r1.getLong(16) == 18L)
    assert(out("r2").getLong(15) == 15L && out("r2").getLong(16) == 16L)
  }

  test("tokens: Local rejected, expiry strictly-after, 12 CALENDAR months " +
    "default, Server claim shape (create_token.rs:46-125)") {
    // 2023-11-14T22:13:20Z -> +12 months = 2024-11-14T22:13:20Z
    val iat = 1700000000L
    val out = Realms.tokenVerdicts(Seq(
      ("r1", "Local", iat, Option.empty[Long]),
      ("r2", "Management", iat, Some(iat)),      // equal fails
      ("r3", "Management", iat, Some(iat + 1)),  // strictly after ok
      ("r4", "Management", iat, Option.empty[Long]),
      ("r5", "Server", iat, Option.empty[Long]))
      .toDF("req_id", "capability", "iat_s", "expiry_s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "NotEnoughCapabilities")
    assert(out("r2").getString(1) == "InvalidTimestamp")
    assert(out("r3").getString(1) == "Ok" && out("r3").getLong(2) == iat + 1)
    // calendar-month add: 2024 is a leap year but Nov 14 exists in both —
    // the delta is 366 days (2023-11-14 .. 2024-11-14 spans Feb 29)
    assert(out("r4").getLong(2) == iat + 366L * 86400L)
    assert(!out("r4").getBoolean(3) && !out("r4").getBoolean(4))
    assert(out("r5").getBoolean(3) && out("r5").getBoolean(4))
  }
}
