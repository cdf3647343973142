package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-document CRUD ladders (create/delete/update_metadata_document.rs). */
class MetadataDocsSpec extends SparkSpec {
  import spark.implicits._

  test("path + IRI derivations (metadata_registry.rs:31-49)") {
    val got = Seq(("  /a/b/c//  ", "r1", "g1", "D1"))
      .toDF("p", "r", "g", "d")
      .select(MetadataDocs.normPath(col("p")),
        MetadataDocs.graphIriFor(col("d")),
        MetadataDocs.permissionPathFor(col("r"), col("g"), col("p"),
          col("d"))).collect().head
    assert(got.getString(0) == "a/b/c")
    assert(got.getString(1) == "https://w3id.org/aruna/D1")
    assert(got.getString(2) == "/r1/g/g1/meta/a/b/c@D1")
  }

  private val emptyAcc = Seq.empty[(String, String, String, String, Boolean,
    String)].toDF("document_id", "a_realm", "a_group", "a_path", "a_public",
    "a_event_id")

  private def createReq(rows: Seq[(Long, String, String, String, String,
      String, Boolean, Boolean, Boolean)]) =
    rows.toDF("seq", "req_id", "document_id", "realm_id", "group_id",
      "document_path", "public", "payload_valid", "skip_existing")

  test("create ladder: invalid-payload first, registry hit (skipped for " +
    "generated ids), fence replay vs conflict, placement fail-closed " +
    "(create_metadata_document.rs)") {
    val registry = Seq("D-taken").toDF("document_id")
    val acc = Seq(("D-acc", "r1", "g1", "a/b", true, "E-7"))
      .toDF("document_id", "a_realm", "a_group", "a_path", "a_public",
        "a_event_id")
    val plc = Seq(
      ("D-ok", "Metadata", "Realm", "r1", true),
      ("D-taken", "Metadata", "Realm", "r1", true),
      ("D-class", "Workspace", "Realm", "r1", true),
      ("D-scope", "Metadata", "Group", "g9", true),
      ("D-nohold", "Metadata", "Realm", "r1", false)
    ).toDF("document_id", "doc_class", "scope_kind", "scope_id", "is_holder")
    val out = MetadataDocs.createVerdicts(createReq(Seq(
      (1L, "r1", "D-ok", "r1", "g1", "/x/", true, false, false),   // invalid first
      (2L, "r2", "D-taken", "r1", "g1", "x", true, true, false),
      (3L, "r3", "D-taken", "r1", "g1", "x", true, true, true),    // skip check
      (4L, "r4", "D-acc", "r1", "g1", " /a/b/ ", true, true, false), // replay
      (5L, "r5", "D-acc", "r1", "g1", "a/b", false, true, false),  // mismatch
      (6L, "r6", "D-missing", "r1", "g1", "x", true, true, false), // no binding
      (7L, "r7", "D-class", "r1", "g1", "x", true, true, false),
      (8L, "r8", "D-scope", "r1", "g1", "x", true, true, false),
      (9L, "r9", "D-nohold", "r1", "g1", "x", true, true, false),
      (10L, "r10", "D-ok", "r1", "g1", "p", true, true, false))),
      registry, acc, plc).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "InvalidInput")
    assert(out("r2").getString(1) == "DocumentAlreadyExists")
    assert(out("r3").getString(1) == "Ok") // generated-id create skips the read
    assert(out("r4").getString(1) == "OkReplayed" &&
      out("r4").getString(6) == "E-7") // normalization proven by the match
    assert(out("r5").getString(1) == "DocumentAlreadyExists")
    assert(out("r6").getString(1) == "PlacementBindingUnavailable")
    assert(out("r7").getString(1) == "PlacementBindingUnavailable")
    assert(out("r8").getString(1) == "PlacementBindingUnavailable")
    assert(out("r9").getString(1) == "OriginHoldsNoBucket")
    assert(out("r10").getString(1) == "Ok" &&
      out("r10").getString(3) == "https://w3id.org/aruna/D-ok" &&
      out("r10").getString(5) == "/r1/g/g1/meta/p@D-ok")
  }

  test("create in-batch fold: later same-id requests replay on exact match, " +
    "conflict otherwise; a failed first attempt leaves no fence") {
    val plc = Seq(("D1", "Metadata", "Realm", "r1", true),
      ("D2", "Metadata", "Realm", "r1", true))
      .toDF("document_id", "doc_class", "scope_kind", "scope_id", "is_holder")
    val out = MetadataDocs.createVerdicts(createReq(Seq(
      (1L, "r1", "D1", "r1", "g1", "p", true, true, false),  // winner
      (2L, "r2", "D1", "r1", "g1", "/p/", true, true, false), // exact -> replay
      (3L, "r3", "D1", "r1", "g1", "q", true, true, false),  // path differs
      (4L, "r4", "D2", "r1", "g1", "p", true, false, false), // invalid: no fence
      (5L, "r5", "D2", "r1", "g1", "p", true, true, false))), // so this creates
      Seq.empty[String].toDF("document_id"), emptyAcc, plc).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("r1") == "Ok")
    assert(out("r2") == "OkReplayed")
    assert(out("r3") == "DocumentAlreadyExists")
    assert(out("r4") == "InvalidInput")
    assert(out("r5") == "Ok")
  }

  test("delete: keyed read, in-batch second delete NotFound, tombstone " +
    "accounting (delete_metadata_document.rs:170-298,364)") {
    val reg = Seq(("g1", "d1", "graph:d1", "E-9"), ("g1", "d2", "graph:d2", "E-8"))
      .toDF("group_id", "document_id", "graph_iri", "last_event_id")
    val out = MetadataDocs.deleteVerdicts(Seq(
      (1L, "r1", "g1", "d1"), (2L, "r2", "g1", "d1"), // dup in batch
      (3L, "r3", "g2", "d2"),                         // wrong group
      (4L, "r4", "g1", "dX")).toDF("seq", "req_id", "group_id", "document_id"),
      reg).collect().map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "Ok" &&
      out("r1").getString(3) == "E-9" && out("r1").getLong(6) == 3L &&
      out("r1").getString(4) == "Deleted" && out("r1").getBoolean(5))
    assert(out("r2").getString(1) == "DocumentNotFound")
    assert(out("r3").getString(1) == "DocumentNotFound")
    assert(out("r4").getString(1) == "DocumentNotFound")
  }

  test("update: NotFound before validation, crate flag, real entity rules, " +
    "public flip + audit (update_metadata_document.rs:130-169,377)") {
    val reg = Seq(("g1", "d1", "graph:d1", true))
      .toDF("group_id", "document_id", "graph_iri", "public")
    def req(id: String, doc: String, pub: Boolean, mut: String,
        json: String, crateOk: Boolean) =
      (id, "g1", doc, pub, mut, json, crateOk)
    val out = MetadataDocs.updateVerdicts(Seq(
      req("r1", "dX", false, "UpsertDataEntity", "{oops", true), // NotFound wins
      req("r2", "d1", false, "ReplaceRoCrate", null, false),
      req("r3", "d1", false, "ReplaceRoCrate", null, true),
      req("r4", "d1", true, "UpsertDataEntity",
        """{"@id":"e","@type":"T","name":"n"}""", true),
      req("r5", "d1", false, "UpsertContextualEntity",
        """{"@id":"e","@type":[],"name":"n"}""", true))
      .toDF("req_id", "group_id", "document_id", "public", "mutation",
        "jsonld", "crate_valid"), reg).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("r1").getString(1) == "DocumentNotFound")
    assert(out("r2").getString(1) == "InvalidInput:crate")
    assert(out("r3").getString(1) == "Ok" &&
      !out("r3").getBoolean(3) && out("r3").getBoolean(4)) // flip true->false
    assert(out("r4").getString(1) == "Ok" && !out("r4").getBoolean(4) &&
      out("r4").getString(5) == "UpsertDataEntity" && out("r4").getBoolean(6))
    assert(out("r5").getString(1) == "InvalidInput:bad_type")
  }

  test("plan: registry/acceptance/placement keyspaces probed, never " +
    "broadcast whole") {
    val reg = spark.range(50000).selectExpr("concat('D', id) AS document_id")
    val acc = spark.range(50000).selectExpr(
      "concat('D', id) AS document_id", "'r1' AS a_realm", "'g1' AS a_group",
      "'p' AS a_path", "true AS a_public", "concat('E', id) AS a_event_id")
    val plc = spark.range(50000).selectExpr(
      "concat('D', id) AS document_id", "'Metadata' AS doc_class",
      "'Realm' AS scope_kind", "'r1' AS scope_id", "true AS is_holder")
    val out = MetadataDocs.createVerdicts(createReq(Seq(
      (1L, "r1", "D7", "r1", "g1", "p", true, true, false))), reg, acc, plc)
    assert(out.collect().length == 1)
    val bad = out.queryExecution.executedPlan.collect {
      case p if p.nodeName.contains("BroadcastExchange") &&
        p.collectLeaves().exists(_.nodeName.contains("Range")) &&
        !p.toString.contains("Join") => p
    }
    assert(bad.isEmpty,
      s"document keyspace broadcast without a probe join:\n${bad.mkString}")
  }
}
