package graft.catalog

import graft.SparkSpec

/** Source-connector CRUD (connectors/{get,list,replace,delete}_source_
  * connector.rs). */
class ConnectorCrudSpec extends SparkSpec {
  import spark.implicits._

  private lazy val connectors = Seq(
    ("g1", "c1", "alpha", "s3", true),
    ("g1", "c2", "beta", "http", false),
    ("g2", "c3", "gamma", "s3", true)
  ).toDF("group_id", "connector_id", "name", "kind", "has_secret")
  private lazy val referencing = Seq("c1").toDF("connector_id")

  private def run(rows: Seq[(String, String, String, String)]) =
    Connectors.crud(rows.toDF("req_id", "op", "group_id", "connector_id"),
      connectors, referencing)
      .collect().map(r => r.getString(0) -> r).toMap

  test("keyed reads: wrong group IS NotFound; list counts the group " +
    "(repository.rs:16-24)") {
    val out = run(Seq(
      ("r1", "get", "g1", "c1"),
      ("r2", "get", "g2", "c1"),   // wrong group
      ("r3", "get", "g1", "c9"),
      ("r4", "list", "g1", "x"),
      ("r5", "list", "g9", "x")))
    assert(out("r1").getString(2) == "Ok" && out("r1").getString(3) == "alpha"
      && out("r1").getBoolean(5))
    assert(out("r2").getString(2) == "NotFound")
    assert(out("r3").getString(2) == "NotFound")
    assert(out("r4").getLong(6) == 2L)
    assert(out("r5").getString(2) == "Ok" && out("r5").getLong(6) == 0L)
  }

  test("replace/delete: the referenced-by-object-version guard blocks " +
    "both; delete removes the secret pair " +
    "(replace:241, delete:194, delete_source_connector tests)") {
    val out = run(Seq(
      ("r1", "replace", "g1", "c1"),  // referenced
      ("r2", "replace", "g1", "c2"),
      ("r3", "delete", "g1", "c1"),   // referenced
      ("r4", "delete", "g1", "c2"),   // no secret: 1 row
      ("r5", "delete", "g2", "c3"),   // secret: 2 rows
      ("r6", "delete", "g1", "cX")))
    assert(out("r1").getString(2) == "ReferencedByObjectVersion")
    assert(out("r2").getString(2) == "Ok" && out("r2").getBoolean(7))
    assert(out("r3").getString(2) == "ReferencedByObjectVersion")
    assert(out("r4").getString(2) == "Ok" && out("r4").getLong(8) == 1L)
    assert(out("r5").getLong(8) == 2L)
    assert(out("r6").getString(2) == "NotFound")
  }
}
