package graft.catalog

import graft.SparkSpec

/** Blob-cleanup queue drain (blob/cleanup.rs:111-307). */
class BlobCleanupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val removed = Seq("be-x").toDF("backend")

  private def run(rows: Seq[(String, String, Boolean, String, Boolean,
      Boolean, Boolean, Boolean, Boolean)]) =
    BlobCleanup.drain(rows.toDF("row_id", "work_kind", "decodable",
      "backend", "delete_ok", "dht_ok", "owner_readable", "owner_present",
      "owner_same"), removed)
      .collect().map(r => r.getString(0) ->
        ((r.getString(2), Option(r.get(3)), r.getBoolean(4)))).toMap

  test("drops never wedge the drain; delete outcome decides; failed rows " +
    "stay queued (cleanup.rs:128-163)") {
    val out = run(Seq(
      ("r1", "DeleteBlob", false, "be-1", true, true, true, false, false),
      ("r2", "DeleteBlob", true, "be-x", true, true, true, false, false),
      ("r3", "DeleteBlob", true, "be-1", true, true, true, false, false),
      ("r4", "DeleteBlob", true, "be-1", false, true, true, false, false),
      ("r5", "RegisterDht", true, null, true, false, true, false, false)))
    assert(out("r1") == (("Dropped", None, true)))
    assert(out("r2") == (("Dropped", None, true)))
    assert(out("r3") == (("Processed", Some("deleted"), true)))
    assert(out("r4") == (("Failed", None, false)))
    assert(out("r5") == (("Failed", None, false)))
  }

  test("reconcile: unreadable owner waits, the committed record naming " +
    "THIS copy keeps it, absent/different-copy records delete " +
    "(owns_write, cleanup.rs:209-307)") {
    val out = run(Seq(
      ("r1", "ReconcileWrite", true, "be-1", true, true, false, false, false),
      ("r2", "ReconcileWrite", true, "be-1", true, true, true, true, true),
      ("r3", "ReconcileWrite", true, "be-1", true, true, true, false, false),
      ("r4", "ReconcileWrite", true, "be-1", true, true, true, true, false),
      ("r5", "ReconcileWrite", true, "be-1", false, true, true, true, false)))
    assert(out("r1") == (("Failed", None, false)))        // nothing proven
    assert(out("r2") == (("Processed", Some("kept"), true)))
    assert(out("r3") == (("Processed", Some("deleted"), true))) // absent
    assert(out("r4") == (("Processed", Some("deleted"), true))) // other copy
    assert(out("r5") == (("Failed", None, false)))        // delete refused
  }
}
