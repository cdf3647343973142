package graft.catalog

import graft.SparkSpec

class SyncOutboxSpec extends SparkSpec {
  import spark.implicits._

  private def outbox(rows: (String, String, String, Long, String, String,
      Boolean, String, String, Long)*) =
    rows.toDF("outbox_id", "kind", "origin_node", "origin_seq", "target",
      "topic", "uses_shard", "peers", "live_holders", "enq_ms")

  private val topics = Seq(
    ("t-live", true, true),
    ("t-nogenesis", true, false),
    ("t-lost", false, false)
  ).toDF("topic", "held", "exists")

  test("outbox drain: verdict ladder incl. unknown-config topic, stuck " +
    "threshold, peer re-resolution, FIFO sub-batches " +
    "(task_incoming.rs:293-368,755-840)") {
    val now = 1000000L
    val ob = outbox(
      ("01", "upsert", null, 0L, "d1", "t-live", true, "p2,p9", "h1,h2", 0L),
      ("02", "upsert", null, 0L, "d2", "t-nogenesis", true, "p1", "", 800000L),
      ("03", "upsert", null, 0L, "d3", "t-nogenesis", true, "p1", "", 0L),
      ("04", "upsert", null, 0L, "d4", "t-lost", true, "p1", "", 0L),
      ("05", "upsert", null, 0L, "d5", "t-unknown", true, "p1", "", 0L),
      ("06", "delete", null, 0L, "d6", "t-lost", false, "p3", "", 0L),
      // empty stamp keeps realm-default semantics even with live holders
      ("07", "upsert", null, 0L, "d7", "t-live", true, "", "h1,h2", 0L),
      // admin records order by (origin_node, origin_seq) before outbox id
      ("09", "admin", "nodeA", 1L, "d8", "t-live", true, "h1,h2", "h1,h2", 0L),
      ("08", "admin", "nodeB", 0L, "d9", "t-live", true, "h1,h2", "h1,h2", 0L)
    )
    val out = SyncOutbox.drainPlan(ob, topics, now, subbatchSize = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("01").getString(4) == "publish" &&
      out("01").getString(6) == "h1,h2") // re-resolved
    assert(out("02").getString(4) == "deferred" &&
      !out("02").getBoolean(5)) // young, not stuck
    assert(out("03").getString(4) == "deferred" &&
      out("03").getBoolean(5)) // >= 300s, stuck
    assert(out("04").getString(4) == "undeliverable")
    assert(out("05").getString(4) == "deferred") // unknown config: retry
    assert(out("06").getString(4) == "publish" &&
      out("06").getString(6) == "p3") // non-shard: stamp kept
    assert(out("07").getString(6) == "") // empty stamp NOT re-resolved
    // group h1,h2: FIFO = admin(nodeA,1) 09, admin(nodeB,0) 08, upsert 01
    // subbatch size 2 -> 09,08 in batch 0; 01 in batch 1
    assert(out("09").getLong(7) == 0L && out("08").getLong(7) == 0L &&
      out("01").getLong(7) == 1L)
  }
}
