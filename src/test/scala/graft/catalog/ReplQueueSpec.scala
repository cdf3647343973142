package graft.catalog

import graft.SparkSpec

class ReplQueueSpec extends SparkSpec {
  import spark.implicits._

  test("queue fold: strictly-greater (attempts, due) wins, earliest write " +
    "survives a full tie (queue.rs:401-406)") {
    val ins = Seq(
      ("a", 2L, 100L, 1L), ("a", 2L, 100L, 2L), // full tie -> seq 1 survives
      ("a", 2L, 99L, 3L),  // lower due loses despite equal attempts
      ("b", 1L, 500L, 4L), ("b", 3L, 10L, 5L)   // higher attempts beats due
    ).toDF("ident", "attempts", "due_at_ms", "seq")
    val m = ReplQueue.storeFold(ins).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m("a") == ((2L, 100L, 1L)))
    assert(m("b") == ((3L, 10L, 5L)))
  }

  test("due scan: key-order page cap, has_more_due, wake-up hint bounded " +
    "by the page cutoff (queue.rs:1916-2010)") {
    val store = Seq(
      ("a", 0L, 10L, 1L),   // due
      ("b", 0L, 999L, 2L),  // future, BEFORE cutoff -> contributes hint
      ("c", 0L, 20L, 3L),   // due (cutoff with limit 2)
      ("d", 0L, 500L, 4L),  // future, after cutoff -> ignored when truncated
      ("e", 0L, 30L, 5L)    // due but beyond page
    ).toDF("ident", "attempts", "due_at_ms", "seq")
    val page = ReplQueue.dueScan(store, nowMs = 100L, limit = 2).collect()
    assert(page.map(_.getString(0)).sorted.toSeq == Seq("a", "c"))
    assert(page.forall(_.getAs[Boolean]("has_more_due")))
    assert(page.head.getAs[Long]("next_due_at_ms") == 999L)
    // untruncated page: hint spans the whole keyspace
    val full = ReplQueue.dueScan(store, nowMs = 100L, limit = 10).collect()
    assert(full.length == 3 && !full.head.getAs[Boolean]("has_more_due") &&
      full.head.getAs[Long]("next_due_at_ms") == 500L)
  }
}
