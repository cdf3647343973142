package graft.catalog

import graft.SparkSpec

class GraphPruneSpec extends SparkSpec {
  import spark.implicits._

  test("tombstones: first DELETED wins the document slot, non-deleted never enqueue, store presence drives pruned") {
    val tmb = Seq(
      (1L, "gA", 10L, false), // earlier but not deleted -> ignored for dedup
      (2L, "gA", 11L, true),  // first deleted -> records doc 11
      (3L, "gA", 12L, true),  // duplicate -> skipped
      (4L, "gB", 20L, false), // never deleted -> gB absent
      (5L, "gC", 30L, true))  // deleted but store no longer holds it
      .toDF("seq", "graph_iri", "document_id", "deleted")
    val store = Seq("gA", "gB").map(Tuple1(_)).toDF("graph_iri")
    val idx = Seq((11L, "r1"), (11L, "r2"), (30L, "r1"))
      .toDF("document_id", "ref_iri")
    val got = GraphPrune.tombstones(tmb, store, idx)
      .orderBy("graph_iri").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("gA", "gC"))
    val a = got(0)
    assert(a.getAs[Long]("document_id") == 11L &&
      a.getAs[Long]("n_tombstones") == 3L &&
      a.getAs[Long]("n_deleted") == 2L &&
      a.getAs[Boolean]("pruned") &&
      a.getAs[Long]("n_iri_rows_pruned") == 2L, a.toString)
    val c = got(1)
    assert(!c.getAs[Boolean]("pruned") &&
      c.getAs[Long]("n_iri_rows_pruned") == 1L)
  }

  test("drain: raced-recreate drop, prune, representative reschedule with backoff; cap + hint trailers") {
    val jobs = Seq(
      ("gA", 0L, 900L, 1L),   // not deleted -> dropped, processed 0
      ("gB", 0L, 900L, 2L),   // prunes
      ("gC", 0L, 900L, 1L),   // prune fails -> reschedule from rep
      ("gC", 1L, 950L, 3L),   // the duplicate carries MORE attempts -> rep
      ("gD", 0L, 2000L, 0L))  // future -> hint only
      .toDF("graph_iri", "seq", "due_at_ms", "attempts")
    val lc = Seq(("gA", false), ("gB", true), ("gC", true), ("gD", true))
      .toDF("graph_iri", "deleted")
    val st = Seq(("gA", true), ("gB", true), ("gC", false), ("gD", true))
      .toDF("graph_iri", "prune_ok")
    val got = GraphPrune.drain(jobs, lc, st, nowMs = 1000L)
      .orderBy("graph_iri").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("gA").getAs[String]("verdict") == "dropped_not_deleted" &&
      got("gA").getAs[Long]("processed") == 0L)
    assert(got("gB").getAs[String]("verdict") == "pruned" &&
      got("gB").getAs[Long]("processed") == 1L)
    val c = got("gC")
    // rep = (3, 950); attempts 4 -> backoff 250*2^4 = 4000
    assert(c.getAs[String]("verdict") == "rescheduled" &&
      c.getAs[Long]("n_jobs") == 2L &&
      c.getAs[Long]("new_attempts") == 4L &&
      c.getAs[Long]("new_due_at_ms") == 5000L, c.toString)
    assert(!c.getAs[Boolean]("has_more_due") &&
      c.getAs[Long]("next_due_at_ms") == 2000L)
    assert(!got.contains("gD"))
  }
}
