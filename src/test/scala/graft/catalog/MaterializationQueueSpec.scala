package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the materialization-queue ladder on hand-built micro fixtures —
  * each reference rule exercised in isolation so an oracle-level failure
  * in mz1/mz2 localizes to a single arm. */
class MaterializationQueueSpec extends SparkSpec {
  import spark.implicits._

  private val Now = 1000L

  private def emptyStatus: DataFrame =
    Seq.empty[(Long, Long, Long, String)]
      .toDF("doc_id", "event_id", "attempts", "state")
  private def emptyDl: DataFrame =
    Seq.empty[(Long, Long, Long)].toDF("doc_id", "event_id", "parks")
  private def lc(rows: (String, Boolean)*): DataFrame =
    rows.toDF("graph_iri", "deleted")

  private def drain(jobs: Seq[(Long, Long, Long, Long, Long, Long)],
      status: DataFrame = null, events: Seq[(Long, Long, String, String)],
      lifecycle: DataFrame = null, dl: DataFrame = null)
      : Map[(Long, Long), org.apache.spark.sql.Row] = {
    val j = jobs.toDF("doc_id", "event_id", "due_at_ms", "attempts",
      "failures", "parks")
    val e = events.map { case (d2, ev2, g, o) => (d2, ev2, g, "p0", o) }
      .toDF("doc_id", "event_id", "graph_iri", "peers", "apply_outcome")
    val out = MaterializationQueue.drain(j,
      Option(status).getOrElse(emptyStatus), e,
      Option(lifecycle).getOrElse(lc("g" -> false)),
      Option(dl).getOrElse(emptyDl), Now)
    out.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("event_id")) -> r).toMap
  }

  test("drain: apply arms — materialized, terminal, application park at 10, transient reschedule") {
    val got = drain(
      jobs = Seq((1L, 0L, 900L, 2L, 1L, 0L), (2L, 0L, 900L, 0L, 2L, 0L),
        (3L, 0L, 900L, 3L, 9L, 0L), (4L, 0L, 900L, 1L, 9L, 1L)),
      events = Seq((1L, 0L, "g", "ok"), (2L, 0L, "g", "terminal"),
        (3L, 0L, "g", "application"), (4L, 0L, "g", "transient")))
    val m = got((1L, 0L))
    assert(m.getAs[String]("verdict") == "materialized" &&
      m.getAs[String]("new_state") == "materialized" &&
      m.getAs[Long]("new_attempts") == 3L &&
      m.getAs[Long]("new_failures") == 1L &&
      m.getAs[Boolean]("job_deleted") && m.getAs[Boolean]("sidecar_deleted") &&
      m.getAs[Boolean]("status_written"))
    val t = got((2L, 0L))
    assert(t.getAs[String]("verdict") == "failed_terminal" &&
      t.getAs[String]("new_state") == "failed" &&
      t.getAs[Long]("new_failures") == 2L, t.toString)
    // 9 failures + 1 application failure = the 10-cap -> parked; backoff
    // 60s * 2^(parks-1): fresh park -> parks 1 -> 60_000
    val p = got((3L, 0L))
    assert(p.getAs[String]("verdict") == "parked" &&
      p.getAs[Long]("new_failures") == 10L &&
      p.getAs[Long]("new_parks") == 1L &&
      p.getAs[Long]("requeue_at_ms") == Now + 60000L &&
      p.getAs[String]("new_state") == "failed", p.toString)
    // transient does NOT spend budget: 9 stays 9, reschedules with the
    // queue backoff 250 * 2^min(attempts+1,7) = 250*4 = 1000
    val r = got((4L, 0L))
    assert(r.getAs[String]("verdict") == "rescheduled" &&
      r.getAs[Long]("new_failures") == 9L &&
      r.getAs[String]("new_state") == "pending" &&
      r.getAs[Long]("next_due_at_ms") == Now + 1000L &&
      !r.getAs[Boolean]("job_deleted"), r.toString)
  }

  test("drain: ordering — future older job blocks, deferral stops the group") {
    val got = drain(
      // doc 1: ev0 due later (future), ev1+ev2 due now -> ev1 blocked,
      // ev2 behind the stop -> not_attempted
      // doc 2: ev0 transient (reschedules), ev1 due -> not_attempted
      jobs = Seq((1L, 0L, 2000L, 0L, 0L, 0L), (1L, 1L, 900L, 0L, 0L, 0L),
        (1L, 2L, 900L, 0L, 0L, 0L),
        (2L, 0L, 900L, 0L, 0L, 0L), (2L, 1L, 900L, 0L, 0L, 0L)),
      events = Seq((1L, 0L, "g", "ok"), (1L, 1L, "g", "ok"),
        (1L, 2L, "g", "ok"), (2L, 0L, "g", "transient"),
        (2L, 1L, "g", "ok")))
    assert(!got.contains((1L, 0L))) // not due -> not in the page
    assert(got((1L, 1L)).getAs[String]("verdict") == "blocked" &&
      !got((1L, 1L)).getAs[Boolean]("attempted"))
    assert(got((1L, 2L)).getAs[String]("verdict") == "not_attempted")
    assert(got((2L, 0L)).getAs[String]("verdict") == "rescheduled")
    assert(got((2L, 1L)).getAs[String]("verdict") == "not_attempted")
  }

  test("drain: a future older job with a MISSING event is an orphan and does not block") {
    val got = drain(
      jobs = Seq((1L, 0L, 2000L, 0L, 0L, 0L), (1L, 1L, 900L, 0L, 0L, 0L)),
      events = Seq((1L, 1L, "g", "ok"))) // ev0's create event vanished
    assert(got((1L, 1L)).getAs[String]("verdict") == "materialized")
  }

  test("drain: obsolescence — final status completes silently, newer retry drops the stale row") {
    val status = Seq((1L, 3L, 0L, "materialized"), (2L, 0L, 5L, "pending"),
      (3L, 5L, 0L, "pending")).toDF("doc_id", "event_id", "attempts", "state")
    val got = drain(
      jobs = Seq((1L, 2L, 900L, 0L, 0L, 0L),   // obsolete: final at ev3 >= 2
        (2L, 0L, 900L, 2L, 0L, 0L),            // retry advanced: 5 > 2
        (3L, 1L, 900L, 0L, 0L, 0L)),           // pending at HIGHER event
      status = status,
      events = Seq((1L, 2L, "g", "ok"), (2L, 0L, "g", "ok"),
        (3L, 1L, "g", "ok")))
    val o = got((1L, 2L))
    assert(o.getAs[String]("verdict") == "obsolete_final" &&
      o.getAs[Boolean]("job_deleted") && o.getAs[Boolean]("sidecar_deleted") &&
      !o.getAs[Boolean]("status_written"), o.toString)
    val ra = got((2L, 0L))
    assert(ra.getAs[String]("verdict") == "retry_advanced" &&
      ra.getAs[Boolean]("job_deleted") &&
      !ra.getAs[Boolean]("sidecar_deleted") && !ra.getAs[Boolean]("attempted"),
      ra.toString)
    // a pending status at a LATER event silences the write but the job
    // still completes (should_write_final guard, :1878-1889)
    val hs = got((3L, 1L))
    assert(hs.getAs[String]("verdict") == "materialized" &&
      !hs.getAs[Boolean]("status_written"), hs.toString)
  }

  test("drain: a stale retry row blocks later events of the same document") {
    // doc 1: ev0's due row is stale (status pending at ev0 with MORE
    // attempts); ev1 must wait for the newer ev0 retry to run first
    val status = Seq((1L, 0L, 5L, "pending"))
      .toDF("doc_id", "event_id", "attempts", "state")
    val got = drain(
      jobs = Seq((1L, 0L, 900L, 1L, 0L, 0L), (1L, 1L, 900L, 0L, 0L, 0L)),
      status = status,
      events = Seq((1L, 0L, "g", "ok"), (1L, 1L, "g", "ok")))
    assert(got((1L, 0L)).getAs[String]("verdict") == "retry_advanced")
    assert(got((1L, 1L)).getAs[String]("verdict") == "blocked")
  }

  test("drain: missing event and deleted graph complete; park merges the previous dead letter's count") {
    val dl = Seq((3L, 0L, 4L)).toDF("doc_id", "event_id", "parks")
    val got = drain(
      jobs = Seq((1L, 0L, 900L, 0L, 0L, 0L), (2L, 0L, 900L, 0L, 0L, 0L),
        (3L, 0L, 900L, 0L, 10L, 2L)),
      events = Seq((2L, 0L, "gdel", "ok"), (3L, 0L, "g", "transient")),
      lifecycle = lc("g" -> false, "gdel" -> true), dl = dl)
    val miss = got((1L, 0L))
    assert(miss.getAs[String]("verdict") == "event_missing" &&
      !miss.getAs[Boolean]("status_written") &&
      miss.getAs[Boolean]("sidecar_deleted"))
    val gd = got((2L, 0L))
    assert(gd.getAs[String]("verdict") == "graph_deleted" &&
      gd.getAs[String]("new_state") == "failed" &&
      gd.getAs[Boolean]("status_written"))
    // already at the cap -> parks even on a transient failure; park count
    // = max(dead letter 4, job 2) + 1 = 5 -> backoff 60s * 2^4 = 960s
    val pk = got((3L, 0L))
    assert(pk.getAs[String]("verdict") == "parked" &&
      pk.getAs[Long]("new_parks") == 5L &&
      pk.getAs[Long]("requeue_at_ms") == Now + 960000L, pk.toString)
  }

  test("drain: sync dedup — one sync per graph, last materialized job wins") {
    val got = drain(
      jobs = Seq((1L, 0L, 900L, 0L, 0L, 0L), (2L, 0L, 900L, 0L, 0L, 0L),
        (3L, 0L, 900L, 0L, 0L, 0L)),
      events = Seq((1L, 0L, "gA", "ok"), (2L, 0L, "gA", "ok"),
        (3L, 0L, "gB", "ok")),
      lifecycle = lc("gA" -> false, "gB" -> false))
    assert(!got((1L, 0L)).getAs[Boolean]("sync_scheduled"))
    assert(got((2L, 0L)).getAs[Boolean]("sync_scheduled"))
    assert(got((3L, 0L)).getAs[Boolean]("sync_scheduled"))
  }

  test("dead-letter requeue: waiting, dropped, superseded, requeued") {
    val letters = Seq(
      (1L, 0L, 3L, 2000L),  // not due yet
      (2L, 0L, 1L, 900L),   // event vanished
      (3L, 0L, 2L, 900L),   // superseded: final beyond the event
      (4L, 0L, 2L, 900L),   // superseded: materialized AT the event
      (5L, 0L, 2L, 900L),   // failed AT the event -> NOT superseded
      (6L, 0L, 4L, 900L))   // requeues
      .toDF("doc_id", "event_id", "parks", "requeue_at_ms")
    val status = Seq((3L, 2L, 0L, "failed"), (4L, 0L, 0L, "materialized"),
      (5L, 0L, 0L, "failed"))
      .toDF("doc_id", "event_id", "attempts", "state")
    val events = Seq((1L, 0L), (3L, 0L), (4L, 0L), (5L, 0L), (6L, 0L))
      .map { case (a, b) => (a, b, "g", "p0", "ok") }
      .toDF("doc_id", "event_id", "graph_iri", "peers", "apply_outcome")
    val got = MaterializationQueue
      .requeueDeadLetters(letters, status, events, Now)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[String]("verdict") == "waiting" &&
      !got(1L).getAs[Boolean]("letter_deleted"))
    assert(got(2L).getAs[String]("verdict") == "dropped_missing_event" &&
      got(2L).getAs[Boolean]("letter_deleted"))
    assert(got(3L).getAs[String]("verdict") == "superseded")
    assert(got(4L).getAs[String]("verdict") == "superseded")
    // a Failed status at the SAME event is the park's own terminal status,
    // not progress — the letter must requeue (dead_letter_superseded)
    assert(got(5L).getAs[String]("verdict") == "requeued")
    val rq = got(6L)
    assert(rq.getAs[String]("verdict") == "requeued" &&
      rq.getAs[Long]("job_attempts") == 0L &&
      rq.getAs[Long]("job_failures") == 9L &&
      rq.getAs[Long]("job_parks") == 4L, rq.toString)
  }
}
