package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, doc: Long, event_type: String, occurred_at_ms: Long)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap boundary exact, singleton sessions, exact value totals") {
    // user 1: events at t=0s, 10s, 10s+gap (still same session: gap is
    // INCLUSIVE <=), then +gap+1us later (new session). user 2: singleton.
    val gap = 60L * 1000000L
    val rows = Seq(
      (1L, 0L, 1L, 1.5),
      (2L, 10L * 1000000L, 1L, 2.25),
      (3L, 10L * 1000000L + gap, 1L, 4.0),       // exactly gap later -> same
      (4L, 10L * 1000000L + 2 * gap + 1L, 1L, 8.0), // gap+1us -> new session
      (5L, 999L, 2L, 16.0))
      .map { case (id, tus, u, v) => (id, tus, u, v) }
      .toDF("event_id", "tus", "user_id", "value")
    val got = Sessionize.sessionize(rows, "user_id", col("tus"), "event_id",
        "value", gapMicros = gap)
      .orderBy(col("user_id"), col("session_start_us")).collect()
    assert(got.length == 3, s"expected 3 sessions: ${got.toSeq}")
    val s1 = got(0)
    assert(s1.getAs[Long]("session_start_us") == 0L &&
      s1.getAs[Long]("n_events") == 3L &&
      s1.getAs[Long]("duration_us") == 10L * 1000000L + gap &&
      s1.getAs[Double]("total_value") == 7.75, s"first session wrong: $s1")
    assert(got(1).getAs[Long]("n_events") == 1L, "second session is the solo event")
    assert(got(2).getAs[Long]("n_events") == 1L &&
      got(2).getAs[Double]("total_value") == 16.0)
  }

  test("asof join: latest prior row attached, inclusive ties, no future leakage") {
    val right = Seq(
      (100L, 10L, 1L, "v1"),
      (101L, 20L, 1L, "v2"),
      (102L, 20L, 1L, "v2b"),  // same (key, ts) — higher seq must win
      (103L, 99L, 2L, "other"))
      .toDF("event_id", "ts_us", "user_id", "tag")
    val left = Seq(
      (1L, 5L, 1L),    // before any right row -> null
      (2L, 10L, 1L),   // equal ts -> INCLUSIVE match (v1)
      (3L, 25L, 1L),   // between: latest prior is the seq-101/102 pair
      (4L, 50L, 2L))   // user 2: right row is in the future -> null
      .toDF("event_id", "ts_us", "user_id")
    val got = Sessionize.asofJoin(left, right, "user_id", "ts_us", "event_id")
      .select(col("event_id"), col("asof.event_id").as("r_id"),
        col("asof.tag").as("tag"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2))))).toMap
    assert(got(1L).isEmpty, "no prior row must attach nothing")
    assert(got(2L).contains((100L, "v1")), s"inclusive tie failed: ${got(2L)}")
    assert(got(3L).contains((102L, "v2b")), s"same-ts tie must pick max seq: ${got(3L)}")
    assert(got(4L).isEmpty, s"future right row leaked: ${got(4L)}")
    // plan shape: ONE exchange total — the union trick never range-joins
    val plan = Sessionize.asofJoin(left, right, "user_id", "ts_us", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of join degenerated to a product:\n$plan")
  }

  test("clock-skew: future deferred, past kept, threshold-equal accepted (projector.rs:1729)") {
    val now = 1_000_000L
    assert(!Projector.exceedsClockSkew(now, now))
    assert(!Projector.exceedsClockSkew(now + 300_000, now)) // exactly at threshold
    assert(Projector.exceedsClockSkew(now + 300_001, now)) // beyond → deferred
    assert(!Projector.exceedsClockSkew(now - 100_000_000, now)) // old data never dropped
  }

  test("drain: deferred events apply once the clock catches up — never dropped") {
    val events = Seq(
      Ev(1, 10, "create", 1000L),
      Ev(2, 11, "create", 500_000L) // 499s ahead of now=1000 → deferred
    ).toDF
    val (applied1, pending1) = Projector.partition(events, "occurred_at_ms", nowMs = 1000L)
    assert(applied1.count() == 1 && pending1.count() == 1)
    // retry later (clock advanced past skew window): pending drains fully
    val (applied2, pending2) = Projector.drain(pending1, "occurred_at_ms", nowMs = 300_000L)
    assert(applied2.count() == 1 && pending2.count() == 0)
  }

  test("streaming IVF index maintenance: streamed vectors are probe-visible after the batch append") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("ivf-stream-").toString
    val base = graft.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 400)
    graft.similarity.Ann.writeIvfIndex(base, path)
    // copy two base vectors under fresh ids and stream them in; each batch
    // appends under the index's frozen codebook (the ingest path ann10
    // gates in batch form)
    val donors = base.filter(col("vec_id").isin(123L, 250L))
      .collect().map(r => (r.getLong(0) + 9000L, r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.similarity.Ann.appendIvfIndex(
          spark.read.parquet(path), batch, path)
        ()
      }
      .start()
    mem.addData(donors(0))
    q.processAllAvailable()
    mem.addData(donors(1))
    q.processAllAvailable()
    q.stop()
    // probe FROM a streamed id: its donor twin must rank first at cosine 1
    val idx = spark.read.parquet(path)
    donors.foreach { case (sid, _) =>
      val top = graft.similarity.Ann
        .topKCosineIvfIndexed(idx, queryId = sid, k = 3)
        .head()
      assert(top.getLong(0) == sid - 9000L && top.getDouble(1) > 0.999999,
        s"streamed $sid not served or donor not top: $top")
    }
  }

  test("structured streaming: watermark dedup + foreachBatch projection upsert") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val store = scala.collection.mutable.Map[Long, (Long, String)]() // doc -> (event_id, type)
    val applied = scala.collection.mutable.Set[Long]()
    val q = mem.toDF()
      .dropDuplicates("event_id")
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = Projector.projectRegistry(
          Projector.dedupEvents(batch.filter(!col("event_id").isin(applied.toSeq: _*))),
          "doc").collect()
        rows.foreach { r =>
          val doc = r.getAs[Long]("doc")
          val id = r.getAs[Long]("event_id")
          val existing = store.get(doc)
          if (existing.forall(_._1 <= id)) store(doc) = (id, r.getAs[String]("event_type"))
        }
        batch.collect().foreach(r => applied += r.getAs[Long]("event_id"))
        ()
      }
      .start()
    mem.addData(Ev(1, 1, "create", 100), Ev(2, 1, "update", 200), Ev(3, 2, "create", 150))
    q.processAllAvailable()
    // replay event 2 (duplicate) + a newer event for doc 2
    mem.addData(Ev(2, 1, "update", 200), Ev(4, 2, "update", 300))
    q.processAllAvailable()
    q.stop()
    assert(store(1) == (2L, "update")) // latest per doc wins
    assert(store(2) == (4L, "update"))
    assert(applied.toSet == Set(1L, 2L, 3L, 4L)) // duplicate applied once
  }

  test("glob matching: ** crosses segments, * does not, ? single char") {
    def m(p: String, g: String) = p.matches(Watch.globToRegex(g))
    assert(m("/users/3/e12", "/users/3/**"))
    assert(m("/users/3/a/b/c", "/users/3/**"))
    assert(!m("/users/31/e12", "/users/3/**"))
    assert(m("/users/7/e55", "/users/*/e5*"))
    assert(!m("/users/7/x/e55", "/users/*/e5*")) // * must not cross '/'
    assert(m("/a", "/?"))
    assert(!m("/ab", "/?"))
    assert(m("anything/at/all", "**"))
  }

  test("watch deliveries: kind bitmask filters and broadcast join") {
    val events = Seq(
      (1L, "signup", "/users/3/e1"), // kind 1
      (2L, "error", "/users/9/e2"), // kind 8
      (3L, "click", "/users/3/e3") // kind 2
    ).toDF("event_id", "event_type", "path")
    val watches = Seq(
      ("w1", "/users/3/**", 1), // only METADATA_CREATED
      ("w2", "**", 8) // only SYNC_FAILED
    ).toDF("watch_id", "scope_glob", "kind_mask")
    val out = Watch.deliveries(events, watches)
      .select("watch_id", "event_id").collect().map(_.toSeq).toSet
    assert(out == Set(Seq("w1", 1L), Seq("w2", 2L)))
  }

  test("streaming watch delivery: stream-static broadcast join end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val watches = Seq(("w1", "/d/**", 2)).toDF("watch_id", "scope_glob", "kind_mask")
    val q = Watch.deliveries(
      mem.toDF().toDF("event_id", "event_type", "path"), watches)
      .select("watch_id", "event_id")
      .writeStream.format("memory").queryName("watch_out").outputMode("append").start()
    mem.addData((1L, "click", "/d/x"), (2L, "error", "/d/y"), (3L, "click", "/other"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM watch_out").collect().map(_.toSeq).toSet
    assert(rows == Set(Seq("w1", 1L))) // click under /d/** only
  }

  test("live sessionize: in-key gap closes on arrival, idle key closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ev(u: Long, sec: Long, v: Double) =
      Sessionize.SessEvent(u, new java.sql.Timestamp(sec * 1000), v)
    val mem = MemoryStream[Sessionize.SessEvent]
    val q = Sessionize.sessionizeStream(mem.toDS(), gapMs = 10000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // batch 1: user 1 bursts (100s, 105s); user 2 one event at 100s
    // (times sit above 0: the initial watermark is 0 and flatMapGroups
    // drops events at-or-below it before the state function runs)
    mem.addData(ev(1, 100, 1.0), ev(1, 105, 2.0), ev(2, 100, 16.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sess_out").count() == 0,
      "no session may close before the gap passes")
    // batch 2: user 1 returns at 130s -> closes their first session in-key,
    // and advances the watermark past user 2's last+gap
    mem.addData(ev(1, 130, 4.0))
    q.processAllAvailable()
    // batch 3: any further progress fires user 2's event-time timeout
    mem.addData(ev(1, 131, 8.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got.contains((1L, 100000L, 2L, 5000L, 3.0)),
      s"user 1 burst session wrong: $got")
    assert(got.contains((2L, 100000L, 1L, 0L, 16.0)),
      s"user 2 idle timeout session missing: $got")
    assert(got.size == 2, s"open session (user 1 @130s) must stay open: $got")
  }

  test("ev14 attribution: equi+range join never degenerates to a product") {
    val plan = StreamingQueries.queries("ev14_attribution")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join exploded:\n$plan")
  }

  test("native as-of exec: plans AsOfJoinExec, matches the window composition on fuzz") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq.tabulate(120)(i =>
      (1000L + i, rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong, s"p$i"))
      .toDF("event_id", "user_id", "ts_us", "payload")
    val native = Sessionize.asofJoinNative(left, right, "user_id", "ts_us", "event_id")
      .toDF("l_event", "l_user", "l_ts", "r_event", "r_user", "r_ts", "r_payload")
      .select("l_event", "r_event", "r_payload")
    val plan = native.queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix
    assert(plan.contains("AsOfJoin"), s"native operator not planned:\n$plan")
    val gotNative = native.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2)))))
      .toMap
    val gotWindow = Sessionize.asofJoin(left, right, "user_id", "ts_us", "event_id")
      .select(col("event_id"), col("asof.event_id").as("r_event"),
        col("asof.payload").as("r_payload"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2)))))
      .toMap
    assert(gotNative.size == 300 && gotNative == gotWindow,
      s"native/window divergence: ${gotNative.toSet.diff(gotWindow.toSet).take(5)}")
  }

  test("stream-stream interval join: same-key pairs inside the lag window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Long)]
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val q = EventAnalytics.intervalJoinStreams(
        clicks.toDF().toDF("user_id", "lts", "click_id"),
        buys.toDF().toDF("r_user_id", "rts", "buy_id"),
        "user_id", maxLag = "10 SECONDS")
      .select("user_id", "click_id", "buy_id")
      .writeStream.format("memory").queryName("ij_out").outputMode("append").start()
    clicks.addData((1L, t(100), 11L), (2L, t(100), 21L))
    // user 1 buys inside the window; user 2 buys too late; user 3 never clicked
    buys.addData((1L, t(105), 911L), (2L, t(120), 921L), (3L, t(105), 931L))
    q.processAllAvailable()
    // a second click catches user 2's earlier purchase (rts >= lts holds)
    clicks.addData((2L, t(115), 22L))
    buys.addData((9L, t(200), 999L)) // advances the right watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM ij_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 11L, 911L), (2L, 22L, 921L)),
      s"interval join pairs wrong: $got")
  }

  test("funnel: strict step order, window cap from step 1, pre-step-1 events ignored") {
    val W = 100L
    val rows = Seq(
      // user 1: click BEFORE signup must not count; the later click does
      (1L, 5L, "click"), (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase before click -> funnel stops at click
      (2L, 0L, "signup"), (2L, 5L, "purchase"), (2L, 9L, "click"),
      // user 3: click past the window (10 + 100 < 120) -> stops at signup
      (3L, 10L, "signup"), (3L, 120L, "click"),
      // user 4: no signup at all -> all null
      (4L, 1L, "click"), (4L, 2L, "purchase"))
      .toDF("user_id", "tus", "event_type")
    val got = EventAnalytics.funnel(rows, "user_id", col("tus"), "event_type",
        Seq("signup", "click", "purchase"), windowMicros = W)
      .orderBy(col("user_id")).collect()
      .map(r => r.getLong(0) -> Seq(1, 2, 3).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i)))).toMap
    assert(got(1L) == Seq(Some(10L), Some(20L), Some(30L)), s"u1: ${got(1L)}")
    assert(got(2L) == Seq(Some(0L), Some(9L), None), s"u2 purchase-before-click leaked: ${got(2L)}")
    assert(got(3L) == Seq(Some(10L), None, None), s"u3 window exceeded: ${got(3L)}")
    assert(got(4L) == Seq(None, None, None), s"u4: ${got(4L)}")
  }

  test("rolling daily: RANGE frame bounds by days not rows across gaps") {
    val DayUs = 86400000000L
    val rows = Seq(
      (1L, 0L * DayUs, 1.0),        // day 0
      (1L, 1L * DayUs, 2.0),        // day 1
      (1L, 9L * DayUs, 4.0),        // day 9: days 0/1 fell out of the 7-day frame
      (1L, 10L * DayUs, 8.0))       // day 10: sees day 9 only
      .toDF("user_id", "tus", "value")
    val got = EventAnalytics.rollingDaily(rows, "user_id", col("tus"), "value",
        windowDays = 7)
      .orderBy(col("day")).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Double]("roll_value"), r.getAs[Long]("n_days_active"))).toMap
    assert(got(0L) == (1.0, 1L) && got(1L) == (3.0, 2L), s"warmup: $got")
    assert(got(9L) == (4.0, 1L), s"gap days must age out (ROWS frame bug): $got")
    assert(got(10L) == (12.0, 2L), s"day 10 frame: $got")
  }

  test("retention: cohort = first week, offsets count entities once per week") {
    val WeekUs = 604800000000L
    val rows = Seq(
      (1L, 0L), (1L, 10L), (1L, WeekUs),          // cohort 0, active w0+w1
      (2L, 0L), (2L, 2 * WeekUs),                 // cohort 0, active w0+w2
      (3L, WeekUs))                               // cohort 1, active w1 only
      .toDF("user_id", "tus")
    val got = EventAnalytics.retention(rows, "user_id", col("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L), s"retention triangle wrong: $got")
  }

  test("streaming incremental postings: search hits appear after insert, vanish after update/delete") {
    implicit val sqlCtx = spark.sqlContext
    import graft.fts.Fts
    import graft.sparql.RdfTables
    // (event_id, doc_id, text, is_del) — the live mutation stream; state is
    // the postings index, maintained per micro-batch exactly as
    // IncrementalIndex.applyBatch does (drop touched graphs, re-derive
    // surviving upserts through the batch build's own doc→postings path)
    val mem = MemoryStream[(Long, Long, String, Boolean)]
    val seed = Seq((1L, "web", "alpha beta", "en", 10L))
      .toDF("doc_id", "source", "text", "lang", "n_chars")
    var state = Fts.postings(RdfTables.quadsOfDocs(seed)).cache()
    state.count()
    val q = mem.toDF().toDF("event_id", "doc_id", "text", "is_del")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("event_id").desc)
        val last = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val touched = last.select(
          concat(lit("graph:"), col("doc_id").cast("string")).as("graph_iri"))
        val upserts = last.filter(!col("is_del")).select(
          col("doc_id"), lit("web").as("source"), col("text"),
          lit("en").as("lang"), length(col("text")).cast("long").as("n_chars"))
        val old = state
        state = old.join(broadcast(touched), Seq("graph_iri"), "left_anti")
          .unionByName(Fts.postings(RdfTables.quadsOfDocs(upserts))).cache()
        state.count()
        old.unpersist()
        ()
      }
      .start()
    def hits(token: String): Set[String] =
      state.filter(col("token") === token && col("field") === "description")
        .select("graph_iri").collect().map(_.getString(0)).toSet
    assert(hits("zebra").isEmpty)
    // insert: the new doc is searchable after the batch commits
    mem.addData((10L, 100L, "the zebra jumps", false))
    q.processAllAvailable()
    assert(hits("zebra") == Set("graph:100"), "insert must become searchable")
    assert(hits("alpha") == Set("graph:1"), "untouched docs must survive")
    // update: stale postings must be repaired, not accumulated
    mem.addData((11L, 100L, "quiet fox", false))
    q.processAllAvailable()
    assert(hits("zebra").isEmpty, "stale tokens must be dropped on update")
    assert(hits("fox") == Set("graph:100"))
    // delete: the graph disappears from the index
    mem.addData((12L, 100L, "", true))
    q.processAllAvailable()
    q.stop()
    assert(hits("fox").isEmpty, "deleted doc must leave the index")
    assert(hits("alpha") == Set("graph:1"))
    state.unpersist()
    ()
  }

  test("streaming incremental iri-index: backlinks appear after insert, vanish after delete") {
    implicit val sqlCtx = spark.sqlContext
    import graft.index.IriIndex
    import graft.sparql.RdfTables
    // same per-batch contract as the postings twin, with the backlink index
    // as the maintained state (the reference's projector maintains both from
    // the one event stream, projector.rs:112-265)
    val mem = MemoryStream[(Long, Long, Boolean)] // (event_id, doc_id, is_del)
    val seed = Seq((1L, "web", "alpha", "en", 5L))
      .toDF("doc_id", "source", "text", "lang", "n_chars")
    var state = IriIndex.build(RdfTables.quadsOfDocs(seed)).cache()
    state.count()
    val q = mem.toDF().toDF("event_id", "doc_id", "is_del")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("event_id").desc)
        val last = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val touched = last.select(
          concat(lit("graph:"), col("doc_id").cast("string")).as("graph_iri"))
        val upserts = last.filter(!col("is_del")).select(
          col("doc_id"), lit("web").as("source"), lit("text").as("text"),
          lit("en").as("lang"), lit(4L).as("n_chars"))
        val old = state
        state = old.join(broadcast(touched), Seq("graph_iri"), "left_anti")
          .unionByName(IriIndex.build(RdfTables.quadsOfDocs(upserts))).cache()
        state.count()
        old.unpersist()
        ()
      }
      .start()
    def backlinks(objectIri: String): Set[String] =
      state.filter(col("object_iri") === objectIri)
        .select("graph_iri").collect().map(_.getString(0)).toSet
    // seed doc 1: author -> person:1
    assert(backlinks("person:1") == Set("graph:1"))
    assert(backlinks("person:0").isEmpty)
    // insert doc 100 (100%20=0): author -> person:0 appears
    mem.addData((10L, 100L, false))
    q.processAllAvailable()
    assert(backlinks("person:0").contains("graph:100"), "insert must index backlinks")
    assert(backlinks("person:1").contains("graph:1"), "untouched graphs must survive")
    // delete doc 100: its backlinks vanish, others survive
    mem.addData((11L, 100L, true))
    q.processAllAvailable()
    q.stop()
    assert(backlinks("person:0").forall(_ != "graph:100"), "deleted graph must leave the index")
    assert(backlinks("person:1").contains("graph:1"))
    state.unpersist()
    ()
  }

  test("structured streaming: LSH band index maintained by ingest — streamed near-dup pairs appear") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("lsh-stream-").toString + "/idx"
    val base = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    graft.dedup.Dedup.writeLshBandIndex(base, path)
    // before ingest: no pair involves the streamed id range
    def pairsWith(id: Long): Seq[(Long, Long)] =
      graft.dedup.Dedup.lshIndexPairs(spark.read.parquet(path))
        .filter(col("a") === id || col("b") === id)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // stream two docs: an exact copy of doc 42 and a brand-new text; each
    // batch appends banded signatures under the SAME pure hash family —
    // the ingest path the dd15 gate pins in batch form
    val donor = base.filter(col("doc_id") === 42L).head().getString(1)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.dedup.Dedup.appendLshBandIndex(batch, path)
        ()
      }
      .start()
    mem.addData((9042L, donor))
    q.processAllAvailable()
    mem.addData((9043L, "entirely unrelated fresh words nothing shared here"))
    q.processAllAvailable()
    q.stop()
    assert(pairsWith(9042L).contains((42L, 9042L)),
      "streamed exact copy must pair with its donor through the maintained index")
    assert(pairsWith(9043L).isEmpty,
      "unrelated streamed doc must not pair with anything")
  }

  test("scd2: repeats collapse, intervals abut, exactly one open row per key") {
    // user 1: A A B A  (the repeat collapses; A reappears as a NEW interval)
    // user 2: X        (single row, immediately current)
    val ev = Seq(
      (1L, 10L, "A", 100L), (1L, 20L, "A", 101L),
      (1L, 30L, "B", 102L), (1L, 40L, "A", 103L),
      (2L, 15L, "X", 104L))
      .toDF("user_id", "tus", "event_type", "event_id")
    val got = EventAnalytics.scd2History(ev, "user_id", "event_type",
        col("tus"), "event_id")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, "A", 10L, 30L, false),   // repeat at 20 collapsed
      (1L, "B", 30L, 40L, false),
      (1L, "A", 40L, -1L, true),    // same value, NEW interval after B
      (2L, "X", 15L, -1L, true)), s"history wrong: $got")
    // invariant: per key, valid_to chains exactly onto the next valid_from
    got.groupBy(_._1).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 == b._3, s"gap between $a and $b")
        case _ =>
      }
      assert(rows.count(_._5) == 1, "exactly one current row per key")
    }
  }

  test("structured streaming: live SCD2 emits closed intervals ≡ batch history") {
    implicit val sqlCtx = spark.sqlContext
    import EventAnalytics.AttrEvent
    val all = Seq(
      AttrEvent(1, 10, "A", 100), AttrEvent(1, 20, "A", 101),   // batch 1
      AttrEvent(2, 15, "X", 102),
      AttrEvent(1, 30, "B", 103),                                // batch 2
      AttrEvent(2, 25, "X", 104),                                //   repeat
      AttrEvent(1, 40, "A", 105), AttrEvent(2, 35, "Y", 106))    // batch 3
    val mem = MemoryStream[AttrEvent]
    val q = EventAnalytics.scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    mem.addData(all(0), all(1), all(2)); q.processAllAvailable()
    assert(spark.sql("SELECT * FROM scd2_out").count() == 0,
      "no interval may close before an attribute changes")
    mem.addData(all(3), all(4)); q.processAllAvailable()
    mem.addData(all(5), all(6)); q.processAllAvailable()
    q.stop()
    val live = spark.sql("SELECT * FROM scd2_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch reference over the SAME events: the non-current rows
    val batch = EventAnalytics.scd2History(
        all.toDF("user_id", "tus", "event_type", "event_id"),
        "user_id", "event_type", col("tus"), "event_id")
      .filter(!col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(live == batch, s"live=$live batch=$batch")
    assert(live == Set((1L, "A", 10L, 30L), (1L, "B", 30L, 40L),
      (2L, "X", 15L, 35L)))
  }

  test("queue lag: bounded scan caps depth, due/age semantics per flavor, empty queue absent") {
    def nl: java.lang.Long = null
    val rows = Seq(
      // outbox: 4 rows, ages from enqueue; cap 3 scans keys k1..k3 only
      ("outbox", "k1", java.lang.Long.valueOf(100L), nl),
      ("outbox", "k2", java.lang.Long.valueOf(50L), nl), // younger key sorts later? no: scan is KEY order
      ("outbox", "k3", java.lang.Long.valueOf(200L), nl),
      ("outbox", "k4", java.lang.Long.valueOf(10L), nl), // beyond cap: invisible
      // materialization: due iff due_at <= 1000
      ("mat", "m1", nl, java.lang.Long.valueOf(900L)),
      ("mat", "m2", nl, java.lang.Long.valueOf(1000L)),
      ("mat", "m3", nl, java.lang.Long.valueOf(1500L)),
      // depth-only
      ("dead", "d1", nl, nl)
    ).toDF("queue", "key", "enqueued_ms", "due_at_ms")
    val out = QueueLag.snapshots(rows, nowMs = 1000L, scanCap = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4))).toMap
    // depth capped at 3; k4's age never observed (the scan stopped)
    assert(out("outbox") == (3L, true, 950L, 0L), s"outbox: $out")
    // 2 of 3 due; age from the oldest DUE job (900), not the undue 1500
    assert(out("mat") == (3L, false, 100L, 2L), s"mat: $out")
    assert(out("dead") == (1L, false, 0L, 0L), s"dead: $out")
    // an empty queue has no input rows and therefore no snapshot row —
    // the caller's queue catalog materializes zero rows if needed
    assert(!out.contains("ghost"))
  }

  test("watch-interest digest: mask-OR dedup, drop accounting, empty publish, unchanged skip, gen-bumped markers survive") {
    val subs = Seq(
      // r0: two same-prefix subs OR to mask 3; a foreign-owner sub drops
      ("r0", "/a", 1L, "self", "ok"),
      ("r0", "/a", 2L, "self", "ok"),
      ("r0", "/b", 4L, "other", "ok"),
      // r1: denied drops silently; unavailable drops AND flags the retry
      ("r1", "/c", 1L, "self", "denied"),
      ("r1", "/d", 2L, "self", "unavailable"),
      // r3: digest identical to the currently-published one
      ("r3", "/x", 4L, "self", "ok")
    ).toDF("realm", "path_prefix", "event_mask", "owner_node", "authz")
    val markers = Seq(
      ("r0", 1L, 1L),  // unchanged generation -> clears
      ("r1", 2L, 3L),  // concurrent CRUD bumped it -> retained
      ("r2", 5L, 5L),  // dirty realm with no subs at all
      ("r3", 7L, 7L)
    ).toDF("realm", "gen_observed", "gen_now")
    val current = Seq(("r0", "<old>"), ("r3", "/x:4"))
      .toDF("realm", "digest_sig")
    val pending = Seq(Tuple1("r9")).toDF("realm") // no dirty realm pending
    val got = Interest
      .publish(subs, markers, current, pending, localNode = "self")
      .orderBy("realm", "path_prefix").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("∅"),
        r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getLong(5),
        r.getLong(6)))
    assert(got.toSeq == Seq(
      // r0: one merged entry, changed vs <old>, one foreign drop, cleared
      ("r0", "/a", 3L, true, false, 1L, 1L),
      // r1: all subs dropped -> EMPTY digest still publishes (peers must
      // drop stale interest); check_failed from the unavailable authz;
      // bumped generation keeps the marker (n_cleared 0)
      ("r1", "∅", 0L, true, true, 2L, 0L),
      // r2: no subs, no prior digest ("" vs <absent> = changed) -> publish
      ("r2", "∅", 0L, true, false, 0L, 1L),
      // r3: digest unchanged and nothing pending -> skipped entirely,
      // but its observed markers still clear
      ("r3", "/x", 4L, false, false, 0L, 1L)), got.toSeq.mkString("\n"))
  }

  test("watch-subscription create: field ladder precedence, mixed invalid mask, cap boundary at 50") {
    val reqs = Seq(
      ("r1", "u1", "", 0L, false),          // empty prefix wins over all
      ("r2", "u1", "s3/x", 9L, true),       // 1|8 valid -> created (49 subs)
      ("r3", "u2", "s3/x", 15L, true),      // exactly at the 50 cap
      ("r4", "u1", "s3/x", 24L, true),      // 8|16 -> invalid (mixed bits)
      ("r5", "u1", "s3/x", 4L, false))      // fields pass, authz fails
      .toDF("req_id", "owner", "path_prefix", "event_mask", "authz_valid")
    val existing = Seq(("u1", 49L), ("u2", 50L)).toDF("owner", "n_subs")
    val got = Interest.validateSubscriptions(reqs, existing)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("r1" -> "empty_prefix", "r2" -> "created",
      "r3" -> "cap_exceeded", "r4" -> "invalid_mask",
      "r5" -> "unauthorized"), got.toString)
  }

  test("watch expand: group-alias path rule, nil group never aliases, no retroactive delivery") {
    val g = "01ARZ3NDEKTSV4RRFFQ69G5FAV"
    val g2 = "01BX5ZZKBKACTAV9WEVGEMMVRZ"
    val events = Seq(
      ("e1", "r0", 2L, s"s3/$g/n1/bkA/dir/f.txt", 1000L),
      ("e2", "r0", 1L, "meta/gX/doc1", 1000L),  // metadata kind: NO alias
      ("e3", "r0", 2L, "s3/00000000000000000000000000/n1/bkA/dir/f.txt",
        1000L))
      .toDF("event_id", "realm", "kind_bit", "path", "occurred_at_ms")
    val subs = Seq(
      // different GROUP, same node+bucket+key-prefix -> alias delivers
      ("w1", "r0", "u1", s"s3/$g2/n1/bkA/dir", 2L, 900L, true, true),
      // same shape but subscribed to METADATA paths: no alias for kind 1
      ("w2", "r0", "u2", s"s3/$g2/nX/bkA/", 1L, 900L, true, true),
      // created after every event
      ("w3", "r0", "u3", s"s3/$g/n1/bkA/", 2L, 2000L, true, true))
      .toDF("watch_id", "realm", "owner", "path_prefix", "event_mask",
        "created_at_ms", "held", "authz_ok")
    val got = Interest.routeWatchEvents(events, subs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getString(2)).toMap
    assert(got(("e1", "w1")) == "delivered")
    // nil-group paths never parse -> the alias arm is closed
    assert(got(("e3", "w1")) == "path_mismatch")
    assert(got(("e2", "w2")) == "path_mismatch")
    assert(got(("e1", "w3")) == "created_after_event")
  }

  test("raw revision: timestamp-major base election, post-base upserts, fold rebuild on base change") {
    val events = Seq(
      // doc 1: the LATER event id carries an OLDER payload timestamp and
      // must NOT win the base; upserts after the winner apply
      (1L, 10L, "rocrate", 2000L),
      (1L, 20L, "replace", 1500L),  // replay with older payload
      (1L, 25L, "upsert_data", 0L),
      (1L, 30L, "upsert_ctx", 0L),
      // doc 2: scaffold only -> no revision
      (2L, 5L, "scaffold", 900L))
      .toDF("doc_id", "event_id", "kind", "updated_at_ms")
    val r = RawRevision.resolve(events)
      .collect().map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getAs[Long]("base_event_id") == 10L &&
      d1.getAs[Long]("winning_event_id") == 30L &&
      d1.getAs[Long]("n_applied") == 2L &&
      d1.getAs[Long]("last_event_id") == 30L, d1.toString)
    val d2 = r(2L)
    assert(d2.get(1) == null && d2.get(2) == null &&
      d2.getAs[Long]("n_applied") == 0L)

    // fold: a batch whose base WINS rebuilds from the batch alone — the
    // old revision's applied upserts do not carry over
    val old = events.filter("doc_id = 1")
    val batch = Seq((1L, 40L, "rocrate", 2500L), (1L, 50L, "upsert_data", 0L))
      .toDF("doc_id", "event_id", "kind", "updated_at_ms")
    val f = RawRevision.fold(old, batch)
      .collect().map(x => x.getLong(0) -> x).toMap
    val f1 = f(1L)
    assert(f1.getAs[Long]("base_event_id") == 40L &&
      f1.getAs[Long]("winning_event_id") == 50L &&
      f1.getAs[Long]("n_applied") == 1L &&
      f1.getAs[Long]("last_event_id") == 50L, f1.toString)
    // and a LOSING batch base (older payload) leaves the stored revision:
    // the batch upsert extends it, the applied count accumulates
    val batch2 = Seq((1L, 40L, "replace", 100L), (1L, 50L, "upsert_data", 0L))
      .toDF("doc_id", "event_id", "kind", "updated_at_ms")
    val g1 = RawRevision.fold(old, batch2)
      .collect().map(x => x.getLong(0) -> x).toMap.apply(1L)
    assert(g1.getAs[Long]("base_event_id") == 10L &&
      g1.getAs[Long]("winning_event_id") == 50L &&
      g1.getAs[Long]("n_applied") == 3L, g1.toString)
  }

  test("inbox upsert: stored keys skip, batch duplicates both count, distinct-recipient wake set") {
    val records = Seq(
      ("n1", "u1", 10L), ("n1", "u1", 10L), // batch-internal duplicate
      ("n2", "u1", 20L),                    // already stored
      ("n3", "u2", 30L))
      .toDF("notification_id", "recipient", "created_at_ms")
    val existing = Seq(("n2", "u1", 20L))
      .toDF("notification_id", "recipient", "created_at_ms")
    val got = Interest.upsertInbox(records, existing).collect()
    val byId = got.groupBy(_.getString(0))
    // both copies of the batch duplicate insert (the reference checks the
    // STORED inbox only; the second write is the same bytes)
    assert(byId("n1").forall(_.getAs[Boolean]("inserted")))
    assert(!byId("n2").head.getAs[Boolean]("inserted"))
    assert(got.head.getAs[Long]("n_written") == 3L &&
      got.head.getAs[Long]("n_recipients") == 2L, got.mkString("\n"))
  }
}
