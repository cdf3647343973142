package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, doc: Long, event_type: String, occurred_at_ms: Long)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

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
}
