package graft

import graft.sparql.{Materialize, RdfTables}
import graft.streaming.Stateful
import graft.streaming.Stateful.Notice
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scale-design evidence: partition pruning on the materialized quads store,
  * and stateful-streaming operators (flatMapGroupsWithState) behaving across
  * microbatches.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("materialized quads: graph-scoped scan prunes to one partition bucket") {
    val dir = java.nio.file.Files.createTempDirectory("quads_mat").toString
    val quads = RdfTables.quads(spark, sf0001)
    Materialize.writeQuads(quads, dir)
    val mat = Materialize.readQuads(spark, dir)
    val scoped = Materialize.scopedScan(mat, "graph:42")
    // correctness: identical rows to a straight filter on the logical table
    val expect = quads.filter(col("graph_iri") === "graph:42")
      .drop("graph_bucket").collect().map(_.toSeq).toSet
    val got = scoped.drop("graph_bucket").select(
      "graph_iri", "subject", "subject_kind", "predicate", "obj_kind",
      "obj_value", "obj_lang", "obj_datatype").collect().map(_.toSeq).toSet
    assert(got == expect && got.nonEmpty)
    // physical proof: the partition filter survived to the scan
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("graph_bucket"),
      s"expected a partition filter on graph_bucket in:\n$plan")
    val pruned = scoped.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .exists(s => s.contains("graph_bucket = ") || s.contains("graph_bucket#"))
    assert(pruned)
  }

  test("subject-bucketed triples: BGP self-join chain plans with zero exchanges") {
    import org.apache.spark.sql.functions.col
    import graft.sparql.RdfTables
    val t = Store.triplesBucketed(spark, sf0001)
    val author = t.filter(col("predicate") === RdfTables.SchemaNs + "author")
      .select(col("subject"), col("obj_value").as("person"))
    val name = t.filter(col("predicate") === RdfTables.SchemaNs + "name")
      .select(col("subject"), col("obj_value").as("title"))
    val ident = t.filter(col("predicate") === RdfTables.SchemaNs + "identifier")
      .select(col("subject"), col("obj_value").as("ident"))
    val joined = author.join(name, "subject").join(ident, "subject")
    assert(joined.count() > 0)
    // co-located joins: every pattern scan shares the subject bucketing, so
    // the three-pattern chain must contain NO shuffle exchange at all (the
    // per-pattern store shuffle is the dominant BGP cost at scale)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed self-join still shuffles:\n$plan")
  }

  test("SMB layout: bucketed orders ⋈ lineitem joins with zero exchanges") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val o = Store.bucketedRel(spark, sf0001, "orders", "o_orderkey")
      .select("o_orderkey", "o_orderpriority")
    val l = Store.bucketedRel(spark, sf0001, "lineitem", "l_orderkey")
      .select("l_orderkey", "l_quantity")
    val j = o.join(l, col("o_orderkey") === col("l_orderkey"))
    assert(j.count() > 0)
    // both sides share the bucketing, so the fact-fact join — the dominant
    // shuffle of this query shape at scale — needs NO exchange at all
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed fact-fact join still shuffles:\n$plan")
  }

  test("streaming dedup with BOUNDED state: in-horizon dups drop, expired keys re-emit") {
    // dropDuplicatesWithinWatermark — the TTL'd analog of ev2's
    // applied-ids dedup: state is evicted once the watermark passes, so
    // memory is O(window), not O(history). The contract trade: a key
    // re-delivered AFTER its horizon re-emits (at-least-once beyond the
    // window) — which is exactly what this pins, because at 100 TB the
    // unbounded-set variant is the one that falls over.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").start()
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    mem.addData((1L, t(100)), (1L, t(101)), (2L, t(100)))
    q.processAllAvailable()
    mem.addData((3L, t(200)))   // watermark -> 190, id 1's state expires
    q.processAllAvailable()
    mem.addData((1L, t(201)))   // beyond the horizon: re-emits
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT id FROM dedup_ttl").collect()
      .map(_.getLong(0)).toSeq
    assert(got.count(_ == 1L) == 2,
      s"one emit per horizon for id 1, got $got")
    assert(got.count(_ == 2L) == 1 && got.count(_ == 3L) == 1, s"$got")
  }

  test("fixpoint caches release across queries: persistent-RDD set does not grow") {
    // or1 always barriers the orphan set (and may cache closure rounds);
    // each query entry drains the previous query's registrations, so the
    // persistent-RDD census must reach a steady state instead of growing
    // per query (the round-2 session leak).
    // the dedup gates persist derived relations (sigs/fingerprints/shingle
    // streams) through the same registry — cycle them too
    def run(name: String): Unit = {
      SparkEntry.queries(name)(spark, sf0001).count()
      ()
    }
    val cycle = Seq("or1_orphan_filter", "sp17_path_plus",
      "dd2_minhash_lsh", "dd4_simhash", "dd6_lsh_verified", "dd8_dedup_components",
      "gr1_pagerank", "gr2_triangles")
    cycle.foreach(run)
    val steady = spark.sparkContext.getPersistentRDDs.size
    (1 to 2).foreach { _ => cycle.foreach(run) }
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= steady,
      s"persistent RDDs grew across repeated fixpoint/dedup queries: $steady -> $after")
  }

  test("stateful debounce: 2s suppression persists across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Notice]
    val q = Stateful.debounced(mem.toDS(), debounceMs = 2000)
      .writeStream.format("memory").queryName("debounce_out")
      .outputMode("append").start()
    // batch 1: t=0 emits, t=500/1500 suppressed, t=2000 emits
    mem.addData(
      Notice("w1", 1, 0), Notice("w1", 2, 500),
      Notice("w1", 3, 1500), Notice("w1", 4, 2000),
      Notice("w2", 10, 100))
    q.processAllAvailable()
    // batch 2: state remembers w1 last-emit=2000 → t=3000 suppressed, t=4200 emits
    mem.addData(Notice("w1", 5, 3000), Notice("w1", 6, 4200), Notice("w2", 11, 5000))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT watch_id, event_id FROM debounce_out")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("w1", 1L), ("w1", 4L), ("w1", 6L), ("w2", 10L), ("w2", 11L)))
  }

  test("stateful applied-once: duplicate ids never re-emit, even across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Notice]
    val q = Stateful.appliedOnce(mem.toDS())
      .writeStream.format("memory").queryName("applied_out")
      .outputMode("append").start()
    mem.addData(Notice("w1", 1, 10), Notice("w1", 2, 20), Notice("w1", 1, 30))
    q.processAllAvailable()
    mem.addData(Notice("w1", 2, 40), Notice("w1", 3, 50)) // 2 is a replay
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT event_id FROM applied_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("watermarked windowed rollup: windows close exactly once; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WindowEv]
    val q = graft.streaming.Windows.eventRollup(mem.toDS().toDF())
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode("append").start()
    def emitted(): Map[(Long, String), (Long, Double)] =
      spark.sql("SELECT window_start_ms, event_type, n, total_value FROM rollup_out")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // watermark = max event time - 30s: nothing can close yet
    mem.addData(WindowEv(1, "a", 1000, 1.0), WindowEv(2, "a", 5000, 2.0),
      WindowEv(3, "a", 12000, 4.0))
    q.processAllAvailable()
    assert(emitted().isEmpty)
    // t=45s → watermark 15s → window [0,10s) closes with both events
    mem.addData(WindowEv(4, "b", 45000, 8.0))
    q.processAllAvailable()
    assert(emitted() == Map((0L, "a") -> ((2L, 3.0))))
    // a 2s event is behind the 15s watermark: dropped by the engine;
    // t=60s → watermark 30s → [10,20s) closes WITHOUT the late event
    mem.addData(WindowEv(5, "a", 2000, 100.0), WindowEv(6, "b", 60000, 16.0))
    q.processAllAvailable()
    q.stop()
    assert(emitted() == Map((0L, "a") -> ((2L, 3.0)), (10000L, "a") -> ((1L, 4.0))))
  }
}

final case class WindowEv(event_id: Long, event_type: String,
    occurred_at_ms: Long, value: Double)
