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
}
