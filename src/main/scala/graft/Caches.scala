package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Session-lifetime cache hygiene for iterative operators.
  *
  * Fixpoint operators ([[graft.sparql.PathCompiler]] closures, the orphan
  * reachability filter) must cache their per-round barriers AND their final
  * result (the consumer's action re-reads it). Those caches cannot be
  * unpersisted inside the operator — the returned DataFrame is lazy and the
  * consumer has not materialized it yet — so they register here instead, and
  * the NEXT query's entry point (or an explicit caller) drains the registry.
  * By then the previous query has been materialized; if a released block is
  * ever re-read, Spark recomputes it from lineage (shuffle files persist),
  * so release is always safe, never wrong.
  *
  * This bounds block-manager growth to O(one query) in a long-lived service
  * — without it every path/orphan query leaks cached RDDs for the session
  * lifetime (the round-2 finding).
  *
  * Contract: ONE query in flight at a time (the driver gate's execution
  * model). Composing two entry points into a single lazy plan — e.g.
  * unioning two `filterOrphaned` results before any action — is still
  * CORRECT: a released block recomputes from lineage (shuffle files
  * persist), so early release can cost recomputation, never wrong results.
  * Callers needing cross-query cache lifetimes should persist outside this
  * registry.
  */
object Caches {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a cached RDD for release at the next entry-point drain. */
  def track(rdd: RDD[_]): Unit = tracked.add(() => rdd.unpersist(blocking = false))

  /** Register a persisted DataFrame for release at the next drain. */
  def track(df: DataFrame): Unit = tracked.add(() => { df.unpersist(blocking = false); () })

  /** Register a broadcast variable (e.g. the incremental-dedup Bloom
    * filter, ~GB-scale per its sizing doc) for destruction at the next
    * drain. Broadcasts are driver+executor memory, not block-manager cache,
    * so leaking them across repeated gate/bench invocations accumulates
    * until OOM; same one-query-in-flight contract as the RDD/DF overloads
    * (a destroyed broadcast canNOT recompute — callers must materialize
    * before the next drain). */
  def track(b: org.apache.spark.broadcast.Broadcast[_]): Unit =
    tracked.add(() => b.destroy())

  /** Drain: unpersist everything registered since the previous drain. */
  def release(): Unit = {
    var r = tracked.poll()
    while (r != null) { r(); r = tracked.poll() }
  }

  /** Lineage barrier for iterative operators: a fresh LogicalRDD with no
    * inherited constraints. `localCheckpoint` CANNOT be used here — it
    * carries origin constraints that break Union's constraint rewrite in
    * Spark 4.1 (`NoSuchElementException` in `Union.rewriteConstraints`).
    * The rows are cached as INTERNAL rows (`queryExecution.toRdd`, copied —
    * toRdd reuses its row buffers — then wrapped via
    * [[org.apache.spark.sql.graftnative.Native.internalOfRows]]): the
    * previous `df.rdd.cache()` form decoded every row to an external
    * GenericRow on materialization and re-encoded it through a RowEncoder on
    * EVERY consumer pass — pure per-row overhead multiplied by fixpoint
    * rounds (r13 optimization; see OPTIMIZATION_r13.md for the gate-level
    * before/after of the closure-heavy sp/or/dd gates).
    * Returns the barriered frame and its cached RDD so the caller can
    * unpersist superseded rounds; track the FINAL round here instead (the
    * consumer has not run its action yet). */
  def barrier(df: DataFrame): (DataFrame, RDD[_]) = {
    val rdd = df.queryExecution.toRdd.map(_.copy()).cache()
    (org.apache.spark.sql.graftnative.Native.internalOfRows(
      df.sparkSession, rdd, df.schema), rdd)
  }
}
