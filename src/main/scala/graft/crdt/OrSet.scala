package graft.crdt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OR-set (observed-remove set) fold over a quad op-log — the CRDT merge the
  * reference applies when replaying metadata batches
  * (`core/src/metadata.rs:716-731`: `MetadataQuadOp::Add{subject, predicate,
  * object, dot}` / `Remove{…, witnessed}` with `MetadataDot{actor, counter}`
  * and a witnessed `VectorClock`).
  *
  * Semantics: every Add is tagged with a unique dot `(actor, counter)`; a
  * Remove deletes exactly the add-dots it witnessed — those with
  * `counter <= witnessed[actor]` for the same quad. A quad is present iff at
  * least one of its add-dots is uncovered. Concurrent re-adds therefore win
  * over removes that did not observe them (add-wins on concurrency), while a
  * remove that witnessed every add wins — the OR-set guarantee.
  *
  * Distributed shape: coverage by a set of removes equals coverage by their
  * per-actor MAX witnessed counter (coverage is monotone in the counter), so
  * the fold is one aggregation over removes keyed by (quad, actor), one
  * equi-join against the adds on the same key, and a final distinct — three
  * key-partitioned shuffles, no driver state, safe at any log size. Op-log
  * replay idempotency is free: duplicated batches contribute identical dots.
  */
object OrSet {

  private val QuadKey = Seq("graph_iri", "subject", "predicate", "obj")

  /** Fold an op-log to the resolved quad set.
    *
    * `ops` columns: `graph_iri, subject, predicate, obj` (the quad),
    * `op` ('add' | 'remove'), `actor` + `counter` (the add's dot), and
    * `witnessed` (`map<string,long>`, the remove's vector clock).
    * Returns the distinct present quads. */
  def fold(ops: DataFrame): DataFrame = {
    val keyCols = QuadKey.map(col)
    val adds = ops.filter(col("op") === "add")
      .select(keyCols ++ Seq(col("actor"), col("counter")): _*)
    val witnessed = ops.filter(col("op") === "remove")
      .select(keyCols :+ explode(col("witnessed")).as(Seq("actor", "w")): _*)
      .groupBy((QuadKey :+ "actor").map(col): _*)
      .agg(max(col("w")).as("wmax"))
    adds.join(witnessed, QuadKey :+ "actor", "left")
      .filter(col("wmax").isNull || col("counter") > col("wmax"))
      .select(keyCols: _*)
      .distinct()
  }
}
