package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Node-info heartbeat utilization (reference
  * `operations/src/node_info.rs:165-254`):
  *
  *  - held-document count: a registry row counts as held when its recorded
  *    placement bucket `(strategy, shard)` is in the node's held set, OR
  *    when the placement is NIL (pre-strategy rows are held by every local
  *    node, `node_info.rs:192-227`) — everywhere-replicated rows are NOT
  *    each counted as local;
  *  - load permille: 1-minute load per logical core scaled to permille,
  *    half-up rounded, clamped to 0..=1000, and zero cores yields 0 instead
  *    of dividing by zero (`node_info.rs:248-254`). Load rides micro-units
  *    so the gate stays integer-exact.
  *
  * Scale: the held set is config-sized (broadcast into the registry scan);
  * the NIL count is one scalar aggregate shared by every node. */
object NodeInfoStats {

  /** nodes: (node_id, cores, load1_u); held: (node_id, strategy_id, shard);
    * registry placements: (strategy_id nullable = NIL, shard). */
  def heartbeat(nodes: DataFrame, held: DataFrame,
      registry: DataFrame): DataFrame = {
    val nil = registry.filter(col("strategy_id").isNull)
      .agg(count(lit(1)).as("__nil"))
    val matched = registry.filter(col("strategy_id").isNotNull)
      .join(broadcast(held), Seq("strategy_id", "shard"))
      .groupBy("node_id").agg(count(lit(1)).as("__m"))
    val permille = when(col("cores") === 0, 0L)
      .otherwise(least(lit(1000L),
        floor((col("load1_u") * 1000 + col("cores") * 500000) /
          (col("cores") * 1000000)).cast("long")))
    nodes.join(matched, Seq("node_id"), "left_outer")
      .crossJoin(broadcast(nil))
      .select(col("node_id"),
        (coalesce(col("__m"), lit(0L)) + col("__nil")).as("held_docs"),
        permille.as("load_permille"))
  }
}
