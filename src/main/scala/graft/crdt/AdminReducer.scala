package graft.crdt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Admin-document MV-register fold — the causal multi-value register the
  * reference reduces admin documents (users, groups, realm config) with
  * (`core/src/admin_document_reducer.rs:1371-1423` `reduce_value`,
  * `core/src/admin_documents.rs:27-29` `AdminDocumentClock::observes`).
  *
  * Reference semantics, per (document, attribute path): every event carries a
  * causal dot `(event_id, origin_node, origin_seq)` and the vector clock it
  * observed. An arriving event
  *  - is dropped as stale when any recorded dot on the path has the same
  *    origin at an equal-or-later seq (`event_is_stale_for_path`, `:1435`);
  *  - supersedes exactly the recorded values whose dots it observes
  *    (`remove_conflict_values_superseded_by`, `:1467`;
  *    `event_observes_dot`, `:1533` — clock covers the dot, or same origin
  *    at a strictly earlier seq);
  *  - merges with an equal surviving value, keeping both dots
  *    (`:1421-1422`), or records a conflict when surviving values differ
  *    (`:1413-1418`); a conflict whose values become all-equal collapses
  *    back to one version carrying the merged dots (`:1385-1400`).
  *
  * Fixpoint: after a causally-consistent delivery of the whole log, the
  * state per path is exactly the **causal frontier** — the events whose dot
  * no other event on the path observes. All-equal frontier values converge
  * to one version whose representative dot is the minimum (dot order is
  * `event_id` first, `admin_documents.rs:42-47`, and ULIDs are
  * time-ordered); differing values surface as a conflict listing the
  * frontier values sorted by dot. `AdminReducerSpec` pins this equivalence
  * against a literal sequential re-implementation of `reduce_value` folded
  * in log order.
  *
  * Distributed shape: the sequential reducer is row-at-a-time per document;
  * here the frontier is computed declaratively — one anti-join of the event
  * log against itself on the `(doc, path)` key with the dominance predicate,
  * then one grouped aggregation. Both shuffle on `(doc, path)` only; the
  * pairwise work is quadratic strictly *within* a path group, which is
  * bounded by the edit count of a single admin attribute (tens, by
  * contract), never by corpus size — so the plan holds at any number of
  * documents.
  */
object AdminReducer {

  /** Resolve an admin-document event log to its per-(doc, path) state.
    *
    * `events` columns: `pos` (long, unique, total log order — the event-id
    * proxy), `doc` (long), `path` (string), `oidx` (int, origin index
    * 0/1/2), `seq` (long, per-(doc, origin) sequence), `obs0/obs1/obs2`
    * (long, the event's observed clock entry per origin), `value` (string,
    * null = attribute removal).
    *
    * Returns `(doc, path, conflicted, n_candidates, value, rep_pos,
    * candidates)`: converged paths carry the value (null for a converged
    * removal), the representative dot's `pos` and the merged-dot count;
    * conflicted paths carry the dot-sorted `pos:oidx:seq:value` candidate
    * list. */
  def frontier(events: DataFrame): DataFrame = {
    val e1 = events.alias("e1")
    val e2 = events.alias("e2")
    // e2 observes e1's dot: its clock entry for e1's origin covers e1.seq,
    // or same origin at a strictly later seq (event_observes_dot, :1533).
    val obsForOrigin = when(col("e1.oidx") === 0, col("e2.obs0"))
      .when(col("e1.oidx") === 1, col("e2.obs1"))
      .otherwise(col("e2.obs2"))
    val dominated = col("e2.pos") =!= col("e1.pos") &&
      (obsForOrigin >= col("e1.seq") ||
        (col("e2.oidx") === col("e1.oidx") && col("e2.seq") > col("e1.seq")))
    val survivors = e1.join(e2,
      col("e1.doc") === col("e2.doc") && col("e1.path") === col("e2.path") &&
        dominated,
      "left_anti")

    val valKey = coalesce(col("value"), lit("<removed>"))
    survivors
      .groupBy("doc", "path")
      .agg(
        count(lit(1)).as("n_candidates"),
        countDistinct(valKey).as("nd"),
        max(col("value")).as("conv_value"),
        min(col("pos")).cast("long").as("min_pos"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"),
              concat_ws(":", col("pos"), col("oidx"), col("seq"), valKey)
                .as("s")))),
            x => x.getField("s")),
          ",").as("cand_all"))
      .select(
        col("doc"), col("path"),
        (col("nd") > 1).as("conflicted"),
        col("n_candidates"),
        when(col("nd") === 1, col("conv_value")).as("value"),
        when(col("nd") === 1, col("min_pos")).as("rep_pos"),
        when(col("nd") > 1, col("cand_all")).as("candidates"))
  }
}
