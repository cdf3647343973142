package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Realm-placement mutation validation (reference
  * `operations/src/mutate_realm_placement.rs:104-258`): each admin mutation
  * validates against the live realm-config document before it applies:
  *
  *  - `UpsertNode` of a DRAINING node freezes placement attributes —
  *    location/weight/full/labels must equal the current entry, or the
  *    defaults (`default`, weight 100, not full, no labels,
  *    `core/src/structs/placement.rs:10-11`) when the node is new
  *    (`mutate_realm_placement.rs:106-130`);
  *  - `UpsertStrategy` with `replica_count == 0` is invalid (`:131-135`);
  *  - `SetDefaultStrategy` / `SetBinding` require the strategy to exist AND
  *    a metadata-class binding for the scope — group scopes fall back to
  *    the realm binding (`:136-158`, `require_metadata_binding:230-257`);
  *  - blob-class `SetBinding` skips the metadata-binding requirement
  *    (`:147-151` — scope resolves to None);
  *  - `RemoveStrategy` is blocked while referenced by the default, any
  *    strategy binding, placement binding, or override (`:193-214`);
  *  - `SetOverride` requires its strategy only when one is named
  *    (`:188-192`).
  *
  * Scale: pure config-plane relations (broadcast all sides); the mutation
  * batch is the only data-sized input and never shuffles. */
object PlacementAdmin {

  val DefaultLocation = "default"
  val DefaultNodeWeight = 100L

  def mutationVerdicts(nodes: DataFrame, strategies: DataFrame,
      metaBindings: DataFrame, referencedStrategies: DataFrame,
      muts: DataFrame): DataFrame = {
    val n = nodes.select(col("node_id"), col("location").as("c_location"),
      col("weight").as("c_weight"), col("full").as("c_full"),
      col("labels_sig").as("c_labels"))
    val st = strategies.select(col("strategy_id"), lit(true).as("s_exists"))
    val mb = metaBindings.select(col("scope").as("mb_scope"),
      col("strategy_id").as("mb_sid"), lit(true).as("mb_exists"))
    val mbRealm = metaBindings.filter(col("scope") === "realm")
      .select(col("strategy_id"), lit(true).as("mb_realm_exists"))
    val ref = referencedStrategies.select(col("strategy_id"),
      lit(true).as("s_referenced"))
    val j = muts
      .join(broadcast(n), Seq("node_id"), "left_outer")
      .join(broadcast(st), Seq("strategy_id"), "left_outer")
      .join(broadcast(mb),
        col("scope") === col("mb_scope") &&
          col("strategy_id") === col("mb_sid"), "left_outer")
      .join(broadcast(mbRealm), Seq("strategy_id"), "left_outer")
      .join(broadcast(ref), Seq("strategy_id"), "left_outer")
    val frozenViolated =
      !(coalesce(col("n_location"), lit(DefaultLocation)) ===
          coalesce(col("c_location"), lit(DefaultLocation)) &&
        coalesce(col("n_weight"), lit(DefaultNodeWeight)) ===
          coalesce(col("c_weight"), lit(DefaultNodeWeight)) &&
        coalesce(col("n_full"), lit(false)) ===
          coalesce(col("c_full"), lit(false)) &&
        coalesce(col("n_labels"), lit("")) ===
          coalesce(col("c_labels"), lit("")))
    // group scopes fall back to the realm binding; blob-class bindings skip
    // the metadata requirement entirely
    val hasMetaBinding = col("mb_exists").isNotNull ||
      (col("scope").startsWith("group:") && col("mb_realm_exists").isNotNull)
    val verdict =
      when(col("kind") === "upsert_node",
        when(col("n_draining") && frozenViolated, "draining_frozen")
          .otherwise("ok"))
        .when(col("kind") === "upsert_strategy",
          when(col("replica_count") === 0, "zero_replica_count")
            .otherwise("ok"))
        .when(col("kind") === "set_default_strategy",
          when(col("s_exists").isNull, "missing_strategy")
            .when(!hasMetaBinding, "no_metadata_binding")
            .otherwise("ok"))
        .when(col("kind") === "set_binding",
          when(col("s_exists").isNull, "missing_strategy")
            .when(col("scope").startsWith("class:") &&
              col("scope") =!= "class:metadata", "ok")
            .when(!hasMetaBinding, "no_metadata_binding")
            .otherwise("ok"))
        .when(col("kind") === "remove_strategy",
          when(col("s_referenced").isNotNull, "strategy_referenced")
            .otherwise("ok"))
        .when(col("kind") === "set_override",
          when(col("strategy_id").isNotNull && col("s_exists").isNull,
            "missing_strategy").otherwise("ok"))
        .otherwise("ok")
    j.select(col("mut_id"), col("kind"), verdict.as("verdict"))
  }

  /** Dangling-strategy reference repair (reference
    * `core/src/admin_document_reducer.rs:300-339`
    * `repair_realm_config_placement_references`): after strategy removals,
    * per realm
    *  - the fallback is the FIRST live strategy id (`BTreeSet::first` — the
    *    minimum, `:309`);
    *  - with no live strategy the default clears, every strategy binding is
    *    removed outright, and every override's strategy nulls (`:311-318`);
    *  - otherwise a missing-or-dangling default, a dangling binding, and a
    *    dangling non-null override each repair to the fallback
    *    (`:320-338`); null overrides stay null.
    * `placement_bindings` are intentionally exempt: immutable, they fail
    * closed at resolve instead (`:301-303`).
    *
    * Inputs: `strategies(realm, strategy_id)` (the live set),
    * `defaults(realm, strategy_id)`, `bindings(realm, scope, strategy_id)`,
    * `overrides(realm, subject, strategy_id)`. Returns one row per
    * reference: `(realm, kind, key, old_strategy, new_strategy, action)`
    * with action ∈ kept | repaired | cleared | removed | nulled.
    *
    * Scale: config-plane relations — every side broadcasts; no data-sized
    * input exists. */
  def repairStrategyRefs(strategies: DataFrame, defaults: DataFrame,
      bindings: DataFrame, overrides: DataFrame): DataFrame = {
    val live = strategies.select(col("realm"), col("strategy_id"),
      lit(true).as("s_live"))
    val fallback = strategies.groupBy("realm")
      .agg(min("strategy_id").as("fb"))
    def enrich(refs: DataFrame) = refs
      .join(broadcast(fallback), Seq("realm"), "left_outer")
      .join(broadcast(live), Seq("realm", "strategy_id"), "left_outer")
    val old = col("strategy_id")
    val isLive = col("s_live").isNotNull
    val noneLive = col("fb").isNull

    val d = enrich(defaults).select(col("realm"), lit("default").as("kind"),
      lit("-").as("key"), old.as("old_strategy"),
      when(noneLive, lit(null).cast("string"))
        .when(old.isNull || !isLive, col("fb")).otherwise(old)
        .as("new_strategy"),
      when(noneLive, "cleared").when(old.isNull || !isLive, "repaired")
        .otherwise("kept").as("action"))
    val b = enrich(bindings).select(col("realm"), lit("binding").as("kind"),
      col("scope").as("key"), old.as("old_strategy"),
      when(noneLive, lit(null).cast("string"))
        .when(!isLive, col("fb")).otherwise(old).as("new_strategy"),
      when(noneLive, "removed").when(!isLive, "repaired").otherwise("kept")
        .as("action"))
    val o = enrich(overrides).select(col("realm"), lit("override").as("kind"),
      col("subject").as("key"), old.as("old_strategy"),
      when(noneLive || old.isNull, lit(null).cast("string"))
        .when(!isLive, col("fb")).otherwise(old).as("new_strategy"),
      when(old.isNull, "kept")
        .when(noneLive, "nulled")
        .when(!isLive, "repaired").otherwise("kept").as("action"))
    d.unionByName(b).unionByName(o)
  }
}
