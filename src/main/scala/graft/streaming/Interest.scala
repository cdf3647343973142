package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watch-interest digest rebuild — the debounced per-realm publisher the
  * reference runs over its watch subscriptions
  * (`operations/src/notifications/watch/interest.rs:148-258`
  * `publish_watch_interest`, `:298-322` `build_realm_digest`;
  * `core/src/structs/notification_watch.rs:465-487`
  * `WatchInterestDigest::from_subscriptions`;
  * `operations/src/notifications/watch/authorization.rs:536-580`
  * `filter_authorized_watch_subscriptions`).
  *
  * Contract:
  *  - only realms with a pending dirty marker rebuild (`interest.rs:161-172`);
  *  - a realm's digest is built from subscriptions whose owner is still
  *    assigned to this node AND whose authorization evaluates Authorized —
  *    Denied drops the subscription, Unavailable additionally sets the
  *    realm's `check_failed` retry flag (`authorization.rs:561-571`);
  *  - identical path prefixes dedup by OR-ing their event masks and entries
  *    sort by prefix (`notification_watch.rs:465-478`);
  *  - an EMPTY digest still publishes so peers drop stale interest
  *    (`interest.rs:151-152`): empty realms emit one null-prefix row;
  *  - a digest is written only when it changed; an unchanged digest with no
  *    pending marker is skipped entirely (`interest.rs:216-218`);
  *  - dirty markers clear only while their generation is unchanged — a
  *    concurrent CRUD that bumped the generation keeps its retry signal
  *    (`interest.rs:346-350`).
  *
  * Scale: subscriptions group-shuffle once on `(realm, path_prefix)`;
  * markers / current digests / pending flags are config-plane relations and
  * broadcast. Nothing is corpus-sized.
  */
object Interest {

  /** Rebuild digests for the dirty realms.
    *
    * `subs(realm, path_prefix, event_mask, owner_node, authz)` with
    * `authz` ∈ ok | denied | unavailable; `markers(realm, gen_observed,
    * gen_now)`; `current(realm, digest_sig)` — the previously published
    * digest's canonical signature; `pending(realm)` — realms with an
    * unconsumed pending marker; `localNode` — this node's id.
    *
    * Returns one row per digest entry — plus a null-prefix row for an
    * empty digest — with the realm verdict columns:
    * `(realm, path_prefix, event_mask, published, check_failed, n_dropped,
    * n_cleared)`. */
  /** Holder-side watch-event expansion (reference
    * `operations/src/notifications/watch/expand.rs:19-170`
    * `expand_watch_events`; `notifications/routing.rs:117-143`
    * `route_watch_event`; `core/src/structs/notification_watch.rs:34-77`
    * `watch_path_matches`/`parse_data_watch_resource_path`).
    *
    * Per (event, subscription) pair within a realm:
    *  - subscriptions whose owner is no longer assigned to the local
    *    holder are SKIPPED (and flagged stale so the caller retracts
    *    interest);
    *  - a subscription created AFTER the event never delivers
    *    retroactively;
    *  - the path matches on a plain prefix — or, for the three DATA kinds
    *    only, through the group-alias rule: both sides parse as
    *    `s3/{group}/{node}/{bucket}/{key}` (group non-nil, bucket
    *    non-empty) and match on (node, bucket, key-prefix) with the GROUP
    *    ignored — "treating a data path's group as an alias when its node
    *    and bucket identify the same node-local bucket";
    *  - the event kind must be inside the subscription's mask;
    *  - an invalid authorization at stage time suppresses the record
    *    (`denied`).
    *
    * `events(event_id, realm, kind_bit, path, occurred_at_ms)`;
    * `subs(watch_id, realm, owner, path_prefix, event_mask,
    * created_at_ms, held, authz_ok)`. Returns one row per candidate pair:
    * `(event_id, watch_id, verdict, recipient)` with verdict ∈ delivered |
    * not_held | created_after_event | path_mismatch | mask_mismatch |
    * denied.
    *
    * Scale: the pair relation is (realm-events × realm-subscriptions) —
    * the reference's own loop shape; subscriptions broadcast (50-per-user
    * cap × realm users), events stream through map-side. */
  def routeWatchEvents(events: DataFrame, subs: DataFrame): DataFrame = {
    val NilUlid = "00000000000000000000000000"
    val re = "^s3/([^/]+)/([^/]+)/([^/]+)/(.*)$"
    def seg(c: Column, i: Int) = regexp_extract(c, re, i)
    def parses(c: Column) =
      c.rlike(re) && seg(c, 1) =!= NilUlid && seg(c, 3) =!= ""
    val dataKinds = Seq(2L, 4L, 8L)
    val pairs = events.join(subs, Seq("realm"))
    val aliasMatch = col("kind_bit").isin(dataKinds: _*) &&
      parses(col("path")) && parses(col("path_prefix")) &&
      seg(col("path"), 2) === seg(col("path_prefix"), 2) &&
      seg(col("path"), 3) === seg(col("path_prefix"), 3) &&
      seg(col("path"), 4).startsWith(seg(col("path_prefix"), 4))
    pairs
      .withColumn("path_ok",
        col("path").startsWith(col("path_prefix")) || aliasMatch)
      .withColumn("verdict",
        when(!col("held"), "not_held")
          .when(col("created_at_ms") > col("occurred_at_ms"),
            "created_after_event")
          .when(!col("path_ok"), "path_mismatch")
          .when(col("event_mask").bitwiseAND(col("kind_bit")) === 0,
            "mask_mismatch")
          .when(!col("authz_ok"), "denied")
          .otherwise("delivered"))
      .select(col("event_id"), col("watch_id"), col("verdict"),
        when(col("verdict") === "delivered", col("owner")).as("recipient"))
  }

  /** Idempotent inbox upsert (reference
    * `operations/src/notifications/inbox.rs:102-178`
    * `upsert_inbox_records_in_transaction`): each record keys on
    * (recipient, created_at_ms, notification_id); a key already in the
    * inbox is silently skipped — re-expanded watch events never duplicate
    * — and the outcome reports the written count plus the DISTINCT
    * recipients actually written (the live-stream wake set). Batch-
    * internal duplicates are NOT deduped: both check against the stored
    * inbox only and both count (the second write is the same bytes).
    *
    * `records(notification_id, recipient, created_at_ms)`;
    * `existing(notification_id, recipient, created_at_ms)`. Returns per
    * record `(notification_id, recipient, inserted, n_written,
    * n_recipients)` with batch trailers on every row. */
  def upsertInbox(records: DataFrame, existing: DataFrame): DataFrame = {
    val marked = records.join(
      existing.select(col("notification_id"), col("recipient"),
        col("created_at_ms"), lit(true).as("__dup")),
      Seq("notification_id", "recipient", "created_at_ms"), "left_outer")
      .withColumn("inserted", !coalesce(col("__dup"), lit(false)))
    val trailer = marked.agg(
      sum(when(col("inserted"), 1L).otherwise(0L)).as("n_written"),
      countDistinct(when(col("inserted"), col("recipient")))
        .as("n_recipients"))
    marked.crossJoin(broadcast(trailer))
      .select(col("notification_id"), col("recipient"), col("inserted"),
        col("n_written"), col("n_recipients"))
  }

  /** Watch-subscription create validation (reference
    * `operations/src/notifications/watch/subscriptions.rs:139-260`;
    * caps from `core/src/structs/notification_watch.rs:13-14`):
    * field checks first — empty prefix, a leading slash ("emitted event
    * paths carry no leading slash, so a leading-slash prefix could never
    * match"), prefix over 1024 bytes, an empty mask, mask bits outside
    * the four valid events (1|2|4|8) — then an invalid authorization
    * binding, then the 50-per-user cap at insert time.
    *
    * `reqs(req_id, owner, path_prefix, event_mask, authz_valid)`;
    * `existing(owner, n_subs)`. Returns `(req_id, verdict)` with verdict
    * ∈ created | empty_prefix | leading_slash | prefix_too_long |
    * empty_mask | invalid_mask | unauthorized | cap_exceeded. */
  def validateSubscriptions(reqs: DataFrame, existing: DataFrame)
      : DataFrame = reqs
    .join(existing.select(col("owner"), col("n_subs")), Seq("owner"),
      "left_outer")
    .withColumn("verdict",
      when(col("path_prefix") === "", "empty_prefix")
        .when(col("path_prefix").startsWith("/"), "leading_slash")
        .when(length(col("path_prefix")) > 1024, "prefix_too_long")
        .when(col("event_mask") === 0, "empty_mask")
        .when((col("event_mask").bitwiseAND(lit(~15L))) =!= 0,
          "invalid_mask")
        .when(!col("authz_valid"), "unauthorized")
        .when(coalesce(col("n_subs"), lit(0L)) >= 50, "cap_exceeded")
        .otherwise("created"))
    .select(col("req_id"), col("verdict"))

  def publish(subs: DataFrame, markers: DataFrame, current: DataFrame,
      pending: DataFrame, localNode: String): DataFrame = {
    val dirtyRealms = markers.select(col("realm")).distinct()

    val held = subs.filter(col("owner_node") === localNode)
    val authorized = held.filter(col("authz") === "ok")
    val entries = authorized
      .groupBy("realm", "path_prefix")
      .agg(expr("bit_or(event_mask)").cast("long").as("event_mask"))

    // realm-level flags from the full (pre-filter) subscription view
    val realmFlags = subs
      .groupBy("realm")
      .agg(
        max(when(col("owner_node") === localNode &&
          col("authz") === "unavailable", true).otherwise(false))
          .as("check_failed"),
        sum(when(col("owner_node") =!= localNode ||
          col("authz").isin("denied", "unavailable"), 1L).otherwise(0L))
          .as("n_dropped"))

    val sig = entries
      .groupBy("realm")
      .agg(array_join(transform(array_sort(collect_list(struct(
          col("path_prefix"),
          concat_ws(":", col("path_prefix"), col("event_mask")).as("s")))),
        x => x.getField("s")), ",").as("new_sig"))

    val cleared = markers
      .groupBy("realm")
      .agg(sum(when(col("gen_observed") === col("gen_now"), 1L)
        .otherwise(0L)).as("n_cleared"))

    val realmState = dirtyRealms
      .join(broadcast(sig), Seq("realm"), "left_outer")
      .join(broadcast(current), Seq("realm"), "left_outer")
      .join(broadcast(pending.select(col("realm"),
        lit(true).as("has_pending"))), Seq("realm"), "left_outer")
      .join(broadcast(realmFlags), Seq("realm"), "left_outer")
      .join(broadcast(cleared), Seq("realm"), "left_outer")
      .select(col("realm"),
        // empty digest canonicalizes to the empty signature
        (coalesce(col("new_sig"), lit("")) =!=
          coalesce(col("digest_sig"), lit("<absent>"))).as("changed"),
        coalesce(col("has_pending"), lit(false)).as("has_pending"),
        coalesce(col("check_failed"), lit(false)).as("check_failed"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("n_cleared"), lit(0L)).as("n_cleared"))
      // an unchanged digest with no pending marker publishes nothing, but
      // its observed markers still clear (interest.rs:216-218 `continue`
      // vs the unconditional clear_consumed_markers at `:254`)
      .withColumn("published", col("changed") || col("has_pending"))

    realmState
      .join(entries, Seq("realm"), "left_outer")
      .select(col("realm"), col("path_prefix"),
        coalesce(col("event_mask"), lit(0L)).as("event_mask"),
        col("published"), col("check_failed"), col("n_dropped"),
        col("n_cleared"))
  }
}
