package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Realm genesis + token issuance (reference
  * `operations/src/create_realm.rs` (1076 LoC),
  * `operations/src/create_token.rs` (212),
  * `core/src/structs/placement.rs`, `core/src/structs/realm.rs`).
  */
object Realms {

  // placement.rs:233-246, structured_id/layout.rs:6-19
  val FirstHandle = 1L // METADATA_HANDLE
  val FirstGrantableHandle = 3L
  val HandleSpaceEnd: Long = 1L << 20 // MAX_PLACEMENT_HANDLE + 1
  val HandleRangeSize = 1024L
  val HandleBands: Long = (HandleSpaceEnd - FirstGrantableHandle) / HandleRangeSize
  val BandSpaceEnd: Long = FirstGrantableHandle + HandleBands * HandleRangeSize
  val MaxNodeLocationLen = 64 // placement.rs:21
  val DefaultNodeWeight = 100L // placement.rs:11
  val MaxNodeWeight = 10000L // placement.rs:19

  /** CreateRealm genesis plan (`create_realm.rs:80-330`): one batch of
    * realm-creation requests, each synthesizing the genesis documents —
    * everything the operation DECIDES is derived deterministically:
    *
    *  - `normalize_node_placement_input` (`placement.rs:33-51`): the
    *    location trims (empty-after-trim = unset) and rejects >64 chars
    *    AFTER trim → NodeLocationTooLong; a present weight clamps into
    *    1..=10000, absent defaults to 100;
    *  - the creating coordinator self-issues the ROOT band pool covering
    *    the whole assignable space [3, 3+1023*1024) and consumes the first
    *    band [3, 1027) before any other node onboards
    *    (`create_realm.rs:110-127`); the band's reserved first handle (3)
    *    is the creator's JobControl binding, and placement seeding binds
    *    Metadata to handle 1 (`realm.rs:455-463`);
    *  - `seed_default_placement` (`realm.rs:423-465`): strategies
    *    `default` (replica-capped) + `everywhere`; the four control
    *    classes (MetadataRegistry, Admin, Group, User) bind to
    *    `everywhere`; `default` becomes the default strategy;
    *  - the auth doc seeds exactly one role, `realm_admin`, holding WRITE
    *    on the realm's admin double-star glob path
    *    (`new_default_realm_doc`, `realm.rs:121-138`);
    *  - the admin-reducer seed publishes a FIXED event sequence
    *    (`admin_reducer_seed_writes` `:174-301`): NodeEnsured + 1 pool +
    *    1 range + the oidc providers SORTED BY ID + Settings +
    *    Description + 2 strategies + 2 placement bindings +
    *    DefaultStrategy + 4 strategy bindings + NodePlacement = 15 + n
    *    config events, plus the one realm-auth role event → 16 + n outbox
    *    records.
    *
    * `requests(req_id, realm_id, node_id, description, node_location,
    * node_weight, oidc1_id, oidc2_id)` (nullable location/weight/oidc). */
  def createRealmPlan(requests: DataFrame): DataFrame = {
    val trimmed = trim(col("node_location"))
    val nOidc = when(col("oidc1_id").isNotNull, 1L).otherwise(0L) +
      when(col("oidc2_id").isNotNull, 1L).otherwise(0L)
    val verdict =
      when(col("node_location").isNotNull &&
        length(trimmed) > MaxNodeLocationLen, "NodeLocationTooLong")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    requests.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      when(ok, coalesce(trimmed, lit(""))).as("location_out"),
      // greatest()/least() skip NULLs in Spark, so the absent-weight
      // default must branch explicitly — a coalesce around the clamp
      // would silently turn "absent" into "clamped to 1"
      when(ok, when(col("node_weight").isNull, lit(DefaultNodeWeight))
        .otherwise(least(greatest(col("node_weight"), lit(1L)),
          lit(MaxNodeWeight)))).as("weight_out"),
      when(ok, lit(FirstGrantableHandle)).as("pool_start"),
      when(ok, lit(BandSpaceEnd)).as("pool_end"),
      when(ok, lit(FirstGrantableHandle)).as("range_start"),
      when(ok, lit(FirstGrantableHandle + HandleRangeSize)).as("range_end"),
      when(ok, lit(FirstGrantableHandle)).as("jobcontrol_handle"),
      when(ok, lit(FirstHandle)).as("metadata_handle"),
      when(ok, lit("realm_admin")).as("admin_role"),
      when(ok, concat(lit("/"), col("realm_id"), lit("/admin/**")))
        .as("admin_perm_path"),
      when(ok, lit(2L)).as("n_strategies"),
      when(ok, lit(4L)).as("n_everywhere_bindings"),
      // oidc providers publish sorted by id
      when(ok, concat_ws(",", array_sort(filter(
        array(col("oidc1_id"), col("oidc2_id")), _.isNotNull))))
        .as("providers_sorted"),
      when(ok, lit(15L) + nOidc).as("n_config_events"),
      when(ok, lit(16L) + nOidc).as("n_outbox"))
  }

  /** CreateToken verdicts (`create_token.rs:46-160`):
    *
    *  - a Local node cannot issue tokens — rejected at construction
    *    (`:48-50`);
    *  - an explicit expiry must be strictly AFTER `iat`, equal fails
    *    (`:61-66`);
    *  - an absent expiry defaults to iat + 12 CALENDAR months (chrono
    *    `checked_add_months`, `:68-74`) — month arithmetic, not a fixed
    *    second count;
    *  - the claim set: Management tokens carry no issuer pubkey and no
    *    delegation; Server tokens carry both (`:78-125`); the signature
    *    itself (EdDSA over the claims) is transport, out of scope.
    *
    * `requests(req_id, capability, iat_s, expiry_s)`. */
  def tokenVerdicts(requests: DataFrame): DataFrame = {
    val verdict =
      when(col("capability") === "Local", "NotEnoughCapabilities")
        .when(col("expiry_s").isNotNull &&
          col("expiry_s") <= col("iat_s"), "InvalidTimestamp")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    requests.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      when(ok, coalesce(col("expiry_s"),
        unix_timestamp(expr("timestampadd(MONTH, 12, timestamp_seconds(iat_s))"))))
        .as("exp_out"),
      when(ok, col("capability") === "Server").as("has_issuer_pubkey"),
      when(ok, col("capability") === "Server").as("has_delegation"))
  }
}
