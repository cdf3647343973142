package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's remaining point-read operations (reference
  * `operations/src/get_user.rs` (196 LoC), `operations/src/get_group.rs`
  * (332), `operations/src/get_realm_config.rs`,
  * `operations/src/dashboard.rs` (95)) — closing the read surface.
  */
object Reads {

  /** GetUser (`get_user.rs:90-168`): the permission sub-operation runs
    * FIRST (READ on the realm's admin user path) — a denial is
    * Unauthorized before any parse or read; then `UserId::from_string`
    * must parse (`:113` — a malformed id is a conversion failure, modeled
    * as InvalidUserId); then the point read — absent → UserNotFound.
    *
    * `requests(req_id, user_id, authorized, id_parses)`;
    * `users(user_id, name, n_subjects)`. */
  def getUsers(requests: DataFrame, users: DataFrame): DataFrame = {
    val probe = requests.select("user_id").distinct()
    val hits = users.join(broadcast(probe), Seq("user_id"))
      .select(col("user_id"), col("name"), col("n_subjects"))
    val verdict =
      when(!col("authorized"), "Unauthorized")
        .when(!col("id_parses"), "InvalidUserId")
        .when(col("name").isNull, "UserNotFound")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    requests.join(broadcast(hits), Seq("user_id"), "left")
      .withColumn("verdict", verdict)
      .select(col("req_id"), col("verdict"),
        when(ok, col("name")).as("name"),
        when(ok, col("n_subjects")).as("n_subjects"))
  }

  /** GetGroup (`get_group.rs:48-77,131-190`): one transaction reads the
    * group record then its authorization document — an absent group is
    * GroupNotFound, a PRESENT group whose auth doc is missing is the
    * distinct AuthDocNotFound (a store inconsistency, never conflated
    * with the group's absence).
    *
    * `requests(req_id, group_id)`; `groups(group_id, name)`;
    * `authDocs(group_id, n_roles)`. */
  def getGroups(requests: DataFrame, groups: DataFrame,
      authDocs: DataFrame): DataFrame = {
    val probe = requests.select("group_id").distinct()
    val gHits = groups.join(broadcast(probe), Seq("group_id"))
      .select(col("group_id"), col("name"))
    val aHits = authDocs.join(broadcast(probe), Seq("group_id"))
      .select(col("group_id"), col("n_roles"))
    val verdict =
      when(col("name").isNull, "GroupNotFound")
        .when(col("n_roles").isNull, "AuthDocNotFound")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    requests
      .join(broadcast(gHits), Seq("group_id"), "left")
      .join(broadcast(aHits), Seq("group_id"), "left")
      .withColumn("verdict", verdict)
      .select(col("req_id"), col("verdict"),
        when(ok, col("name")).as("name"),
        when(ok, col("n_roles")).as("n_roles"))
  }

  /** GetRealmConfig (`get_realm_config.rs:73-96`): a bare point read —
    * absent → DocumentNotFound.
    *
    * `requests(req_id, realm_id)`; `configs(realm_id, description,
    * n_nodes)`. */
  def getRealmConfigs(requests: DataFrame, configs: DataFrame): DataFrame = {
    val probe = requests.select("realm_id").distinct()
    val hits = configs.join(broadcast(probe), Seq("realm_id"))
      .select(col("realm_id"), col("description"), col("n_nodes"))
    val ok = col("description").isNotNull
    requests.join(broadcast(hits), Seq("realm_id"), "left")
      .select(col("req_id"),
        when(ok, "Ok").otherwise("DocumentNotFound").as("verdict"),
        when(ok, col("description")).as("description"),
        when(ok, col("n_nodes")).as("n_nodes"))
  }

  /** The ten document-sync target kinds whose outbox traffic invalidates
    * the dashboard (`dashboard.rs:23-39` `targets_change_dashboard`);
    * WatchInterest / WatchSubscription / NodeInfo traffic never does. */
  val DashboardKinds: Seq[String] = Seq("Group", "GroupAuthorization",
    "RealmAuthorization", "RealmConfig", "User", "MetadataRegistry",
    "MetadataCreateEvent", "MetadataDocumentLifecycle",
    "MetadataGraphLifecycle", "NodeUsage")

  /** Per-batch dashboard invalidation: a batch notifies iff ANY of its
    * targets is dashboard-relevant. `events(batch_id, target_kind)` →
    * `(batch_id, notify, n_relevant)`. One partial-aggregated pass. */
  def dashboardNotify(events: DataFrame): DataFrame =
    events.groupBy("batch_id")
      .agg(
        max(col("target_kind").isin(DashboardKinds: _*)).as("notify"),
        sum(when(col("target_kind").isin(DashboardKinds: _*), 1L)
          .otherwise(0L)).as("n_relevant"))

  /** The two bare document reads (reference
    * `operations/src/read_realm_authorization.rs:79-110` — returns
    * `Option`, an absent doc is a plain None, NEVER an error — and
    * `operations/src/read_user_document.rs:30,64` — absent IS NotFound).
    * The asymmetry is the point: auth docs are optional realm state,
    * user docs are required.
    *
    * `requests(req_id, op, key)` with op ∈ realm_auth | user_doc;
    * `realmAuth(key, n_roles)`; `users(key, name)`. */
  def docReads(requests: DataFrame, realmAuth: DataFrame,
      users: DataFrame): DataFrame = {
    val probe = requests.select("key").distinct()
    val raHits = realmAuth.join(broadcast(probe), Seq("key"))
      .select(col("key"), col("n_roles"))
    val uHits = users.join(broadcast(probe), Seq("key"))
      .select(col("key"), col("name"))
    requests
      .join(broadcast(raHits), Seq("key"), "left")
      .join(broadcast(uHits), Seq("key"), "left")
      .select(col("req_id"), col("op"),
        when(col("op") === "realm_auth", "Ok") // absent is Ok(None)
          .when(col("name").isNull, "NotFound")
          .otherwise("Ok").as("verdict"),
        when(col("op") === "realm_auth", col("n_roles").isNotNull)
          .as("present"),
        when(col("op") === "realm_auth", col("n_roles")).as("n_roles"),
        when(col("op") === "user_doc", col("name")).as("name"))
  }

  /** Blob permission-path resolution (reference
    * `operations/src/blob/resolve_blob_permission_paths.rs:58-86`): the
    * hash→path alias index is iterated under the blake3 prefix and the
    * candidates sort by `(permission_path, version_id)` — the
    * deterministic order downstream permission checks rely on. An empty
    * result is a valid Ok (the blob has no aliases).
    *
    * `requests(req_id, blake3)`; `index(blake3, permission_path,
    * version_id)`. Output: one row per candidate with its 1-based `pos`;
    * alias-less requests keep one row with NULL candidate columns.
    *
    * Scale: the alias index is corpus-side — request hashes broadcast
    * into the prefix scan; per-request sorts are alias-count bounded. */
  def blobPermissionPaths(requests: DataFrame, index: DataFrame): DataFrame = {
    val probe = requests.select("blake3").distinct()
    val hits = index.join(broadcast(probe), Seq("blake3"))
      .select(col("blake3"), col("permission_path"), col("version_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("blake3")
      .orderBy("permission_path", "version_id")
    val ranked = hits.withColumn("pos", row_number().over(w))
    requests.join(broadcast(ranked), Seq("blake3"), "left")
      .select(col("req_id"), col("pos"), col("permission_path"),
        col("version_id"))
  }
}
