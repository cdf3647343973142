package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SetRealmQuota validation ladder (reference
  * `operations/src/set_realm_quota.rs:378-436` `validate_quota` +
  * `:129-160` write-path ordering).
  *
  * Check order is exactly the reference's — `validate_quota` runs BEFORE
  * the document read is inspected, so an invalid config on a missing realm
  * reports InvalidQuota, not RealmConfigNotFound:
  *
  *  1. `warn_threshold_percent` outside 1..=100;
  *  2. `grace_factor_percent` < 100;
  *  3. `max_devices_per_user` present (unsupported until device ownership
  *     enforcement exists);
  *  4. group overrides IN DECLARATION ORDER — the first failing row
  *     decides, and within a row: duplicate group id (BTreeSet insert
  *     fails), then override grace < 100, then grace WITHOUT quota_bytes
  *     ("grace is incoherent on an unlimited quota");
  *  5. user cap overrides in order: duplicate user id;
  *  6. then the realm config document must exist (RealmConfigNotFound);
  *  7. then the stored admin-reducer state's target must match
  *     (`AdminDocumentReducerError::TargetMismatch`, `:155-158`; the
  *     reducer fold itself is the adr1 gate's contract).
  *
  * Admitted configs also resolve a probe group's effective ceiling through
  * the same `realm.rs:230-259` ladder po1's quota gate consumes — the
  * write side and the read side of quota config meet here.
  *
  * Scale: request batch + per-request override rows are request-plane;
  * every check is a window over (req_id)-keyed rows — one batch-sized
  * shuffle, no corpus involvement.
  */
object SetQuota {

  /** `requests(req_id, realm_id, warn_pct, grace_pct, has_max_devices,
    * default_quota_bytes)`; `overrides(req_id, ord, group_id, quota_bytes,
    * grace)`; `userCaps(req_id, ord, user_id)`; `realms(realm_id)` —
    * existing config documents; `reducers(realm_id, stored_target)` —
    * stored admin-reducer states (absent = fresh state, always valid);
    * `probeGroup` — the group whose effective ceiling Ok rows report. */
  def verdicts(requests: DataFrame, overrides: DataFrame,
      userCaps: DataFrame, realms: DataFrame, reducers: DataFrame,
      probeGroup: String): DataFrame = {
    // first failing override row per request, in declaration order
    val dupW = Window.partitionBy("req_id", "group_id").orderBy("ord")
    val ovrFail = overrides
      .withColumn("__dup", row_number().over(dupW) > 1)
      .withColumn("__reason",
        when(col("__dup"), "InvalidQuota:dup_group_override")
          .when(col("grace").isNotNull && col("grace") < 100,
            "InvalidQuota:override_grace")
          .when(col("grace").isNotNull && col("quota_bytes").isNull,
            "InvalidQuota:grace_without_quota"))
      .filter(col("__reason").isNotNull)
      .groupBy("req_id")
      .agg(min_by(col("__reason"), col("ord")).as("ovr_reason"))

    val capFail = userCaps
      .withColumn("__dup",
        row_number().over(Window.partitionBy("req_id", "user_id")
          .orderBy("ord")) > 1)
      .filter(col("__dup"))
      .groupBy("req_id")
      .agg(lit("InvalidQuota:dup_user_cap").as("cap_reason"))

    // probe-group ceiling under the ADMITTED config (realm.rs:230-259):
    // an override row for the probe group wins (NULL quota = unlimited),
    // else the request's default; grace is the override's else the
    // request's; integer floor
    val probe = overrides.filter(col("group_id") === probeGroup)
      .groupBy("req_id")
      .agg(min_by(struct(col("quota_bytes"), col("grace")), col("ord"))
        .as("__p"))
      .select(col("req_id"), col("__p.quota_bytes").as("p_quota"),
        col("__p.grace").as("p_grace"), lit(true).as("p_has"))

    val nOvr = overrides.groupBy("req_id")
      .agg(count(lit(1)).as("__n_ovr"))

    val verdict =
      when(col("warn_pct") < 1 || col("warn_pct") > 100,
        "InvalidQuota:warn_threshold")
        .when(col("grace_pct") < 100, "InvalidQuota:grace_factor")
        .when(col("has_max_devices"), "InvalidQuota:max_devices")
        .when(col("ovr_reason").isNotNull, col("ovr_reason"))
        .when(col("cap_reason").isNotNull, col("cap_reason"))
        .when(col("realm_ok").isNull, "RealmConfigNotFound")
        .when(col("stored_target").isNotNull &&
          col("stored_target") =!= concat(lit("realm-config:"),
            col("realm_id")), "TargetMismatch")
        .otherwise("Ok")

    requests
      .join(broadcast(ovrFail), Seq("req_id"), "left")
      .join(broadcast(capFail), Seq("req_id"), "left")
      .join(broadcast(realms.select(col("realm_id"),
        lit(true).as("realm_ok"))), Seq("realm_id"), "left")
      .join(broadcast(reducers), Seq("realm_id"), "left")
      .join(broadcast(probe), Seq("req_id"), "left")
      .join(broadcast(nOvr), Seq("req_id"), "left")
      .withColumn("verdict", verdict)
      .select(col("req_id"), col("verdict"),
        when(col("verdict") === "Ok", coalesce(col("__n_ovr"), lit(0L)))
          .as("n_overrides"),
        when(col("verdict") === "Ok",
          when(col("p_has").isNotNull,
            (col("p_quota") * coalesce(col("p_grace"), col("grace_pct")))
              .divide(100).cast("long"))
            .otherwise((col("default_quota_bytes") * col("grace_pct"))
              .divide(100).cast("long")))
          .as("probe_ceiling"))
  }
}
