package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UpdateUser ladder (reference `operations/src/update_user.rs` +
  * `core/src/user_update_validation.rs` — the attribute key/value/count
  * rules are uv1's pinned `Directory` predicates, reused here).
  *
  * Check order, exactly the reference's:
  *
  *  1. `start_auth` (`update_user.rs:176-199`): realm isolation — the
  *     target user's realm, the auth context's realm, and the actor's
  *     realm must ALL equal the node's own realm, and the actor must BE
  *     the auth-context user; a SELF-update with path restrictions is
  *     refused, an unrestricted self-update skips the permission check
  *     entirely; any other target requires the admin permission;
  *  2. UserNotFound (`:313`), then UserIdMismatch — the STORED record's
  *     embedded id must match the requested id (`:315`, corruption guard);
  *  3. `apply_updates` (`:675-700`): a provided name is trimmed and must
  *     be 1..=256 BYTES; then every removal key validates (input order,
  *     ALL removals before any set), then each set pair validates key
  *     THEN value (input order), then the 128-attribute cap applies to
  *     the count AFTER applying — removals run before sets, so a key
  *     both removed and set ends PRESENT;
  *  4. reducer TargetMismatch (`:335`) — after apply, before commit;
  *  5. Ok reports the final name and post-update attribute count.
  *
  * Scale: the user store and per-user attributes are directory-sized;
  * requests broadcast into them, every check is a request-keyed aggregate.
  */
object UpdateUser {

  val MaxUserNameBytes = 256 // update_user.rs:43

  /** `requests(req_id, target_user, target_realm, auth_realm, actor_realm,
    * self_realm, auth_user, actor_user, restricted, authorized,
    * new_name)`; `removeAttrs(req_id, ord, key)`;
    * `setAttrs(req_id, ord, key, value)`; `users(user_id, stored_id,
    * name)`; `baseAttrs(user_id, key)`; `reducers(user_id,
    * stored_target)` vs expected `user:<id>`. */
  def verdicts(requests: DataFrame, removeAttrs: DataFrame,
      setAttrs: DataFrame, users: DataFrame, baseAttrs: DataFrame,
      reducers: DataFrame): DataFrame = {
    val keyOk = length(col("key")).between(1, Directory.MaxAttrKeyBytes) &&
      col("key").rlike("^[A-Za-z0-9._:-]+$")
    val valueOk = octet_length(col("value")) <= Directory.MaxAttrValueBytes &&
      !col("value").rlike("[\\x00-\\x1f\\x7f]")

    val rmFail = removeAttrs.filter(!keyOk)
      .groupBy("req_id")
      .agg(min_by(concat(lit("InvalidAttributeKey:"), col("key")),
        col("ord")).as("rm_fail"))
    val setFail = setAttrs
      .withColumn("__f",
        when(!keyOk, concat(lit("InvalidAttributeKey:"), col("key")))
          .when(!valueOk, concat(lit("InvalidAttributeValue:"), col("key"))))
      .filter(col("__f").isNotNull)
      .groupBy("req_id").agg(min_by(col("__f"), col("ord")).as("set_fail"))

    // post-update attribute count: (base \ removals) ∪ set keys
    val reqUser = requests.select(col("req_id"),
      col("target_user").as("user_id"))
    val after = baseAttrs.join(broadcast(reqUser), Seq("user_id"))
      .select(col("req_id"), col("key"))
      .join(removeAttrs.select(col("req_id"), col("key")),
        Seq("req_id", "key"), "left_anti")
      .unionByName(setAttrs.select(col("req_id"), col("key")))
      .groupBy("req_id").agg(countDistinct(col("key")).as("n_after"))
    val nBase = baseAttrs.join(broadcast(reqUser), Seq("user_id"))
      .groupBy("req_id").agg(count(lit(1)).as("n_base"))

    val j = requests
      .join(broadcast(users.select(col("user_id").as("target_user"),
        col("stored_id"), col("name").as("stored_name"))),
        Seq("target_user"), "left")
      .join(broadcast(rmFail), Seq("req_id"), "left")
      .join(broadcast(setFail), Seq("req_id"), "left")
      .join(broadcast(after), Seq("req_id"), "left")
      .join(broadcast(nBase), Seq("req_id"), "left")
      .join(broadcast(reducers.select(col("user_id").as("target_user"),
        col("stored_target"))), Seq("target_user"), "left")

    val isSelf = col("auth_user") === col("target_user")
    val unauthorized =
      col("target_realm") =!= col("self_realm") ||
        col("auth_realm") =!= col("self_realm") ||
        col("actor_realm") =!= col("self_realm") ||
        col("actor_user") =!= col("auth_user") ||
        (isSelf && col("restricted")) ||
        (!isSelf && !col("authorized"))
    val trimmedName = trim(col("new_name"))
    val nameBad = col("new_name").isNotNull &&
      (trimmedName === "" || octet_length(trimmedName) > MaxUserNameBytes)
    val nAfter = coalesce(col("n_after"), col("n_base"), lit(0L))
    val mismatch = col("stored_target").isNotNull &&
      col("stored_target") =!= concat(lit("user:"), col("target_user"))

    val verdict =
      when(unauthorized, "Unauthorized")
        .when(col("stored_id").isNull, "UserNotFound")
        .when(col("stored_id") =!= col("target_user"), "UserIdMismatch")
        .when(nameBad, "InvalidUserName")
        .when(col("rm_fail").isNotNull, col("rm_fail"))
        .when(col("set_fail").isNotNull, col("set_fail"))
        .when(nAfter > Directory.MaxUserAttributes, "TooManyAttributes")
        .when(mismatch, "TargetMismatch")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"

    j.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      when(ok, when(col("new_name").isNotNull, trimmedName)
        .otherwise(col("stored_name"))).as("final_name"),
      when(ok, nAfter).as("n_attrs"))
  }
}
