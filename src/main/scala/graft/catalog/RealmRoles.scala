package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Realm role administration (reference
  * `operations/src/add_realm_role.rs` (1194 LoC) +
  * `operations/src/add_user_to_realm_role.rs` (1216) — the realm-scope
  * siblings of gm1's group ladders; the contested reducer fold is adr1's
  * contract, this models the uncontested path).
  *
  * Ladder order per op, exactly the reference's:
  *
  *  - **add_role** (`add_realm_role.rs:538-558,161-187`): `validate_role`
  *    runs in `start`, BEFORE the permission sub-operation — reserved
  *    TRIMMED name (`realm_admin` only, `:124-127`); a pre-assigned nil
  *    user of the WRONG realm (`:165-175`, `rejects_foreign_nil` test);
  *    a public role (own-realm nil among assignees, `structs.rs:61-63`)
  *    carrying any non-READ permission (`:177-186`); then Unauthorized
  *    (WRITE on the realm's admin role path); then the auth-doc read —
  *    absent is RealmAuthDocNotFound (`:272`); then reducer
  *    TargetMismatch (`:290`).
  *  - **assign_user** (`add_user_to_realm_role.rs:522-523,180,239-245,
  *    264`): a nil user id fails in `start` before anything; then
  *    Unauthorized; AuthDocNotFound; the SORTED role-id list must ALL
  *    exist — any miss is RoleNotFound before the reducer decodes; then
  *    TargetMismatch; Ok reports how many of the roles already carried
  *    the user (assignment is an upsert, `:273-287`).
  *
  * Scale: auth docs / role tables / assignments are realm-config-sized;
  * request-keyed aggregates ride broadcasts (the gm1 shape). */
object RealmRoles {

  val ReservedRealmRoleNames: Seq[String] = Seq("realm_admin")

  /** `requests(req_id, op, realm_id, role_name, user_id, authorized)`;
    * `reqUsers(req_id, user_id)` — add_role pre-assignees;
    * `reqPerms(req_id, permission)`; `reqRoles(req_id, role_id)` —
    * assign_user role lists; `authDocs(realm_id)`;
    * `authRoles(realm_id, role_id)`;
    * `assignments(realm_id, role_id, user_id)`;
    * `reducers(realm_id, stored_target)` vs expected `realm:<id>`. */
  def decide(requests: DataFrame, reqUsers: DataFrame, reqPerms: DataFrame,
      reqRoles: DataFrame, authDocs: DataFrame, authRoles: DataFrame,
      assignments: DataFrame, reducers: DataFrame): DataFrame = {
    val nilOwn = concat(lit("nil@"), col("realm_id"))
    val userAgg = reqUsers
      .join(broadcast(requests.select(col("req_id"), col("realm_id"))),
        Seq("req_id"))
      .groupBy("req_id").agg(
        max(col("user_id").startsWith("nil@") && col("user_id") =!= nilOwn)
          .as("bad_nil"),
        max(col("user_id") === nilOwn).as("is_public"),
        count(lit(1)).as("n_assigned"))
    val permAgg = reqPerms.groupBy("req_id")
      .agg(max(col("permission") =!= "READ").as("non_read"))

    // assign_user: the role list joined against the auth doc's role table,
    // plus how many of the listed roles already carry the target user
    val roleTable = authRoles.select(col("realm_id"), col("role_id"),
      lit(true).as("role_known"))
    val held = assignments.select(col("realm_id"), col("role_id"),
      col("user_id"), lit(true).as("already"))
    val listAgg = reqRoles
      .join(broadcast(requests.select(col("req_id"), col("realm_id"),
        col("user_id"))), Seq("req_id"))
      .join(broadcast(roleTable), Seq("realm_id", "role_id"), "left")
      .join(broadcast(held), Seq("realm_id", "role_id", "user_id"), "left")
      .groupBy("req_id").agg(
        max(col("role_known").isNull).as("list_miss"),
        count(lit(1)).as("n_listed"),
        sum(when(col("already"), 1L).otherwise(0L)).as("n_already"))

    val j = requests
      .join(broadcast(userAgg), Seq("req_id"), "left")
      .join(broadcast(permAgg), Seq("req_id"), "left")
      .join(broadcast(listAgg), Seq("req_id"), "left")
      .join(broadcast(authDocs.select(col("realm_id"),
        lit(true).as("doc_ok"))), Seq("realm_id"), "left")
      .join(broadcast(reducers), Seq("realm_id"), "left")

    val mismatch = col("stored_target").isNotNull &&
      col("stored_target") =!= concat(lit("realm:"), col("realm_id"))

    val verdict =
      when(col("op") === "add_role",
        when(trim(col("role_name")).isin(ReservedRealmRoleNames: _*),
          "ReservedRoleName")
          .when(coalesce(col("bad_nil"), lit(false)), "InvalidAssignedUser")
          .when(coalesce(col("is_public"), lit(false)) &&
            coalesce(col("non_read"), lit(false)), "InvalidPublicRole")
          .when(!col("authorized"), "Unauthorized")
          .when(col("doc_ok").isNull, "RealmAuthDocNotFound")
          .when(mismatch, "TargetMismatch")
          .otherwise("Ok"))
        .otherwise( // assign_user
          when(col("user_id").startsWith("nil"), "InvalidUserId")
            .when(!col("authorized"), "Unauthorized")
            .when(col("doc_ok").isNull, "AuthDocNotFound")
            .when(coalesce(col("list_miss"), lit(false)), "RoleNotFound")
            .when(mismatch, "TargetMismatch")
            .otherwise("Ok"))

    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      when(ok && col("op") === "add_role",
        coalesce(col("is_public"), lit(false))).as("role_public"),
      when(ok && col("op") === "add_role",
        coalesce(col("n_assigned"), lit(0L))).as("n_assigned"),
      when(ok && col("op") === "assign_user", col("n_listed")).as("n_roles"),
      when(ok && col("op") === "assign_user",
        coalesce(col("n_already"), lit(0L))).as("n_already"))
  }
}
