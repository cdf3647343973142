package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group role & membership administration (reference
  * `operations/src/{add_group_role,remove_group_role,add_user_to_group,
  * remove_user_from_group}.rs` — the four admin-document mutation ladders
  * around the group authorization document; the reducer FOLD itself is the
  * adr1 gate's contract, so this models the uncontested path where the
  * reducer materializes the operation's own intent).
  *
  * Ladder order per op, exactly the reference's:
  *
  *  - **add_role** (`add_group_role.rs:158-199,734-737,278,350,368`):
  *    `validate_role` runs BEFORE the permission check — reserved name
  *    (trimmed ∈ {admin, user}), a pre-assigned nil user of the WRONG
  *    realm, a public role (nil user of the own realm among assignees)
  *    carrying any non-READ permission; then Unauthorized; then the group
  *    record read (GroupNotFound) — and a missing auth doc is ALSO
  *    GroupNotFound here; then reducer TargetMismatch.
  *  - **remove_role** (`remove_group_role.rs:555-568,219,291-299,317`):
  *    auth first; GroupNotFound; AuthDocNotFound (distinct error, unlike
  *    add); RoleNotFound; the exact-named `admin` role is undeletable
  *    ("the only guaranteed management entry point"); TargetMismatch.
  *  - **add_user** (`add_user_to_group.rs:606-621,266-271`): a nil user id
  *    fails before anything; Unauthorized; AuthDocNotFound; ANY requested
  *    role missing → RoleNotFound (checked before the reducer decode);
  *    TargetMismatch; Ok reports `was_member` (user in any role before)
  *    and `newly_added`.
  *  - **remove_user** (`remove_user_from_group.rs:618-633,263,288,321,
  *    350-358`): nil user first; SELF-LEAVE SKIPS the permission check
  *    (actor == target needs no admin rights — the last-admin guard still
  *    applies); AuthDocNotFound; explicit role lists fail RoleNotFound on
  *    any missing id, an absent list removes from every role the user
  *    holds; TargetMismatch; then LastAdmin — an `admin`-named role that
  *    contains the user and would be left EMPTY blocks the removal.
  *
  * Scale: auth docs / role tables / assignments are catalog-sized config
  * relations — all broadcast; every check is a request-keyed aggregate.
  */
object GroupAdmin {

  val ReservedRoleNames: Seq[String] = Seq("admin", "user") // add_group_role.rs:158

  /** `requests(req_id, op, group_id, realm_id, user_id, actor_id,
    * authorized, role_name, role_id, has_role_list)`;
    * `reqRoles(req_id, role_id)` — membership-op role lists;
    * `reqUsers(req_id, user_id)` — add_role pre-assignees;
    * `reqPerms(req_id, permission)` — add_role permission values;
    * `groups(group_id)`; `authDocs(group_id)`;
    * `authRoles(group_id, role_id, role_name)`;
    * `assignments(group_id, role_id, user_id)`;
    * `reducers(group_id, stored_target)` vs expected `group:<id>`. */
  def decide(requests: DataFrame, reqRoles: DataFrame, reqUsers: DataFrame,
      reqPerms: DataFrame, groups: DataFrame, authDocs: DataFrame,
      authRoles: DataFrame, assignments: DataFrame,
      reducers: DataFrame): DataFrame = {
    // add_role validate_role aggregates over the request's payload
    val roleReq = requests.select(col("req_id"), col("realm_id"))
    val nilOwn = concat(lit("nil@"), col("realm_id"))
    val userAgg = reqUsers.join(broadcast(roleReq), Seq("req_id"))
      .groupBy("req_id").agg(
        max(col("user_id").startsWith("nil@") && col("user_id") =!= nilOwn)
          .as("bad_nil"),
        max(col("user_id") === nilOwn).as("is_public"),
        count(lit(1)).as("n_assigned"))
    val permAgg = reqPerms.groupBy("req_id")
      .agg(max(col("permission") =!= "READ").as("non_read"))

    // membership-op role lists: any id missing from the group's table
    val roleTable = authRoles.select(col("group_id"), col("role_id"),
      lit(true).as("role_known"))
    val listAgg = reqRoles
      .join(broadcast(requests.select(col("req_id"), col("group_id"))),
        Seq("req_id"))
      .join(broadcast(roleTable), Seq("group_id", "role_id"), "left")
      .groupBy("req_id").agg(
        max(col("role_known").isNull).as("list_miss"),
        count(lit(1)).as("n_listed"),
        max(col("role_id") === "r-admin").as("list_has_admin"))

    // per-(group, user) membership shape
    val adminRoles = authRoles.filter(col("role_name") === "admin")
      .select(col("group_id"), col("role_id"))
    val adminCount = assignments.join(broadcast(adminRoles),
      Seq("group_id", "role_id"))
      .groupBy("group_id").agg(countDistinct(col("user_id")).as("admin_n"))
    val perUser = assignments
      .join(broadcast(authRoles.select(col("group_id"), col("role_id"),
        col("role_name"))), Seq("group_id", "role_id"))
      .groupBy("group_id", "user_id").agg(
        count(lit(1)).as("member_roles"),
        max(col("role_name") === "admin").as("in_admin"))
    // roles the user holds OUTSIDE a request's explicit removal list
    val outsideList = assignments
      .join(broadcast(requests.filter(col("op") === "remove_user")
        .select(col("req_id"), col("group_id"),
          col("user_id"), col("has_role_list"))),
        Seq("group_id", "user_id"))
      .join(broadcast(reqRoles.withColumn("listed", lit(true))),
        Seq("req_id", "role_id"), "left")
      .filter(col("has_role_list") && col("listed").isNull)
      .groupBy("req_id").agg(lit(true).as("outside_list"))

    val j = requests
      .join(broadcast(userAgg), Seq("req_id"), "left")
      .join(broadcast(permAgg), Seq("req_id"), "left")
      .join(broadcast(listAgg), Seq("req_id"), "left")
      .join(broadcast(groups.select(col("group_id"),
        lit(true).as("grp_ok"))), Seq("group_id"), "left")
      .join(broadcast(authDocs.select(col("group_id"),
        lit(true).as("doc_ok"))), Seq("group_id"), "left")
      .join(broadcast(authRoles.select(col("group_id"),
        col("role_id"), lit(true).as("tgt_role_known"),
        col("role_name").as("tgt_role_name"))),
        Seq("group_id", "role_id"), "left")
      .join(broadcast(reducers), Seq("group_id"), "left")
      .join(broadcast(adminCount), Seq("group_id"), "left")
      .join(broadcast(perUser), Seq("group_id", "user_id"), "left")
      .join(broadcast(outsideList), Seq("req_id"), "left")

    val mismatch = col("stored_target").isNotNull &&
      col("stored_target") =!= concat(lit("group:"), col("group_id"))
    val wasMember = col("member_roles").isNotNull
    val inAdmin = coalesce(col("in_admin"), lit(false))
    val selfLeave = col("actor_id") === col("user_id")
    // LastAdmin: the admin role contains the user, is in the removal set
    // (explicit lists carry it via list_has_admin; implicit removal always
    // covers held roles), and holds no OTHER member
    val adminInSet = when(col("has_role_list"),
      coalesce(col("list_has_admin"), lit(false))).otherwise(inAdmin)
    val lastAdmin = inAdmin && adminInSet && col("admin_n") === 1

    val verdict =
      when(col("op") === "add_role",
        when(trim(col("role_name")).isin(ReservedRoleNames: _*),
          "ReservedRoleName")
          .when(coalesce(col("bad_nil"), lit(false)), "InvalidAssignedUser")
          .when(coalesce(col("is_public"), lit(false)) &&
            coalesce(col("non_read"), lit(false)), "InvalidPublicRole")
          .when(!col("authorized"), "Unauthorized")
          .when(col("grp_ok").isNull || col("doc_ok").isNull,
            "GroupNotFound")
          .when(mismatch, "TargetMismatch")
          .otherwise("Ok"))
        .when(col("op") === "remove_role",
          when(!col("authorized"), "Unauthorized")
            .when(col("grp_ok").isNull, "GroupNotFound")
            .when(col("doc_ok").isNull, "AuthDocNotFound")
            .when(col("tgt_role_known").isNull, "RoleNotFound")
            .when(col("tgt_role_name") === "admin", "AdminRoleUndeletable")
            .when(mismatch, "TargetMismatch")
            .otherwise("Ok"))
        .when(col("op") === "add_user",
          when(col("user_id") === "nil", "InvalidUserId")
            .when(!col("authorized"), "Unauthorized")
            .when(col("doc_ok").isNull, "AuthDocNotFound")
            .when(coalesce(col("list_miss"), lit(false)), "RoleNotFound")
            .when(mismatch, "TargetMismatch")
            .otherwise("Ok"))
        .otherwise( // remove_user
          when(col("user_id") === "nil", "InvalidUserId")
            .when(!selfLeave && !col("authorized"), "Unauthorized")
            .when(col("doc_ok").isNull, "AuthDocNotFound")
            .when(col("has_role_list") &&
              coalesce(col("list_miss"), lit(false)), "RoleNotFound")
            .when(mismatch, "TargetMismatch")
            .when(lastAdmin, "LastAdmin")
            .otherwise("Ok"))

    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      when(ok && col("op").isin("add_user", "remove_user"), wasMember)
        .as("was_member"),
      when(ok && col("op") === "add_user", !wasMember).as("newly_added"),
      when(ok && col("op") === "remove_user",
        when(col("has_role_list"),
          coalesce(col("outside_list"), lit(false))).otherwise(lit(false)))
        .as("still_member"),
      when(ok && col("op") === "add_user", col("n_listed"))
        .when(ok && col("op") === "remove_user",
          when(col("has_role_list"), col("n_listed"))
            .otherwise(coalesce(col("member_roles"), lit(0L))))
        .as("n_roles"),
      when(ok && col("op") === "add_role",
        coalesce(col("is_public"), lit(false))).as("role_public"),
      when(ok && col("op") === "add_role",
        coalesce(col("n_assigned"), lit(0L))).as("n_assigned"))
  }
}
