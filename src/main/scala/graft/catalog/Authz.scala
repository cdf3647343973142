package graft.catalog

import graft.streaming.Watch
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Authorization decision engine (reference
  * `operations/src/permission_rules.rs`, applied per path by
  * `check_permissions.rs:16-18`): the caller's effective rules for a
  * (realm, group) scope are collected ONCE from the realm + group
  * authorization documents, then every candidate path is decided in memory
  * — "bulk read paths pay O(scopes) storage reads instead of one
  * permission check per candidate path" (`permission_rules.rs:239-241`).
  *
  * Decision ladder (`PermissionRules::allows`, `permission_rules.rs:110-158`):
  *  - over all glob-matching rules: a matching DIRECT DENY denies outright
  *    (beats every grant, including public READ); a direct WRITE grants any
  *    required permission; a direct READ grants required READ; a PUBLIC
  *    rule grants ONLY READ and only when it says READ (public WRITE and
  *    public DENY rows are inert);
  *  - token path restrictions, when present, are a whitelist ON TOP: a
  *    matching restriction DENY denies, WRITE passes any required, READ
  *    passes required READ, and NO matching restriction denies;
  *  - a role is public only when this realm's exact Everyone principal is
  *    assigned (`collect_roles`, `permission_rules.rs:470-473` — a foreign
  *    realm's nil user does NOT make it public), and a caller is direct
  *    only when non-nil and listed (anonymous callers hold no rules at
  *    all, `GroupPermissionRules::collect`, `permission_rules.rs:171-180`).
  *
  * Scale shape: authorization documents are tiny (per-scope role lists)
  * while the request batch is the big side (every candidate path of a bulk
  * listing). Rules pre-aggregate to ONE array row per scope and broadcast;
  * the batch joins them map-side and each row decides locally — zero
  * shuffle of the request stream, mirroring the reference's collect-once /
  * decide-in-memory split.
  */
object Authz {

  /** Everyone principal of a realm (the realm-scoped nil user id). */
  def everyone(realm: String): String = s"everyone@$realm"

  /** Collected rules per (caller, realm, group): the relational form of
    * `collect_roles` + `PermissionRules::from_roles`. `roles(realm,
    * group_id, role_id, pattern, permission)` × `assignments(role_id,
    * user_id)`; direct rows carry the caller, public rows apply to every
    * authenticated caller of the realm. */
  private def ruleArrays(roles: DataFrame, assignments: DataFrame): (DataFrame, DataFrame) = {
    val joined = roles.join(assignments, Seq("role_id"))
    val direct = joined
      .filter(!col("user_id").startsWith("everyone@"))
      .groupBy(col("user_id").as("caller"), col("realm"), col("group_id"))
      .agg(collect_list(struct(col("pattern"), col("permission")))
        .as("direct_rules"))
    val public = joined
      .filter(col("user_id") === concat(lit("everyone@"), col("realm")) &&
        col("permission") === "READ")
      .groupBy(col("realm"), col("group_id"))
      .agg(collect_list(struct(col("pattern"), col("permission")))
        .as("public_rules"))
    (direct, public)
  }

  /** One permission decision per request row. Runs once per row against
    * the broadcast rule arrays (rules are auth-doc-sized by contract); the
    * glob compile is cached per executor like [[Watch.globMatch]]. */
  private val decideUdf: UserDefinedFunction = udf {
    (path: String, required: String, anon: Boolean,
     direct: Seq[Row], public: Seq[Row], restr: Seq[Row]) =>
      def matches(pattern: String): Boolean =
        Watch.patternFor(pattern).matcher(path).matches()
      if (anon) "no_grant"
      else {
        val dm = Option(direct).getOrElse(Seq.empty)
          .filter(r => matches(r.getString(0))).map(_.getString(1))
        val pm = Option(public).getOrElse(Seq.empty)
          .filter(r => matches(r.getString(0))).map(_.getString(1))
        if (dm.contains("DENY")) "deny_rule"
        else {
          val granted = dm.contains("WRITE") ||
            (required == "READ" && (dm.contains("READ") || pm.contains("READ")))
          if (!granted) "no_grant"
          else if (restr == null || restr.isEmpty) "allowed"
          else {
            val rm = restr.filter(r => matches(r.getString(0))).map(_.getString(1))
            if (rm.contains("DENY")) "restriction_deny"
            else if (rm.contains("WRITE") ||
              (required == "READ" && rm.contains("READ"))) "allowed"
            else "restriction_blocks"
          }
        }
      }
  }

  /** Bulk decisions: `requests(caller, realm, group_id, path, required)`
    * against `roles`/`assignments` (the auth documents) and `restrictions
    * (caller, pattern, permission)` (token path restrictions). Returns the
    * request columns + `allowed` + `verdict` (allowed | deny_rule |
    * no_grant | restriction_deny | restriction_blocks). */
  def decide(requests: DataFrame, roles: DataFrame, assignments: DataFrame,
      restrictions: DataFrame): DataFrame = {
    val (direct, public) = ruleArrays(roles, assignments)
    val restr = restrictions
      .groupBy(col("caller"))
      .agg(collect_list(struct(col("pattern"), col("permission")))
        .as("restr_rules"))
    val verdict = decideUdf(col("path"), col("required"),
      col("caller") === "anon", col("direct_rules"), col("public_rules"),
      col("restr_rules"))
    requests
      .join(broadcast(direct), Seq("caller", "realm", "group_id"), "left_outer")
      .join(broadcast(public), Seq("realm", "group_id"), "left_outer")
      .join(broadcast(restr), Seq("caller"), "left_outer")
      .select(col("caller"), col("realm"), col("group_id"), col("path"),
        col("required"), verdict.as("verdict"))
      .withColumn("allowed", col("verdict") === "allowed")
  }
}
