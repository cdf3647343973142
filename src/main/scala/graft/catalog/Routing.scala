package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-routing resolution (reference `core/src/structs/routing.rs`).
  *
  * Candidate ladder (`candidates`, `routing.rs:436-476`) — most specific
  * first, stable within each tier so record/file order is the final
  * tie-break:
  *   1. tenant EXACT-key rules of the bucket;
  *   2. tenant prefix rules by LONGEST prefix (the empty prefix is the
  *      bucket default, covered by the same longest-prefix sort);
  *   3. the group default;
  *   4. operator node rules filtered by `matches` (unset field = match
  *      all, `routing.rs:111-118`), sorted by specificity = (set-field
  *      count, key-prefix length) descending (`routing.rs:120-126`).
  *
  * Target resolution (`resolve_target`, `routing.rs:330-358`): a NAMED
  * node backend is BINDING — unknown name or full backend aborts the
  * whole resolution with an error; a group backend errors when group
  * egress is disabled or the id is not registered by the write's own
  * group (a rule can never bind another tenant's endpoint); a CLASS is a
  * preference — the first catalog entry in NAME order offering the class,
  * not full, and open to tenants (operator rules may also use reserved
  * entries) — and a class this node does not offer is only a MISS the
  * ladder continues past. When no candidate decides, the node default
  * backend answers (`resolve_backend`, `routing.rs:497-517`).
  *
  * Scale shape: rules and catalog are config-sized and broadcast; each
  * request contributes a few candidate rows and one per-request min-rank
  * window decides. The write batch shuffles only for that window.
  */
object Routing {

  /** Resolve the write batch.
    *
    * `requests(req_id, group_id, bucket, key)`;
    * `bucketRules(bucket, rule_idx, key_prefix, exact, kind, target)`
    * (kind in node|group|class);
    * `groupDefaults(group_id, kind, target)`;
    * `nodeRules(rule_idx, group_id, bucket, key_prefix, kind, target)`
    * (null fields match everything);
    * `catalog(name, clazz, allow_tenants, full)`; `groupBackends(group_id,
    * backend_id)` (ids registered by each group).
    */
  def resolve(requests: DataFrame, bucketRules: DataFrame,
      groupDefaults: DataFrame, nodeRules: DataFrame, catalog: DataFrame,
      groupBackends: DataFrame, defaultName: String,
      serveGroupEgress: Boolean = true): DataFrame = {
    val req = requests.select(col("req_id"), col("group_id"),
      col("bucket"), col("key"))

    // class -> first resolving entry in name order, per rule source
    def classPick(tenantOnly: Boolean) = {
      val base = catalog.filter(!col("full") && col("clazz").isNotNull)
      val eligible = if (tenantOnly) base.filter(col("allow_tenants"))
        else base
      eligible.groupBy(col("clazz"))
        .agg(min(struct(col("name"))).getField("name").as("c_backend"))
    }
    val classTenant = classPick(tenantOnly = true)
    val classOperator = classPick(tenantOnly = false)

    def cand(df: DataFrame, tier: Int, a: Column, b: Column,
        operator: Boolean): DataFrame =
      df.select(col("req_id"), col("group_id"), col("kind"), col("target"),
        lit(tier).as("tier"), a.cast("long").as("a"), b.cast("long").as("b"),
        lit(operator).as("operator"))

    val exact = cand(req.join(broadcast(bucketRules), Seq("bucket"))
      .filter(col("exact") && col("key_prefix") === col("key")),
      tier = 0, a = col("rule_idx"), b = lit(0), operator = false)
    val prefixed = cand(req.join(broadcast(bucketRules), Seq("bucket"))
      .filter(!col("exact") && col("key").startsWith(col("key_prefix"))),
      tier = 1, a = -length(col("key_prefix")), b = col("rule_idx"),
      operator = false)
    val groupDef = cand(req.join(broadcast(groupDefaults), Seq("group_id")),
      tier = 2, a = lit(0), b = lit(0), operator = false)
    val nr = nodeRules.select(col("rule_idx"),
      col("group_id").as("r_group"), col("bucket").as("r_bucket"),
      col("key_prefix").as("r_prefix"), col("kind"), col("target"))
    val node = cand(req.join(broadcast(nr),
      (col("r_group").isNull || col("r_group") === col("group_id")) &&
        (col("r_bucket").isNull || col("r_bucket") === col("bucket")) &&
        (col("r_prefix").isNull || col("key").startsWith(col("r_prefix"))))
      .withColumn("spec",
        when(col("r_group").isNotNull, 1).otherwise(0) +
          when(col("r_bucket").isNotNull, 1).otherwise(0) +
          when(col("r_prefix").isNotNull, 1).otherwise(0)),
      tier = 3,
      a = -(col("spec") * 100000 +
        coalesce(length(col("r_prefix")), lit(0))),
      b = col("rule_idx"), operator = true)

    val cands = exact.unionByName(prefixed).unionByName(groupDef)
      .unionByName(node)

    // per-candidate outcome: ok(backend, class) | error(kind) | miss
    val judged = cands
      .join(broadcast(catalog.select(col("name").as("target"),
          col("clazz").as("n_class"), col("full").as("n_full"),
          lit(true).as("n_known"))),
        Seq("target"), "left_outer")
      .join(broadcast(groupBackends.select(col("group_id"),
          col("backend_id").as("target"), lit(true).as("g_known"))),
        Seq("group_id", "target"), "left_outer")
      .join(broadcast(classTenant.select(col("clazz").as("target"),
          col("c_backend").as("ct_backend"))), Seq("target"), "left_outer")
      .join(broadcast(classOperator.select(col("clazz").as("target"),
          col("c_backend").as("co_backend"))), Seq("target"), "left_outer")
    val classBackend = when(col("operator"), col("co_backend"))
      .otherwise(col("ct_backend"))
    val outcome =
      when(col("kind") === "node",
        when(!coalesce(col("n_known"), lit(false)),
          struct(lit("error").as("o"), lit("unknown_backend").as("err"),
            lit(null).cast("string").as("backend")))
          .when(col("n_full"),
            struct(lit("error").as("o"), lit("backend_full").as("err"),
              lit(null).cast("string").as("backend")))
          .otherwise(struct(lit("ok").as("o"),
            lit(null).cast("string").as("err"), col("target").as("backend"))))
        .when(col("kind") === "group",
          if (!serveGroupEgress)
            struct(lit("error").as("o"),
              lit("group_egress_disabled").as("err"),
              lit(null).cast("string").as("backend"))
          else when(!coalesce(col("g_known"), lit(false)),
            struct(lit("error").as("o"),
              lit("unknown_group_backend").as("err"),
              lit(null).cast("string").as("backend")))
            .otherwise(struct(lit("ok").as("o"),
              lit(null).cast("string").as("err"),
              concat(lit("group:"), col("target")).as("backend"))))
        .otherwise( // class: resolve or miss
          when(classBackend.isNotNull, struct(lit("ok").as("o"),
            lit(null).cast("string").as("err"),
            classBackend.as("backend")))
            .otherwise(struct(lit("miss").as("o"),
              lit(null).cast("string").as("err"),
              lit(null).cast("string").as("backend"))))

    val deciding = judged.withColumn("oc", outcome)
      .filter(col("oc").getField("o") =!= "miss")
      .withColumn("rn", row_number().over(Window.partitionBy("req_id")
        .orderBy(col("tier"), col("a"), col("b"))))
      .filter(col("rn") === 1)
      .select(col("req_id"), col("oc"))

    val defaultEntry = catalog.filter(col("name") === defaultName)
      .select(lit(true).as("d_known"), col("full").as("d_full"),
        col("clazz").as("d_class")).collect().headOption
    val (dKnown, dFull) = defaultEntry
      .map(r => (true, r.getBoolean(1))).getOrElse((false, false))
    val fallback =
      if (!dKnown) struct(lit("error").as("o"),
        lit("unknown_backend").as("err"),
        lit(null).cast("string").as("backend"))
      else if (dFull) struct(lit("error").as("o"),
        lit("backend_full").as("err"), lit(null).cast("string").as("backend"))
      else struct(lit("ok").as("o"), lit(null).cast("string").as("err"),
        lit(defaultName).as("backend"))

    val resolved = req.join(deciding, Seq("req_id"), "left_outer")
      .withColumn("oc", coalesce(col("oc"), fallback))
    resolved
      .join(broadcast(catalog.select(col("name").as("r_backend"),
        col("clazz").as("backend_class"))),
        resolved("oc").getField("backend") === col("r_backend"),
        "left_outer")
      .select(col("req_id"), col("group_id"), col("bucket"), col("key"),
        when(col("oc").getField("o") === "ok", "ok").otherwise("error")
          .as("verdict"),
        col("oc").getField("err").as("error"),
        col("oc").getField("backend").as("backend"),
        col("backend_class").as("storage_class"))
  }
}
