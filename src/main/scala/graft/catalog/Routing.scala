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
  /** PutBucketRouting admission (reference
    * `operations/src/s3/bucket_routing.rs:96-180` PutBucketRoutingOperation +
    * `core/src/structs/routing.rs:558-580` `validate_tenant_rules` /
    * `validate_tenant_target`; arms pinned by the reference's own tests at
    * `routing.rs:1049-1103` and `bucket_routing.rs:405-520`).
    *
    * Ladder, in the operation's order:
    *   1. the group's routing inputs (its registered backend ids) failed to
    *      load → `inputs_unavailable` (`bucket_routing.rs:113-118`);
    *   2. `validate_rule_set` (`routing.rs:525-537`) — ONE pass over the
    *      rules in order; per rule the duplicate-(exact,prefix) insert check
    *      precedes the class-name check, and the SECOND occurrence is the
    *      duplicate → `duplicate_rule(prefix)` | `invalid_class(class)`
    *      (class = `[a-z0-9-]{1,32}`, `routing.rs:38-47`);
    *   3. `validate_tenant_target` per rule in order — a SECOND pass that
    *      only starts once pass 2 cleared the whole vector
    *      (`routing.rs:572-580` try_for_each AFTER validate_rule_set):
    *      a `node` target → `operator_backend_target`; a `group` target the
    *      bucket's group did not register → `foreign_backend(id)`;
    *   4. the bucket record is read only after validation: absent →
    *      `no_such_bucket` (`bucket_routing.rs:152-155`);
    *   5. the record moved to another group while the rules were authored →
    *      `group_mismatch` (`bucket_routing.rs:160-163`);
    *   6. ok → the rule vector REPLACES the bucket's routing
    *      (`info.storage_routing = rules`), `n_rules` reports its size
    *      (an empty vector is a valid clear).
    *
    * `requests(req_id, bucket, group_id)`;
    * `rules(req_id, rule_idx, key_prefix, exact, kind, target)` (kind in
    * node|group|class); `groupBackends(group_id, backend_id)`;
    * `buckets(bucket, owner_group)` — the bucket store;
    * `unavailableGroups(group_id)` — groups whose backend load failed.
    *
    * Scale: the bucket store is corpus-scale — the batch's bucket names
    * broadcast INTO it (probe-keys shape); rules are batch-sized and fold
    * with one (req_id, exact, prefix) window + one per-request min-struct
    * aggregation; groupBackends/unavailableGroups are config-plane-sized
    * broadcasts. */
  def admitTenantRules(requests: DataFrame, rules: DataFrame,
      groupBackends: DataFrame, buckets: DataFrame,
      unavailableGroups: DataFrame): DataFrame = {
    val reqKeys = requests.select(col("req_id"), col("group_id"))
    val wDup = Window.partitionBy("req_id", "exact", "key_prefix")
      .orderBy("rule_idx")
    val judged = rules.join(reqKeys, Seq("req_id"))
      .withColumn("dup", row_number().over(wDup) > 1)
      .withColumn("class_bad", col("kind") === "class" &&
        !col("target").rlike("^[a-z0-9-]{1,32}$"))
      .join(broadcast(groupBackends.select(col("group_id"),
        col("backend_id").as("target"), lit(true).as("owned"))),
        Seq("group_id", "target"), "left_outer")
    // pass 1 (validate_rule_set): per rule, dup beats class; first rule wins
    val p1 = when(col("dup"),
        struct(col("rule_idx"), lit(0).as("sub"),
          lit("duplicate_rule").as("code"), col("key_prefix").as("detail")))
      .when(col("class_bad"),
        struct(col("rule_idx"), lit(1).as("sub"),
          lit("invalid_class").as("code"), col("target").as("detail")))
    // pass 2 (validate_tenant_target): only reached when pass 1 is clean
    val p2 = when(col("kind") === "node",
        struct(col("rule_idx"), lit(0).as("sub"),
          lit("operator_backend_target").as("code"),
          lit(null).cast("string").as("detail")))
      .when(col("kind") === "group" && !coalesce(col("owned"), lit(false)),
        struct(col("rule_idx"), lit(0).as("sub"),
          lit("foreign_backend").as("code"), col("target").as("detail")))
    val folded = judged.groupBy("req_id")
      .agg(min(p1).as("e1"), min(p2).as("e2"),
        count(lit(1)).as("n_rules"))

    val probe = requests.select("bucket").distinct()
    val owners = buckets.join(broadcast(probe), Seq("bucket"))
      .select(col("bucket"), col("owner_group"))
    val err = when(col("unavailable"), struct(
        lit("inputs_unavailable").as("code"),
        lit(null).cast("string").as("detail")))
      .when(col("e1").isNotNull, struct(col("e1.code").as("code"),
        col("e1.detail").as("detail")))
      .when(col("e2").isNotNull, struct(col("e2.code").as("code"),
        col("e2.detail").as("detail")))
      .when(col("owner_group").isNull, struct(
        lit("no_such_bucket").as("code"),
        lit(null).cast("string").as("detail")))
      .when(col("owner_group") =!= col("group_id"), struct(
        lit("group_mismatch").as("code"),
        lit(null).cast("string").as("detail")))
    requests
      .join(folded, Seq("req_id"), "left_outer")
      .join(broadcast(unavailableGroups.select(col("group_id"),
        lit(true).as("unavailable"))), Seq("group_id"), "left_outer")
      .withColumn("unavailable", coalesce(col("unavailable"), lit(false)))
      .join(broadcast(owners), Seq("bucket"), "left_outer")
      .withColumn("err", err)
      .select(col("req_id"), col("bucket"), col("group_id"),
        when(col("err").isNull, "ok").otherwise("error").as("verdict"),
        col("err").getField("code").as("error"),
        col("err").getField("detail").as("error_detail"),
        when(col("err").isNull, coalesce(col("n_rules"), lit(0L)))
          .cast("long").as("n_rules"))
  }

  /** The post-admission rule store: transactionally-sequential PutBucket-
    * Routing requests REPLACE the whole vector, so per bucket the highest
    * admitted `req_id` wins and its rules become the bucket's routing —
    * the shape `resolve`'s `bucketRules` input takes. Admission rejects
    * `node` targets, so the admitted store only carries group/class rules. */
  def admittedBucketRules(admission: DataFrame, rules: DataFrame): DataFrame = {
    val winners = admission.filter(col("verdict") === "ok")
      .groupBy("bucket").agg(max("req_id").as("req_id"))
    rules.join(broadcast(winners), Seq("req_id"))
      .select(col("bucket"), col("rule_idx"), col("key_prefix"),
        col("exact"), col("kind"), col("target"))
  }

  /** PutGroupRouting admission (reference
    * `operations/src/group_routing.rs:186-300` PutGroupRoutingOperation,
    * loader `GroupRoutingInputsOperation` `:44-142`; `validate_tenant_target`
    * `core/src/structs/routing.rs:558-571`; arms pinned by the reference's
    * own tests at `group_routing.rs:470-648`).
    *
    * The write stores ONE optional default target per group (clearing is a
    * write with no target, so the record always records who decided last,
    * `group_routing.rs:184-189`). Ladder:
    *   1. the group's routing inputs failed to load → `inputs_unavailable`
    *      (`group_routing.rs:260-263`);
    *   2. a `node` target → `operator_backend_target` (node topology never
    *      binds into replicated records);
    *   3. a `group` target the group did not register → `foreign_backend`
    *      (a foreign id would reach another tenant's credentials); the
    *      owned set is the loader's prefix scan filtered to rows whose
    *      RECORD still belongs to this group (dangling index rows are
    *      skipped) and that are not disabled (`group_routing.rs:110-114`);
    *   4. a `class` target must spell `[a-z0-9-]{1,32}` → `invalid_class`;
    *   5. a missing target (the clear) validates trivially
    *      (`group_routing.rs:218-221` checks only `Some`);
    *   6. ok → the record replaces the group's routing row.
    *
    * `requests(req_id, group_id, kind, target)` — kind NULL = clear;
    * `backendIndex(idx_group_id, record_group_id, backend_id, disabled)` —
    * the GROUP_STORAGE_BACKEND_INDEX keyspace rows the per-group prefix
    * scan sees; `unavailableGroups(group_id)` — groups whose loader failed.
    *
    * Scale: the request batch is the only corpus-sized relation; the
    * backend index and unavailable set are config-plane and broadcast, so
    * the admission is one scan with two broadcast probes — no shuffle. */
  def admitGroupDefault(requests: DataFrame, backendIndex: DataFrame,
      unavailableGroups: DataFrame): DataFrame = {
    val owned = backendIndex
      .filter(col("idx_group_id") === col("record_group_id") &&
        !col("disabled"))
      .select(col("idx_group_id").as("group_id"),
        col("backend_id").as("target"), lit(true).as("owned"))
    val err = when(col("unavailable"), struct(
        lit("inputs_unavailable").as("code"),
        lit(null).cast("string").as("detail")))
      .when(col("kind") === "node", struct(
        lit("operator_backend_target").as("code"),
        lit(null).cast("string").as("detail")))
      .when(col("kind") === "group" && !coalesce(col("owned"), lit(false)),
        struct(lit("foreign_backend").as("code"),
          col("target").as("detail")))
      .when(col("kind") === "class" &&
          !col("target").rlike("^[a-z0-9-]{1,32}$"),
        struct(lit("invalid_class").as("code"), col("target").as("detail")))
    requests
      .join(broadcast(unavailableGroups.select(col("group_id"),
        lit(true).as("unavailable"))), Seq("group_id"), "left_outer")
      .withColumn("unavailable", coalesce(col("unavailable"), lit(false)))
      .join(broadcast(owned), Seq("group_id", "target"), "left_outer")
      .withColumn("err", err)
      .select(col("req_id"), col("group_id"),
        when(col("err").isNull, "ok").otherwise("error").as("verdict"),
        col("err").getField("code").as("error"),
        col("err").getField("detail").as("error_detail"),
        when(col("err").isNull, col("kind")).as("kind"),
        when(col("err").isNull, col("target")).as("target"))
  }

  /** The post-admission group-routing store: PutGroupRouting writes are
    * transactionally sequential, so per group the highest admitted
    * `req_id`'s record stands — INCLUDING a clear (kind NULL), which keeps
    * the record with no default (`group_routing.rs:184-189`). */
  def groupRoutingStore(admission: DataFrame): DataFrame = {
    val w = Window.partitionBy("group_id").orderBy(col("req_id").desc)
    admission.filter(col("verdict") === "ok")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("group_id"), col("req_id").as("set_by"), col("kind"),
        col("target"))
  }

  /** GetGroupRouting point read (`group_routing.rs:302-407`): an absent
    * record is "no default", NOT an error (`:324-326` — most groups never
    * set one); a present record may itself carry no default (a clear).
    *
    * Scale: the routing keyspace is one row per group — the probe batch's
    * group ids broadcast INTO it (probe-keys shape), the store never
    * shuffles. */
  def getGroupRouting(probes: DataFrame, store: DataFrame): DataFrame = {
    val hits = store
      .join(broadcast(probes.select("group_id").distinct()), Seq("group_id"))
      .withColumn("has_record", lit(true))
    probes.join(broadcast(hits), Seq("group_id"), "left_outer")
      .select(col("group_id"),
        coalesce(col("has_record"), lit(false)).as("has_record"),
        col("kind"), col("target"), col("set_by"))
  }

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
