package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Onboarding-secret claim verdicts (reference
  * `operations/src/{reserve,consume}_onboarding_secret.rs` +
  * `onboarding_secret_state.rs`).
  *
  * Secret lifecycle: Available → Reserved(node, expires) →
  * Finalizing(node) → Consumed(node) (`core/src/onboarding.rs:44-49`).
  *
  * RESERVE ladder (`read_record`/`availability`, `reserve_:85-146`):
  * missing record → not_found; hash mismatch → invalid_secret; then by
  * state — Available: expired record → expired, else reserve; Reserved
  * by the SAME node: re-reserve (extends, no expiry check); Reserved by
  * another node: unexpired reservation → already_claimed, expired
  * reservation over an expired record → expired, else the reservation is
  * stolen; Finalizing/Consumed by the same node → idempotent success
  * WITHOUT a write; by another node → already_claimed.
  *
  * CONSUME ladder (`consume_:157-245`): missing → not_found; an EXPIRED
  * record stays consumable only mid-handshake — state Reserved by the
  * same node with an UNEXPIRED reservation, or Finalizing/Consumed by the
  * same node — anything else → expired (checked BEFORE the hash, unlike
  * reserve); hash mismatch → invalid_secret; then Available / Reserved
  * (same) / Finalizing (same) → consumed now; Consumed by the same node →
  * idempotent success with `consumed_now = false`
  * (`claims_secret_idempotently_for_same_node`); any state held by
  * another node → already_claimed.
  *
  * Scale shape: one equi-join of the request batch against the secret
  * store by enrollment id (both control-plane-sized), pure CASE ladder
  * after — no windows, no driver loop.
  */
object Onboarding {

  /** `requests(req_id, enrollment_id, op, node_id, secret_hash)` with op
    * reserve|consume; `store(enrollment_id, secret_hash, expires_at,
    * state, state_node, state_expires_at)` with state Available |
    * Reserved | Finalizing | Consumed. */
  def decide(requests: DataFrame, store: DataFrame, nowMs: Long,
      reservationExpiresAt: Long): DataFrame = {
    val st = store.select(col("enrollment_id"),
      col("secret_hash").as("s_hash"), col("expires_at"),
      col("state"), col("state_node"), col("state_expires_at"))
    val j = requests.join(st, Seq("enrollment_id"), "left_outer")

    val same = col("state_node") === col("node_id")
    val recordExpired = col("expires_at") < nowMs
    val resExpired = col("state_expires_at") < nowMs
    val hashBad = col("s_hash") =!= col("secret_hash")

    val reserveVerdict =
      when(col("s_hash").isNull, "not_found")
        .when(hashBad, "invalid_secret")
        .when(col("state") === "Available",
          when(recordExpired, "expired").otherwise("reserved"))
        .when(col("state") === "Reserved" && same, "reserved")
        .when(col("state") === "Reserved",
          when(!resExpired, "already_claimed")
            .when(recordExpired, "expired")
            .otherwise("reserved"))
        .when(col("state").isin("Finalizing", "Consumed") && same,
          "ok_idempotent")
        .otherwise("already_claimed")

    // an expired record is only consumable mid-handshake by its own node
    val expiredEscape =
      (col("state") === "Reserved" && same && !resExpired) ||
        (col("state").isin("Finalizing", "Consumed") && same)
    val consumeVerdict =
      when(col("s_hash").isNull, "not_found")
        .when(recordExpired && !expiredEscape, "expired")
        .when(hashBad, "invalid_secret")
        .when(col("state") === "Available", "consumed")
        .when(col("state").isin("Reserved", "Finalizing") && same,
          "consumed")
        .when(col("state") === "Consumed" && same, "ok_idempotent")
        .otherwise("already_claimed")

    val verdict = when(col("op") === "reserve", reserveVerdict)
      .otherwise(consumeVerdict)
    j.select(col("req_id"), col("enrollment_id"), col("op"),
      col("node_id"), verdict.as("verdict"),
      when(col("op") === "consume" && verdict === "consumed", true)
        .when(col("op") === "consume" && verdict === "ok_idempotent", false)
        .as("consumed_now"),
      when(verdict === "reserved", lit(reservationExpiresAt))
        .cast("long").as("reserved_until_ms"))
  }

  /** Initial realm-admin claim (reference
    * `operations/src/claim_initial_realm_admin.rs:157-265`): the one-shot
    * bootstrap that seats the first realm admin. Ladder:
    *
    *  - the realm authorization document must exist and carry a
    *    `realm_admin` role;
    *  - the claim is idempotent-by-refusal: an already-assigned role (the
    *    doc view), an existing reducer-state assignment, or a CONFLICT on
    *    the role's assignment path all abort as already-claimed — a
    *    conflicted path means two nodes raced the claim and neither may
    *    win it retroactively;
    *  - a reducer state bound to a DIFFERENT target is corrupt state and
    *    errors rather than aborts (`TargetMismatch`).
    *
    * `claims(realm_id, has_auth_doc, has_role, n_assigned,
    * reducer_target_ok, reducer_assigned, reducer_conflict)` — reducer
    * columns NULL when no reducer state exists. Returns
    * `(realm_id, verdict)` with verdict ∈ auth_doc_missing |
    * role_missing | already_assigned | target_mismatch |
    * already_in_reducer | conflicted_path | claimed. */
  def claimInitialAdmin(claims: DataFrame): DataFrame = claims
    .withColumn("verdict",
      when(!col("has_auth_doc"), "auth_doc_missing")
        .when(!col("has_role"), "role_missing")
        .when(col("n_assigned") > 0, "already_assigned")
        .when(coalesce(!col("reducer_target_ok"), lit(false)),
          "target_mismatch")
        .when(coalesce(col("reducer_assigned"), lit(false)),
          "already_in_reducer")
        .when(coalesce(col("reducer_conflict"), lit(false)),
          "conflicted_path")
        .otherwise("claimed"))
    .select(col("realm_id"), col("verdict"))

  /** The rest of the secret lifecycle around ob1's reserve/consume
    * (reference `create_onboarding_secret.rs:96-122`,
    * `inspect_onboarding_secret.rs:125-170`,
    * `delete_onboarding_secret.rs:104-135`,
    * `list_onboarding_secrets.rs:72-186`):
    *
    *  - **create**: an UNCONDITIONAL overwrite — no existence read; the
    *    state row resets to Available alongside the record;
    *  - **inspect**: NotFound; a Finalizing state held by ANOTHER node →
    *    AlreadyClaimed (before the expiry check); expiry — EXCEPT that the
    *    node mid-finalize may inspect past it (`:151-163`); then the hash
    *    → InvalidSecret; Ok returns the record;
    *  - **delete**: NotFound, else both the record and its state row go
    *    (n_deleted 2);
    *  - **list**: the full `secret:` prefix scan joined to its states —
    *    NO expiry filter; callers see dead secrets and who claimed them.
    *
    * Same `store` shape as [[decide]]. `requests(req_id, op,
    * enrollment_id, node_id, secret_hash, now_ms)`. */
  def lifecycle(requests: DataFrame, store: DataFrame): DataFrame = {
    val st = store.select(col("enrollment_id"),
      col("secret_hash").as("s_hash"), col("expires_at"),
      col("state"), col("state_node"))
    // list answers the whole config-plane keyspace: one aggregate row,
    // broadcast onto the batch (no driver-side count)
    val totals = store.agg(count(lit(1)).as("n_secrets_all"))
    val j = requests.join(broadcast(st), Seq("enrollment_id"), "left")
      .crossJoin(broadcast(totals))
    val finalizingSelf = col("state") === "Finalizing" &&
      col("state_node") === col("node_id")
    val verdict =
      when(col("op") === "create", "Ok")
        .when(col("op") === "list", "Ok")
        .when(col("s_hash").isNull, "NotFound")
        .when(col("op") === "delete", "Ok")
        // inspect
        .when(col("state") === "Finalizing" &&
          col("state_node") =!= col("node_id"), "AlreadyClaimed")
        .when(col("expires_at") < col("now_ms") && !finalizingSelf,
          "Expired")
        .when(col("s_hash") =!= col("secret_hash"), "InvalidSecret")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      when(ok && col("op") === "create", "Available").as("state_out"),
      when(ok && col("op") === "delete", 2L).as("n_deleted"),
      when(ok && col("op") === "list", col("n_secrets_all")).as("n_secrets"),
      when(ok && col("op") === "inspect", col("expires_at"))
        .as("expires_at_out"))
  }

  /** Onboarding sync tickets (reference
    * `operations/src/issue_onboarding_sync_ticket.rs` +
    * `core/src/onboarding.rs:160-215`):
    *
    *  - **issue**: the ticket's document set is the FIVE realm-scoped
    *    control targets (RealmAuthorization, RealmConfig, and the issuer
    *    node's NodeUsage / NodeInfo / WatchInterest) plus one User target
    *    per user of the realm — a paged prefix scan that SKIPS
    *    foreign-realm keys (`:150-158`); `expires_at = now + ttl`
    *    (saturating). The Ed25519 signature over the payload is
    *    transport (the repo's signed-cursor machinery pins the
    *    primitive);
    *  - **verify** (`onboarding.rs:188-207`): the expected node, the
    *    expiry (`expires_at < now`), and membership of the expected
    *    document all collapse to InvalidSecret.
    *
    * `requests(req_id, op, realm_id, node_id, now_s, ttl_s, t_node,
    * t_expires, has_document)`; `users(user_id, realm_id)`.
    *
    * Scale: the user keyspace is corpus-side — the requested realms probe
    * it broadcast and only per-realm counts come back. */
  def syncTickets(requests: DataFrame, users: DataFrame): DataFrame = {
    val probeRealms = requests.filter(col("op") === "issue")
      .select("realm_id").distinct()
    val counts = users.join(broadcast(probeRealms), Seq("realm_id"))
      .groupBy("realm_id").agg(count(lit(1)).as("n_users"))
    val j = requests.join(broadcast(counts), Seq("realm_id"), "left")
    val verdict =
      when(col("op") === "issue", "Ok")
        .when(col("t_node") =!= col("node_id"), "InvalidSecret")
        .when(col("t_expires") < col("now_s"), "InvalidSecret")
        .when(!col("has_document"), "InvalidSecret")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      when(ok && col("op") === "issue",
        lit(5L) + coalesce(col("n_users"), lit(0L))).as("n_documents"),
      when(ok && col("op") === "issue", col("now_s") + col("ttl_s"))
        .as("expires_at"))
  }

  val KindLabelKey = "aruna-engine.org/kind" // node_info.rs:8
  val StorageClassLabelPrefix = "aruna-engine.org/storage-class/" // :13

  /** The joiner-admission slice of bootstrap onboarding finalize
    * (reference `bootstrap_onboarding_finalize.rs:268-288`
    * `build_joiner_placement_entry` + `node_info.rs:17-22`
    * `reserved_label`) — the only DECISIONS the 1145-LoC orchestration
    * makes itself; everything else composes already-gated operations
    * (reserve/consume = ob1, realm-config read = grc1, sync ticket =
    * ot1, placement mutation = the mutate ladder).
    *
    * Payload-sourced labels are rejected when any key is the kind label
    * or carries the storage-class prefix — the FIRST such key in BTreeMap
    * (lexicographic) order names the error; then the crr1 location/weight
    * normalization applies.
    *
    * `requests(req_id, node_location, node_weight)`;
    * `reqLabels(req_id, label_key)`. */
  def joinerAdmission(requests: DataFrame, reqLabels: DataFrame): DataFrame = {
    val reservedAgg = reqLabels
      .filter(col("label_key") === KindLabelKey ||
        col("label_key").startsWith(StorageClassLabelPrefix))
      .groupBy("req_id").agg(min(col("label_key")).as("reserved_key"))
    val trimmed = trim(col("node_location"))
    val j = requests.join(broadcast(reservedAgg), Seq("req_id"), "left")
    val verdict =
      when(col("reserved_key").isNotNull,
        concat(lit("ReservedNodeLabel:"), col("reserved_key")))
        .when(col("node_location").isNotNull &&
          length(trimmed) > Realms.MaxNodeLocationLen, "NodeLocationTooLong")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("verdict"),
      when(ok, coalesce(trimmed, lit(""))).as("location_out"),
      when(ok, when(col("node_weight").isNull, Realms.DefaultNodeWeight)
        .otherwise(least(greatest(col("node_weight"), lit(1L)),
          lit(Realms.MaxNodeWeight)))).as("weight_out"))
  }
}
