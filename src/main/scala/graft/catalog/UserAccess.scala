package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S3 user-access credential operations (reference
  * `operations/src/s3/{create,get,list,revoke}_user_access.rs` +
  * `core/src/structs/blob.rs:893-931` `UserAccess`).
  *
  * One mixed batch over the maintained credential keyspace:
  *
  *  - **create** (`create_user_access.rs:88-120`): `build_access_key`
  *    (`blob.rs:901-913`) — empty or >128 chars → InvalidLength, any
  *    non-ASCII-alphanumeric byte → NotAlphanumeric; an admitted create
  *    writes unconditionally (no existence read) with
  *    `expiry = now + DEFAULT_CREDENTIAL_TTL` (365 days,
  *    `create_user_access.rs:19`);
  *  - **get** (`get_user_access.rs:58-87`): point read — NotFound, else
  *    the record plus the auth-layer predicates `is_expired`
  *    (`expiry <= now`, INCLUSIVE at the boundary, `blob.rs:923-925`) and
  *    `is_revoked`;
  *  - **revoke** (`revoke_user_access.rs:91-127`): NotFound; an
  *    already-revoked credential commits WITHOUT writing — idempotent Ok,
  *    original `revoked_at` preserved, `revoked_now` false; otherwise
  *    `revoked_at = now`;
  *  - **list** (`list_user_access.rs:81-111`): every credential whose
  *    `user_identity` matches — revoked and expired rows INCLUDED (the
  *    reference's page loop filters on identity only; callers see dead
  *    credentials and their revocation state).
  *
  * Scale: the credential keyspace is the corpus side; request keys
  * broadcast INTO it (point-read probe + an identity-grouped count over
  * the probed identities only), and the bounded hit-sets join back
  * broadcast. The reference's list is a full keyspace scan filtered
  * client-side; here the identity filter pushes into the store scan —
  * same results, index-served.
  */
object UserAccess {

  val AccessKeyMaxLen = 128 // blob.rs:18
  val DefaultTtlMs: Long = 365L * 24 * 60 * 60 * 1000 // create_user_access.rs:19

  /** `requests(req_id, op, key_id, user_id, now_ms)` with op ∈
    * create | get | revoke | list; `creds(access_key, user_id, group_id,
    * expiry_ms, revoked_at_ms)`. */
  def verdicts(requests: DataFrame, creds: DataFrame): DataFrame = {
    val keyBad =
      when(length(col("key_id")) === 0 ||
        length(col("key_id")) > AccessKeyMaxLen, "InvalidLength")
        .when(col("key_id").rlike("[^0-9A-Za-z]"), "NotAlphanumeric")

    // Probe the corpus-scale credential keyspace with broadcast request
    // keys (the drs1/po1 shape); the resulting hit-sets are bounded by the
    // request batch, so joining them back broadcast is safe at any scale.
    val probeKeys = requests.select(col("key_id")).distinct()
    val point = creds
      .join(broadcast(probeKeys),
        creds("access_key") === probeKeys("key_id"))
      .select(col("key_id"), col("user_id").as("c_user"),
        col("group_id").as("c_group"),
        col("expiry_ms"), col("revoked_at_ms"))

    val probeUsers = requests.filter(col("op") === "list")
      .select(col("user_id")).distinct()
    val byUser = creds.join(broadcast(probeUsers), Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_creds"))

    val joined = requests
      .join(broadcast(point), Seq("key_id"), "left")
      .join(broadcast(byUser), Seq("user_id"), "left")
    val found = col("c_user").isNotNull

    val verdict =
      when(col("op") === "create", coalesce(keyBad, lit("Ok")))
        .when(col("op") === "list", "Ok")
        .when(!found, "NotFound")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"

    joined.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      // create: the written credential's expiry
      when(ok && col("op") === "create", col("now_ms") + DefaultTtlMs)
        .as("new_expiry_ms"),
      // get: the auth predicates at request time
      when(ok && col("op") === "get", col("expiry_ms") <= col("now_ms"))
        .as("expired"),
      when(ok && col("op") === "get", col("revoked_at_ms").isNotNull)
        .as("revoked"),
      // revoke: idempotency — an already-revoked row keeps its stamp
      when(ok && col("op") === "revoke", col("revoked_at_ms").isNull)
        .as("revoked_now"),
      when(ok && col("op") === "revoke",
        coalesce(col("revoked_at_ms"), col("now_ms"))).as("revoked_at_out"),
      // list: identity-filtered count, dead credentials included
      when(ok && col("op") === "list", coalesce(col("n_creds"), lit(0L)))
        .as("n_creds"))
  }
}
