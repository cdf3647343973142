package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-connector input validation (reference
  * `operations/src/connectors/validation.rs` + `endpoint.rs`).
  *
  * First-fail ladder (`validate_connector_input`, `validation.rs:55-151`):
  * empty name → unsupported kind (Ftp — opendal cannot constrain its
  * passive data address — and ArunaNative) → empty public value → empty
  * secret value → unknown public key → unknown secret key → missing
  * required public key (in the kind's rules order) → ambiguous endpoint →
  * unsafe bucket → non-boolean `skip_signature` → credentials alongside
  * `skip_signature=true` → signed S3 without both static keys (without
  * them reqsign would walk the node's own ambient credential chain
  * against a tenant-chosen endpoint). Per-kind key rules from
  * `rules_for_kind` (`validation.rs:153-183`).
  *
  * Determinism note: the reference iterates `HashMap`s, whose order is
  * unspecified — this operator pins "first offending key" to the MINIMUM
  * key so verdicts are stable across engines and runs.
  *
  * Endpoint canonicality (`endpoint.rs:14-19`) is `url::Url` re-spelling
  * equality in the reference; this operator pins the reference's OWN test
  * table (`rejects_respelled_hosts` / `accepts_plain_endpoints`) as
  * explicit rules — lowercase scheme+host, plain host shape, and no
  * re-spelled IPv4 (all-digits, 0x-hex, trailing dot, non-4-part or
  * leading-zero dotted-decimal). `breaks_authority` (`endpoint.rs:21-23`)
  * is the literal `/ \ ? # @` character class.
  *
  * Scale shape: pure per-row column logic (regex + array HOFs) over the
  * request batch — no joins, no shuffle, whole-stage codegen except the
  * HOF filters.
  */
object Connectors {

  /** Canonical-endpoint predicate (the pinned reference test-table rules). */
  def isCanonical(e: Column): Column = {
    val shape =
      e.rlike("^https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[A-Za-z0-9/._-]*)?$")
    val host = regexp_extract(e, "^https?://([^/:]+)", 1)
    val respelled =
      host.rlike("^[0-9]+$") ||                 // decimal-int host
        lower(host).rlike("^0x[0-9a-f]+$") ||   // hex host
        host.rlike("\\.$") ||                   // trailing dot
        host.rlike("[A-Z]") ||                  // url lowercases hosts
        (host.rlike("^[0-9.]+$") &&             // dotted-decimal must be
          !host.rlike(                          // exactly 4 plain octets
            "^(0|[1-9][0-9]{0,2})(\\.(0|[1-9][0-9]{0,2})){3}$"))
    shape && !respelled
  }

  /** `breaks_authority`: the value would escape the URL authority. */
  def breaksAuthority(v: Column): Column = v.rlike("[/\\\\?#@]")

  private def arr(xs: String*): Column = array(xs.map(lit): _*)

  def requiredPublicKeys(kind: Column): Column =
    when(kind === "S3", arr("bucket", "endpoint")).otherwise(arr("endpoint"))

  def allowedPublicKeys(kind: Column): Column =
    when(kind === "S3",
      arr("bucket", "endpoint", "region", "root", "skip_signature"))
      .when(kind === "ArunaNative",
        arr("endpoint", "realm_id", "default_node_id"))
      .otherwise(arr("endpoint", "root")) // Http, Webdav, Ftp

  def allowedSecretKeys(kind: Column): Column =
    when(kind === "S3", arr("access_key_id", "secret_access_key"))
      .when(kind === "Ftp", arr("user", "password"))
      .when(kind === "ArunaNative",
        arr("bearer_token", "access_key", "secret_key"))
      .otherwise(arr("username", "password", "token")) // Http, Webdav

  /** Validate the request batch. `requests(req_id, name, kind,
    * pub: array<struct<k,v>>, sec: array<struct<k,v>>)` → one verdict row
    * per request with the offending key/value detail. */
  def validate(requests: DataFrame): DataFrame = {
    val pub = coalesce(col("pub"), array())
    val sec = coalesce(col("sec"), array())
    def keysOf(cfg: Column): Column = transform(cfg, kv => kv.getField("k"))
    def valueOf(cfg: Column, key: String): Column =
      try_element_at(filter(cfg, kv => kv.getField("k") === key), lit(1))
        .getField("v")
    def minKey(c: Column): Column = array_min(c)

    val emptyPubKey = minKey(keysOf(
      filter(pub, kv => trim(kv.getField("v")) === "")))
    val emptySecKey = minKey(keysOf(
      filter(sec, kv => trim(kv.getField("v")) === "")))
    val allowedPub = allowedPublicKeys(col("kind"))
    val allowedSec = allowedSecretKeys(col("kind"))
    val unknownPubKey = minKey(filter(keysOf(pub),
      k => !array_contains(allowedPub, k)))
    val unknownSecKey = minKey(filter(keysOf(sec),
      k => !array_contains(allowedSec, k)))
    // required keys check in the RULES order (reference iterates the
    // static slice, which is deterministic)
    val missingReqKey = try_element_at(filter(requiredPublicKeys(col("kind")),
      k => !array_contains(keysOf(pub), k)), lit(1))
    val endpoint = valueOf(pub, "endpoint")
    val bucket = valueOf(pub, "bucket")
    val skip = valueOf(pub, "skip_signature")
    val anonymous = coalesce(skip === "true", lit(false))
    val hasCreds = array_contains(keysOf(sec), "access_key_id") &&
      array_contains(keysOf(sec), "secret_access_key")

    val verdict =
      when(trim(col("name")) === "", struct(lit("empty_name")
        .as("error"), lit(null).cast("string").as("detail")))
        .when(col("kind").isin("Ftp", "ArunaNative"),
          struct(lit("unsupported_kind").as("error"),
            col("kind").as("detail")))
        .when(emptyPubKey.isNotNull,
          struct(lit("empty_public_value").as("error"),
            emptyPubKey.as("detail")))
        .when(emptySecKey.isNotNull,
          struct(lit("empty_secret_value").as("error"),
            emptySecKey.as("detail")))
        .when(unknownPubKey.isNotNull,
          struct(lit("unknown_public_key").as("error"),
            unknownPubKey.as("detail")))
        .when(unknownSecKey.isNotNull,
          struct(lit("unknown_secret_key").as("error"),
            unknownSecKey.as("detail")))
        .when(missingReqKey.isNotNull,
          struct(lit("missing_required_public_key").as("error"),
            missingReqKey.as("detail")))
        .when(endpoint.isNotNull && !isCanonical(endpoint),
          struct(lit("ambiguous_endpoint").as("error"),
            endpoint.as("detail")))
        .when(bucket.isNotNull && breaksAuthority(bucket),
          struct(lit("unsafe_bucket").as("error"), bucket.as("detail")))
        .when(skip.isNotNull && !skip.isin("true", "false"),
          struct(lit("invalid_bool_value").as("error"),
            lit("skip_signature").as("detail")))
        .when(anonymous && size(sec) > 0,
          struct(lit("credentials_with_skip_signature").as("error"),
            lit(null).cast("string").as("detail")))
        .when(col("kind") === "S3" && !anonymous && !hasCreds,
          struct(lit("missing_credentials").as("error"),
            lit(null).cast("string").as("detail")))
        .otherwise(struct(lit("ok").as("error"),
          lit(null).cast("string").as("detail")))

    requests.select(col("req_id"), col("name"), col("kind"),
      verdict.getField("error").as("verdict"),
      verdict.getField("detail").as("detail"),
      (verdict.getField("error") === "ok").as("valid"))
  }

  /** Source-connector CRUD around cv1's validation (reference
    * `operations/src/connectors/{get,list,replace,delete}_source_
    * connector.rs` + `repository.rs:16-24` — the store is
    * (group, connector)-keyed, so a wrong group IS NotFound):
    *
    *  - **get** (`get_source_connector.rs:43,92`): point read;
    *  - **list**: the group's prefix scan (count here);
    *  - **replace** (`replace_source_connector.rs:148-250`): NotFound;
    *    then the FULL reference-version scan — any
    *    `BlobVersion::Reference` bound to this connector aborts as
    *    ReferencedByObjectVersion (a referenced connector's config is
    *    load-bearing for retained data); an admitted replace KEEPS
    *    connector_id/group/created_at/created_by and takes the new
    *    name/kind/config with a fresh updated_at (`:160-171`);
    *  - **delete** (`delete_source_connector.rs:126,194`): same NotFound
    *    + referenced guard; removes the record and its secret row.
    *
    * `requests(req_id, op, group_id, connector_id)`;
    * `connectors(group_id, connector_id, name, kind, has_secret)`;
    * `referencing(connector_id)` — connectors bound by reference blob
    * versions.
    *
    * Scale: the connector store is group-config-sized; the reference
    * guard probes the versions-derived referencing set with broadcast
    * request keys, never scanning the corpus per request. */
  def crud(requests: DataFrame, connectors: DataFrame,
      referencing: DataFrame): DataFrame = {
    val probe = requests.select("group_id", "connector_id").distinct()
    val hits = connectors.join(broadcast(probe),
        Seq("group_id", "connector_id"))
      .select(col("group_id"), col("connector_id"), col("name"),
        col("kind"), col("has_secret"))
    val refHits = referencing
      .join(broadcast(requests.select("connector_id").distinct()),
        Seq("connector_id"))
      .select(col("connector_id"), lit(true).as("referenced")).distinct()
    val perGroup = connectors
      .join(broadcast(requests.filter(col("op") === "list")
        .select("group_id").distinct()), Seq("group_id"))
      .groupBy("group_id").agg(count(lit(1)).as("n_connectors"))

    val j = requests
      .join(broadcast(hits), Seq("group_id", "connector_id"), "left")
      .join(broadcast(refHits), Seq("connector_id"), "left")
      .join(broadcast(perGroup), Seq("group_id"), "left")
    val found = col("name").isNotNull
    val isRef = coalesce(col("referenced"), lit(false))
    val verdict =
      when(col("op") === "list", "Ok")
        .when(!found, "NotFound")
        .when(col("op").isin("replace", "delete") && isRef,
          "ReferencedByObjectVersion")
        .otherwise("Ok")
    val ok = col("verdict") === "Ok"
    j.withColumn("verdict", verdict).select(
      col("req_id"), col("op"), col("verdict"),
      when(ok && col("op") === "get", col("name")).as("name"),
      when(ok && col("op") === "get", col("kind")).as("kind"),
      when(ok && col("op") === "get", col("has_secret")).as("has_secret"),
      when(ok && col("op") === "list",
        coalesce(col("n_connectors"), lit(0L))).as("n_connectors"),
      // replace keeps identity/creation fields, delete removes the pair
      (ok && col("op") === "replace").as("identity_preserved"),
      when(ok && col("op") === "delete",
        when(col("has_secret"), 2L).otherwise(1L)).as("n_deleted"))
  }
}
