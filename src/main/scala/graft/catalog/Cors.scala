package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S3 bucket-CORS decision engine (reference `api/src/s3/cors.rs`).
  *
  * Pinned semantics:
  *  - `wildcard_match` (`cors.rs:242-256`): `*` matches everything; a
  *    pattern without `*` compares literally; otherwise split at the FIRST
  *    `*` — value must start with the prefix, end with the suffix, and be
  *    long enough that prefix and suffix do not overlap
  *    (`len(v) >= len(pre)+len(suf)`). Origins match case-SENSITIVELY,
  *    headers case-INSENSITIVELY (`pattern_matches`, `:235-240`).
  *  - `parse_requested_headers` (`cors.rs:98-105`): split on `,`, trim,
  *    drop empties, lowercase.
  *  - `match_preflight_rule` (`cors.rs:52-74`): FIRST rule (config order)
  *    whose origins match, methods match (ascii-case-insensitive), and
  *    ALL requested headers are allowed (a rule with no allowed_headers
  *    rejects any requested header, `header_allowed` `:205-213`; an empty
  *    requested list vacuously passes). Response `allow_headers` echoes
  *    the requested list when non-empty, else the rule's allowed list
  *    (`matched_allowed_headers`, `:215-221`).
  *  - `match_actual_rule` (`cors.rs:76-96`): origin+method only;
  *    `allow_headers` is the rule's own list.
  *  - `matched_origin` (`cors.rs:223-233`): a rule listing `*` among its
  *    origins answers `*`, otherwise the request's origin echoes back.
  *  - No match → preflight answers 403 (`build_preflight_forbidden_
  *    response`), an actual request passes through without CORS headers.
  *
  * Scale shape: the CORS config keyspace is catalog-sized (rules are
  * per-bucket config, AWS caps them at 100/bucket), so rules pre-aggregate
  * to ONE array row per bucket and broadcast; the request batch decides
  * per-row inside whole-stage codegen (higher-order functions over the
  * rule array) — the request side never shuffles.
  */
object Cors {

  /** `wildcard_match` as a codegen'd column expression. */
  def wildcardMatch(p: Column, v: Column): Column = {
    val star = instr(p, "*")
    val pre = p.substr(lit(1), star - 1)
    val suf = p.substr(star + 1, length(p))
    when(p === "*", lit(true))
      .when(star === 0, p === v)
      .otherwise(v.startsWith(pre) && v.endsWith(suf) &&
        length(v) >= length(pre) + length(suf))
  }

  /** `parse_requested_headers`: trim, drop empties, lowercase. */
  def parseHeaders(raw: Column): Column =
    filter(transform(split(coalesce(raw, lit("")), ","),
      h => lower(trim(h))), h => h =!= "")

  /** Decide the request batch against per-bucket rule configs.
    *
    * `requests(req_id, bucket, origin, method, headers_raw, preflight)`;
    * `rules(bucket, rule_idx, allowed_origins, allowed_methods,
    * allowed_headers, expose_headers, max_age)` (arrays; config-sized).
    * One verdict row per request; csv columns use "," separators and are
    * null when the list is empty or the request did not match.
    */
  def decide(requests: DataFrame, rules: DataFrame): DataFrame = {
    val rulesArr = rules.groupBy("bucket").agg(
      sort_array(collect_list(struct(
        col("rule_idx"), col("allowed_origins"), col("allowed_methods"),
        col("allowed_headers"), col("expose_headers"), col("max_age"))))
        .as("rules"))

    val joined = requests.join(broadcast(rulesArr), Seq("bucket"),
      "left_outer")
    val hdrs = parseHeaders(col("headers_raw"))
    def originOk(r: Column): Column =
      exists(r.getField("allowed_origins"),
        a => wildcardMatch(a, col("origin")))
    def methodOk(r: Column): Column =
      exists(r.getField("allowed_methods"),
        m => upper(m) === upper(col("method")))
    def headersOk(r: Column): Column =
      forall(hdrs, h => size(r.getField("allowed_headers")) > 0 &&
        exists(r.getField("allowed_headers"),
          a => wildcardMatch(lower(a), h)))

    val matches = filter(coalesce(col("rules"), array()),
      r => originOk(r) && methodOk(r) &&
        (!col("preflight") || headersOk(r)))
    val first = try_element_at(matches, lit(1))

    def csv(arr: Column): Column =
      when(size(arr) > 0, array_join(arr, ",")).otherwise(lit(null))
    val matched = first.isNotNull
    val allowHeaders = when(col("preflight") && size(hdrs) > 0, hdrs)
      .otherwise(first.getField("allowed_headers"))

    joined.select(
      col("req_id"), col("bucket"), col("origin"), col("method"),
      col("preflight"),
      matched.as("matched"),
      first.getField("rule_idx").as("rule_idx"),
      when(matched,
        when(array_contains(first.getField("allowed_origins"), "*"), "*")
          .otherwise(col("origin"))).as("allow_origin"),
      when(matched, csv(first.getField("allowed_methods")))
        .as("allow_methods"),
      when(matched, csv(allowHeaders)).as("allow_headers"),
      when(matched, csv(first.getField("expose_headers")))
        .as("expose_headers"),
      when(matched, first.getField("max_age")).as("max_age"),
      when(col("preflight"), when(matched, 204).otherwise(403))
        .otherwise(lit(200)).cast("int").as("status"),
      (!col("preflight") && matched).as("inject_cors"))
  }

  /** The five methods a CORS rule may allow (`api/src/s3/cors.rs:10`). */
  val ValidCorsMethods: Seq[String] =
    Seq("GET", "PUT", "HEAD", "POST", "DELETE")

  /** PutBucketCors admission — the WRITE side of [[decide]]'s config
    * (`dto_to_bucket_cors`, `api/src/s3/cors.rs:21-38,107-186`, then the
    * operation's bucket existence read, `operations/src/s3/bucket_cors.rs:
    * 87-132`):
    *
    *  - zero rules → MalformedXML (config level, before any rule);
    *  - rules convert IN DECLARATION ORDER, first failing rule decides
    *    (`collect::<Result>` short-circuits); within a rule: missing
    *    methods-or-origins, negative max_age, then each value list in
    *    struct order — methods (trim; empty; uppercase ∉ the five-method
    *    whitelist), origins (trim-empty), allowed_headers, expose_headers;
    *  - the admitted config is the NORMALIZED one (trimmed values,
    *    uppercased methods) — `norm_sig` fingerprints it so a
    *    normalization drift diverges immediately;
    *  - then the bucket record must exist (NotFound), and the config
    *    round-trips into the rule shape [[decide]] consumes.
    *
    * `requests(req_id, bucket)`; `rules(req_id, rule_ord, max_age)`;
    * `vals(req_id, rule_ord, field, val_ord, value)` with field ∈
    * method | origin | allowed_header | expose_header.
    *
    * Scale: request-plane relations only — two batch-keyed aggregations
    * and broadcast joins; the bucket catalog broadcasts. */
  def putCorsVerdicts(requests: DataFrame, rules: DataFrame,
      vals: DataFrame, buckets: DataFrame): DataFrame = {
    val fieldRank = when(col("field") === "method", 0)
      .when(col("field") === "origin", 1)
      .when(col("field") === "allowed_header", 2).otherwise(3)
    val norm = trim(col("value"))
    val piece = concat(col("rule_ord").cast("string"), lit(":"),
      col("field"), lit(":"),
      when(col("field") === "method", upper(norm)).otherwise(norm))
    val v = vals
      .withColumn("__rank", fieldRank)
      .withColumn("__fail",
        when(norm === "", concat(lit("MalformedXML:empty_"), col("field")))
          .when(col("field") === "method" &&
            !upper(norm).isin(ValidCorsMethods: _*),
            "MalformedXML:invalid_method"))
      .withColumn("__piece", piece)

    // per rule: list presence + first failing value in struct order
    val perRule = v.groupBy("req_id", "rule_ord").agg(
      max(col("field") === "method").as("has_method"),
      max(col("field") === "origin").as("has_origin"),
      min_by(col("__fail"), when(col("__fail").isNotNull,
        struct(col("__rank"), col("val_ord")))).as("val_fail"))
    val ruleV = rules.join(perRule, Seq("req_id", "rule_ord"), "left")
      .withColumn("rule_fail",
        when(!coalesce(col("has_method"), lit(false)) ||
          !coalesce(col("has_origin"), lit(false)),
          "MalformedXML:methods_origins")
          .when(col("max_age") < 0, "MalformedXML:negative_max_age")
          .otherwise(col("val_fail")))

    // per request: rule count + first failing rule in declaration order
    val perReq = ruleV.groupBy("req_id").agg(
      count(lit(1)).as("n_rules"),
      min_by(col("rule_fail"), when(col("rule_fail").isNotNull,
        col("rule_ord"))).as("first_fail"))
    val sig = v.groupBy("req_id").agg(
      md5(array_join(transform(
        array_sort(collect_list(struct(col("rule_ord"), col("__rank"),
          col("val_ord"), col("__piece")))),
        x => x.getField("__piece")), "|")).as("__sig"))

    val verdict =
      when(col("n_rules").isNull, "MalformedXML:no_rules")
        .when(col("first_fail").isNotNull, col("first_fail"))
        .when(col("in_catalog").isNull, "NotFound")
        .otherwise("Ok")
    requests
      .join(broadcast(perReq), Seq("req_id"), "left")
      .join(broadcast(buckets.select(col("bucket"),
        lit(true).as("in_catalog"))), Seq("bucket"), "left")
      .join(broadcast(sig), Seq("req_id"), "left")
      .withColumn("verdict", verdict)
      .select(col("req_id"), col("verdict"),
        when(col("verdict") === "Ok", col("n_rules")).as("n_rules"),
        when(col("verdict") === "Ok", col("__sig")).as("norm_sig"))
  }
}
