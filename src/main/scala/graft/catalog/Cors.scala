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
}
