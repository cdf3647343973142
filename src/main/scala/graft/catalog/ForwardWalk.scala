package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metadata write forwarding (reference `operations/src/metadata/forward.rs`).
  *
  * Route (`write_route`, `forward.rs:85-104`): a NIL placement has no
  * governing strategy (early bootstrap) so the local node stays the
  * authority even without readable config; a non-NIL placement without
  * config fails CLOSED — an empty forward route is undeliverable ("never
  * accepted, never deferred into an outbox", `:74-77`); otherwise local
  * when this node holds the placement, else the bucket's holders in rank
  * order.
  *
  * The holder walk (`forward_to_holders`, `:1139-1219`) tries holders in
  * rank order, skipping the local node:
  *  - Denied(Unauthorized) / Denied(Forbidden) terminate with that error;
  *  - NotFound counts toward the all-holders-miss rule for update/delete
  *    (`tracks_not_found`) but is a plain failure for a forwarded create;
  *  - Unavailable records a failure and tries the next holder;
  *  - Reject terminates undeliverable — the holder judged the write
  *    unsafe to replay;
  *  - a transport error that was DEFINITELY not sent tries the next
  *    holder; one that was POSSIBLY sent terminates undeliverable —
  *    replaying could double-apply (`retry_disposition`, `:1226-1231`);
  *  - any other response is the accepted reply.
  * After a full walk: update/delete where EVERY holder (the local miss
  * included) answered NotFound → NotFound; otherwise undeliverable, with
  * "no reachable holder" when nothing even failed (`:1203-1218`).
  *
  * Scale: one rank-ordered window per request over holder-attempt rows —
  * holder lists are shard-replica sized (single digits); the fold is
  * map-side after one shuffle on req_id. */
object ForwardWalk {

  /** Fold attempt outcomes into one verdict per request.
    *
    * `requests(req_id, op, route, local_miss)` with op ∈
    * create | update | delete and route ∈ local | forward | forward_empty;
    * `attempts(req_id, rank, node_id, resp)` with resp ∈ ok |
    * denied_unauthorized | denied_forbidden | not_found | unavailable |
    * reject | err_not_sent | err_possibly_sent | local_self.
    *
    * Returns `(req_id, outcome, accepted_by, n_attempted, n_failures,
    * detail)` with outcome ∈ local | accepted | unauthorized | forbidden |
    * not_found | undeliverable and detail ∈ config_unavailable |
    * rejected | possibly_sent | all_not_found | failures | no_holder when
    * it applies. */
  def fold(requests: DataFrame, attempts: DataFrame): DataFrame = {
    val tracksNf = col("op").isin("update", "delete")
    val walk = attempts.filter(col("resp") =!= "local_self")
    val terminal = col("resp").isin("ok", "denied_unauthorized",
      "denied_forbidden", "reject", "err_possibly_sent")

    val wReq = Window.partitionBy("req_id")
    val ann = walk
      .withColumn("stop_rank",
        min(when(terminal, col("rank"))).over(wReq))
      .withColumn("reached",
        col("stop_rank").isNull || col("rank") <= col("stop_rank"))
    val perReq = ann.groupBy("req_id").agg(
      count(when(col("reached"), 1)).as("n_attempted"),
      min(when(col("rank") === col("stop_rank"),
        struct(col("resp"), col("node_id")))).as("stop"),
      sum(when(col("reached") && col("resp") === "not_found", 1L)
        .otherwise(0L)).as("nf_walk"),
      // failures: unavailable, not-sent errors — and NotFound for creates,
      // resolved against op below
      sum(when(col("reached") &&
        col("resp").isin("unavailable", "err_not_sent"), 1L).otherwise(0L))
        .as("fail_other"),
      count(lit(1)).as("n_remote"))
    // holders.len() counts the local holder too; the local miss seeds the
    // not-found tally (forward.rs:1155-1158)
    val holderCount = attempts.groupBy("req_id")
      .agg(count(lit(1)).as("n_holders"))

    requests
      .join(holderCount, Seq("req_id"), "left_outer")
      .join(perReq, Seq("req_id"), "left_outer")
      .withColumn("nf_total", coalesce(col("nf_walk"), lit(0L)) +
        when(col("local_miss"), 1L).otherwise(0L))
      .withColumn("n_failures", coalesce(col("fail_other"), lit(0L)) +
        when(!tracksNf, coalesce(col("nf_walk"), lit(0L))).otherwise(0L))
      .withColumn("outcome",
        when(col("route") === "local", "local")
          .when(col("route") === "forward_empty", "undeliverable")
          .when(col("stop.resp") === "ok", "accepted")
          .when(col("stop.resp") === "denied_unauthorized", "unauthorized")
          .when(col("stop.resp") === "denied_forbidden", "forbidden")
          .when(col("stop.resp").isin("reject", "err_possibly_sent"),
            "undeliverable")
          .when(tracksNf && coalesce(col("n_holders"), lit(0L)) > 0 &&
            col("nf_total") === coalesce(col("n_holders"), lit(0L)),
            "not_found")
          .otherwise("undeliverable"))
      .withColumn("accepted_by",
        when(col("outcome") === "accepted", col("stop.node_id")))
      .withColumn("detail",
        when(col("route") === "local", lit(null).cast("string"))
          .when(col("route") === "forward_empty", "config_unavailable")
          .when(col("stop.resp") === "reject", "rejected")
          .when(col("stop.resp") === "err_possibly_sent", "possibly_sent")
          .when(col("outcome") === "not_found", "all_not_found")
          .when(col("outcome") === "undeliverable" &&
            col("n_failures") === 0, "no_holder")
          .when(col("outcome") === "undeliverable", "failures"))
      .select(col("req_id"), col("outcome"), col("accepted_by"),
        when(col("route") === "forward",
          coalesce(col("n_attempted"), lit(0L))).as("n_attempted"),
        when(col("route") === "forward", col("n_failures"))
          .as("n_failures"),
        col("detail"))
  }
}
