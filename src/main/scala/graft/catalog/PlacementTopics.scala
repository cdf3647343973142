package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard-topic genesis / adoption ladder (reference
  * `operations/src/process_placements.rs:47-287`).
  *
  * A placement pass walks every held shard topic. Rank-0 holders
  * (`ensure_rank0_shard_group`, `:185-287`) own genesis creation and must
  * never fork a second one ("forking a second one is a permanent
  * split-brain"):
  *
  *  - a topic already known locally is only membership-topped-up;
  *  - a missing topic with NO co-holders creates immediately — no peer can
  *    hold a divergent genesis;
  *  - otherwise the co-holders are probed: a topic a co-holder already
  *    holds is ADOPTED via anti-entropy (and an adopt that fails to land
  *    must NOT fall through to a fresh create — it is withheld and
  *    retried); a topic every reached co-holder POSITIVELY confirmed
  *    unknown is created fresh; but any unreachable co-holder — or a
  *    reached one that refused the topic (its summary silently omitted,
  *    `unconfirmed`) — withholds creation for the next pass;
  *  - non-rank-0 members (`:112-168`) never mint: a missing topic is
  *    PULLED from co-holders (join-only, cannot fork); a pull no
  *    co-holder serves leaves `pull_pending` so the pass retries instead
  *    of staying passive forever; members with no co-holders skip.
  *
  * Scale: pure per-topic column logic over the held-shard relation (shard
  * count × strategies, config-plane sized) plus two scalar trailers. */
object PlacementTopics {

  /** `topics(topic_id, rank0, n_coholders, exists_locally,
    * known_by_coholder, unconfirmed, group_unreachable, lands)` — `lands`
    * simulates whether an adopt/pull actually materialized the genesis.
    *
    * Returns per-topic `(topic_id, verdict, withheld, pull_pending)` plus
    * the pass trailers `(any_withheld, any_pull_pending)` on every row. */
  def genesisLadder(topics: DataFrame): DataFrame = {
    val perTopic = topics
      .withColumn("verdict",
        when(col("exists_locally"), "membership_topup")
          .when(col("rank0") && col("n_coholders") === 0, "create_sole")
          .when(col("rank0") && col("known_by_coholder"),
            when(col("lands"), "adopted").otherwise("withheld_adopt"))
          .when(col("rank0") && !col("group_unreachable") &&
            !col("unconfirmed"), "create_fresh")
          .when(col("rank0"), "withheld_probe")
          // member ranks never mint
          .when(col("n_coholders") === 0, "member_skip")
          .when(col("lands"), "pulled")
          .otherwise("pull_pending"))
      .withColumn("withheld",
        col("verdict").isin("withheld_adopt", "withheld_probe"))
      .withColumn("pull_pending", col("verdict") === "pull_pending")
    val trailer = perTopic.agg(
      max(when(col("withheld"), 1L).otherwise(0L)).as("__w"),
      max(when(col("pull_pending"), 1L).otherwise(0L)).as("__p"))
    perTopic
      .crossJoin(broadcast(trailer))
      .select(col("topic_id"), col("verdict"), col("withheld"),
        col("pull_pending"), (col("__w") === 1L).as("any_withheld"),
        (col("__p") === 1L).as("any_pull_pending"))
  }
}
