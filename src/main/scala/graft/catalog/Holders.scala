package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blob-holder resolution (reference `operations/src/blob_holders.rs`):
  *
  *  - the refresh sweep walks the blob-locations keyspace in key order and
  *    publishes ONE DHT registration per distinct content hash — copies of
  *    one hash on different backends sort adjacent and dedup
  *    (`blob_holders.rs:143-153`);
  *  - holder lookup returns the DHT entries for a hash, realm-filtered,
  *    excluding the asking node itself, deduped and byte-sorted by node id
  *    (`blob_holders.rs:251-262`); expired registrations are invisible (the
  *    DHT layer's TTL, `registration_uses_ttl`).
  *
  * Scale: the sweep is one distinct-aggregation over the locations keyspace
  * (hash-partitioned, map-side partial); the lookup joins the content-hash
  * key — both sides data-plane-sized, no broadcast hint, AQE decides. */
object Holders {

  /** Per-hash holder resolution over the locations keyspace: one output row
    * per distinct hash (the refresh sweep's publish set) with its backend
    * copy count and the sorted holder list. */
  def blobHolders(locations: DataFrame, dhtEntries: DataFrame,
      realm: String, selfNode: String, nowMs: Long): DataFrame = {
    val publishSet = locations.groupBy(col("blake3"))
      .agg(count(lit(1)).as("n_copies"))
    val live = dhtEntries
      .filter(col("realm") === realm && col("node_id") =!= selfNode &&
        col("expires_at_ms") > nowMs)
      .groupBy(col("blake3"))
      .agg(array_sort(collect_set(col("node_id"))).as("__hs"))
    publishSet.join(live, Seq("blake3"), "left_outer")
      .select(col("blake3"), col("n_copies"),
        concat_ws(",", coalesce(col("__hs"), array())).as("holders"),
        coalesce(size(col("__hs")), lit(0)).cast("long").as("n_holders"))
  }
}
