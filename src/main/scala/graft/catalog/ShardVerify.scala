package graft.catalog

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Blake3

/** Shard-manifest assembly digest + the new-holder verification verdict
  * ladder (reference `operations/src/shard/mod.rs:22-73` and
  * `operations/src/shard/verify.rs:57-255`).
  *
  * A shard manifest is the per-holder entry set of a (strategy, shard)
  * placement plus the shard topic's sync fingerprint. A joining holder
  * fetches the first REACHABLE co-holder's manifest in rank order and
  * certifies convergence when (a) its local topic exists (`verify.rs:211-218`
  * — two genesis-less holders share the non-zero empty fingerprint and must
  * never match), (b) topic digests are equal, and (c) the order-independent
  * manifest-entry digests are equal (`manifests_converged`, `verify.rs:249-255`).
  * A sole holder is trivially consistent once its genesis exists
  * (`verify.rs:157-185`); a persisted marker short-circuits to
  * already-verified (`verify.rs:108-109`). The bounded anti-entropy retry
  * loop between compares is sync transport (out of scope per BASELINE);
  * the verdict computed here is the per-pass decision it iterates.
  *
  * Entry digest (`mod.rs:49-73`): each entry is canonically encoded as
  * u32be(len(target_key)) ++ target_key ++ u64be(generation) ++
  * event_id(16) ++ actor(32) ++ u64be(updated_at_ms); encodings are sorted
  * lexicographically (order independence) and BLAKE3 is folded over
  * u64be(count) then u64be(len) ++ bytes per entry.
  *
  * Scale: the only wide shuffle is the per-(holder, placement) entry
  * aggregation — one hash shuffle keyed exactly like the manifest keyspace
  * prefix scan it models; per-group state is a shard's manifest, which the
  * reference also materializes in memory (`mod.rs:75-118`). The holder /
  * topic / marker relations are config-plane-sized and broadcast.
  */
object ShardVerify {

  private def be64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()

  /** Unsigned lexicographic byte order — Rust's `Vec<u8>` `Ord`. */
  private def lexLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** `mod.rs:62-73` canonical_entry_bytes. */
  def canonicalEntryBytes(targetKey: Array[Byte], generation: Long,
      eventId: Array[Byte], actor: Array[Byte], updatedAtMs: Long)
      : Array[Byte] = {
    require(eventId.length == 16, s"event_id must be 16 bytes, got ${eventId.length}")
    require(actor.length == 32, s"actor must be 32 bytes, got ${actor.length}")
    val buf = ByteBuffer.allocate(4 + targetKey.length + 8 + 16 + 32 + 8)
    buf.putInt(targetKey.length)
    buf.put(targetKey)
    buf.putLong(generation)
    buf.put(eventId)
    buf.put(actor)
    buf.putLong(updatedAtMs)
    buf.array()
  }

  /** `mod.rs:49-60` manifest_entry_digest over pre-encoded entries. */
  def entrySetDigest(encoded: Seq[Array[Byte]]): Array[Byte] = {
    val sorted = encoded.sortWith(lexLt)
    val out = new ByteArrayOutputStream()
    out.write(be64(sorted.length.toLong))
    sorted.foreach { e =>
      out.write(be64(e.length.toLong))
      out.write(e)
    }
    Blake3.hash(out.toByteArray)
  }

  private val digestUdf = udf((entries: Seq[Row]) => {
    val encoded = entries.map { r =>
      canonicalEntryBytes(
        r.getAs[Array[Byte]](0), r.getLong(1),
        r.getAs[Array[Byte]](2), r.getAs[Array[Byte]](3), r.getLong(4))
    }
    Blake3.toHex(entrySetDigest(encoded))
  })

  /** Digest of the empty manifest — a holder with no entries still has one. */
  def emptyDigestHex: String = Blake3.toHex(entrySetDigest(Nil))

  /** Per-(holder, placement) manifest fold:
    * `entries(node_id, strategy_id, shard, target_key binary, generation
    * long, event_id binary16, actor binary32, updated_at_ms long)` →
    * `(node_id, strategy_id, shard, n_entries, entry_digest)`. */
  def entryDigests(entries: DataFrame): DataFrame =
    entries
      .groupBy("node_id", "strategy_id", "shard")
      .agg(
        count(lit(1)).as("n_entries"),
        digestUdf(collect_list(struct(
          col("target_key"), col("generation"), col("event_id"),
          col("actor"), col("updated_at_ms")))).as("entry_digest"))

  /** The verify_held_shards verdict per (holder, placement).
    *
    *  - `holders(strategy_id, shard, rank, node_id)` — resolved holder sets
    *    in rank order (`resolve_shard_holders` keeps rank, `verify.rs:88-96`).
    *  - `entries` — see [[entryDigests]].
    *  - `topics(node_id, strategy_id, shard, topic_exists, topic_digest)` —
    *    the shard topic's local existence + sync fingerprint per holder.
    *  - `markers(node_id, strategy_id, shard)` — persisted verification rows.
    *  - `reachable(node_id, is_reachable)` — manifest-fetch reachability.
    *
    * Returns `(strategy_id, shard, node_id, verdict, against, n_co,
    * n_entries)`; `verdict` ∈ {already_verified, newly_verified, unverified};
    * `against` mirrors ShardVerificationRecord.verified_against — set only
    * for a co-holder-certified verify, NULL for sole-holder (`verify.rs:178`).
    */
  def verify(holders: DataFrame, entries: DataFrame, topics: DataFrame,
      markers: DataFrame, reachable: DataFrame): DataFrame = {
    val pk = Seq("strategy_id", "shard")
    val dig = entryDigests(entries)
    val state = holders
      .join(broadcast(topics), pk :+ "node_id", "left_outer")
      .join(dig, pk :+ "node_id", "left_outer")
      .na.fill(Map("n_entries" -> 0L))
      .withColumn("entry_digest",
        coalesce(col("entry_digest"), lit(emptyDigestHex)))
      .withColumn("topic_exists",
        coalesce(col("topic_exists"), lit(false)))

    // First reachable co-holder in rank order; a fetch failure moves to the
    // next co-holder, a digest mismatch does NOT (verify.rs:187-245) — so
    // exactly one candidate is compared.
    val self = state.select(
      col("strategy_id"), col("shard"), col("node_id"),
      col("topic_exists"), col("entry_digest"), col("topic_digest"),
      col("n_entries"))
    val co = state.select(
      col("strategy_id"), col("shard"),
      col("node_id").as("co_node"), col("rank").as("co_rank"),
      col("entry_digest").as("co_entry_digest"),
      col("topic_digest").as("co_topic_digest"))
      .join(broadcast(reachable.select(
        col("node_id").as("co_node"), col("is_reachable"))),
        Seq("co_node"), "left_outer")
    val pairs = self.join(co, pk)
      .filter(col("co_node") =!= col("node_id"))
    val wFirst = Window.partitionBy("strategy_id", "shard", "node_id")
      .orderBy(col("co_rank"))
    val coAgg = pairs
      .filter(coalesce(col("is_reachable"), lit(false)))
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .select(col("strategy_id"), col("shard"), col("node_id"),
        col("co_node"), col("co_entry_digest"), col("co_topic_digest"))
    // n_co counts ALL co-holders (reachable or not) so the sole-holder
    // arm is exact even when every peer is down.
    val nCo = pairs.groupBy("strategy_id", "shard", "node_id")
      .agg(count(lit(1)).as("n_co_all"))

    val marked = markers.select(col("strategy_id"), col("shard"),
      col("node_id"), lit(true).as("has_marker"))

    self
      .join(broadcast(marked), pk :+ "node_id", "left_outer")
      .join(nCo, pk :+ "node_id", "left_outer")
      .join(coAgg, pk :+ "node_id", "left_outer")
      .na.fill(Map("n_co_all" -> 0L))
      .withColumn("converged",
        col("topic_exists") &&
          col("topic_digest") === col("co_topic_digest") &&
          col("entry_digest") === col("co_entry_digest"))
      .select(
        col("strategy_id"), col("shard"), col("node_id"),
        when(coalesce(col("has_marker"), lit(false)), "already_verified")
          .when(col("n_co_all") === 0 && col("topic_exists"),
            "newly_verified")
          .when(col("n_co_all") === 0, "unverified")
          .when(col("co_node").isNull, "unverified") // none reachable
          .when(col("converged"), "newly_verified")
          .otherwise("unverified").as("verdict"),
        when(!coalesce(col("has_marker"), lit(false)) &&
            col("n_co_all") > 0 && col("converged"), col("co_node"))
          .as("against"),
        col("n_co_all").as("n_co"),
        col("n_entries"))
  }
}
