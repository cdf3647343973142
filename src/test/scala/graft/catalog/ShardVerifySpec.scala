package graft.catalog

import graft.SparkSpec

/** Shard-manifest digest + verification ladder (reference
  * `operations/src/shard/mod.rs:49-73` manifest_entry_digest — its own test
  * `manifest_entry_digest_is_order_independent_and_revision_sensitive` at
  * `mod.rs:275-304` — and `operations/src/shard/verify.rs` arms). */
class ShardVerifySpec extends SparkSpec {
  import spark.implicits._

  private def enc(doc: Int, gen: Long) =
    ShardVerify.canonicalEntryBytes(
      s"doc-$doc".getBytes("UTF-8"), gen,
      Array.fill[Byte](16)(doc.toByte), Array.fill[Byte](32)(1.toByte),
      gen)

  test("entry digest is order-independent and revision-sensitive") {
    val a = enc(1, 1)
    val b = enc(4, 1)
    val changed = enc(4, 2)
    assert(ShardVerify.entrySetDigest(Seq(a, b))
      .sameElements(ShardVerify.entrySetDigest(Seq(b, a))))
    assert(!ShardVerify.entrySetDigest(Seq(a, b))
      .sameElements(ShardVerify.entrySetDigest(Seq(a, changed))))
    // count is folded in: {a} and {a, a} differ even though the sorted
    // concatenation of one entry is a prefix of the other's
    assert(!ShardVerify.entrySetDigest(Seq(a))
      .sameElements(ShardVerify.entrySetDigest(Seq(a, a))))
  }

  test("exported digest is the hex of the canonical fold, not a rehash " +
    "(shard/mod.rs:49-60: manifest_entry_digest IS the final BLAKE3)") {
    assert(ShardVerify.emptyDigestHex ==
      graft.functions.Blake3.toHex(ShardVerify.entrySetDigest(Nil)))
    // the empty fold is blake3(u64be(0)) — pin it against a direct hash
    assert(ShardVerify.emptyDigestHex ==
      graft.functions.Blake3.hex(Array.fill[Byte](8)(0)))
    assert(ShardVerify.emptyDigestHex.length == 64)
  }

  test("canonical encoding rejects malformed id widths") {
    intercept[IllegalArgumentException] {
      ShardVerify.canonicalEntryBytes(Array[Byte](1), 1L,
        Array.fill[Byte](8)(0), Array.fill[Byte](32)(0), 1L)
    }
    intercept[IllegalArgumentException] {
      ShardVerify.canonicalEntryBytes(Array[Byte](1), 1L,
        Array.fill[Byte](16)(0), Array.fill[Byte](16)(0), 1L)
    }
  }

  test("verdict ladder: marker, sole-holder genesis gate, convergence") {
    // placement p0: sole holder n0 with genesis -> newly_verified (no
    // against); p1: sole holder n1 without genesis -> unverified; p2:
    // n0 marked -> already_verified, n2 converges against n0; p3: entry
    // divergence -> both unverified; p4: co-holder unreachable ->
    // unverified despite equal manifests.
    val holders = Seq(
      ("s", 0L, 1, "n0"),
      ("s", 1L, 1, "n1"),
      ("s", 2L, 1, "n0"), ("s", 2L, 2, "n2"),
      ("s", 3L, 1, "n0"), ("s", 3L, 2, "n2"),
      ("s", 4L, 1, "n0"), ("s", 4L, 2, "n3"))
      .toDF("strategy_id", "shard", "rank", "node_id")
    val entries = Seq(
      ("n0", 0L, 10, 1L), ("n1", 1L, 11, 1L),
      ("n0", 2L, 12, 1L), ("n2", 2L, 12, 1L),
      ("n0", 3L, 13, 1L), ("n2", 3L, 13, 2L), // diverged generation
      ("n0", 4L, 14, 1L), ("n3", 4L, 14, 1L))
      .toDF("node_id", "shard", "doc", "generation")
      .selectExpr("node_id", "'s' AS strategy_id", "shard",
        "CAST(concat('doc-', doc) AS BINARY) AS target_key", "generation",
        "unhex(md5(concat('ev', doc))) AS event_id",
        "unhex(sha2(concat('ac', doc), 256)) AS actor",
        "CAST(1000 + doc AS BIGINT) AS updated_at_ms")
    val topics = holders.selectExpr("node_id", "strategy_id", "shard",
      "NOT (node_id = 'n1') AS topic_exists",
      "concat('td', shard) AS topic_digest")
    val markers = Seq(("s", 2L, "n0"))
      .toDF("strategy_id", "shard", "node_id")
    val reachable = Seq(("n0", true), ("n1", true), ("n2", true),
      ("n3", false)).toDF("node_id", "is_reachable")

    val out = ShardVerify
      .verify(holders, entries, topics, markers, reachable)
      .collect()
      .map(r => (r.getLong(1), r.getString(2)) ->
        ((r.getString(3), Option(r.getString(4)).getOrElse("-"))))
      .toMap

    assert(out((0L, "n0")) == (("newly_verified", "-")))
    assert(out((1L, "n1")) == (("unverified", "-")))
    assert(out((2L, "n0")) == (("already_verified", "-")))
    assert(out((2L, "n2")) == (("newly_verified", "n0")))
    assert(out((3L, "n0")) == (("unverified", "-")))
    assert(out((3L, "n2")) == (("unverified", "-")))
    assert(out((4L, "n0")) == (("unverified", "-"))) // n3 unreachable
    assert(out((4L, "n3")) == (("newly_verified", "n0")))
  }

  test("sv1 fixture exercises every verdict arm") {
    val q = CatalogQueries.queries("sv1_shard_verify")
    val rows = q(spark, "/root/testdata/sf0.001").collect()
    val verdicts = rows.map(_.getString(3)).toSet
    assert(verdicts == Set("already_verified", "newly_verified",
      "unverified"))
    // both newly_verified flavors: sole-holder (no against) + co-certified
    val nv = rows.filter(_.getString(3) == "newly_verified")
    assert(nv.exists(_.isNullAt(4)) && nv.exists(!_.isNullAt(4)))
    // the genesis gate: some unverified holder has a reachable converged-
    // looking peer but no local topic (n1 rows on shard % 6 == 1)
    assert(rows.exists(r => r.getString(2) == "n1" &&
      r.getLong(1) % 6 == 1 && r.getString(3) == "unverified"))
  }
}
