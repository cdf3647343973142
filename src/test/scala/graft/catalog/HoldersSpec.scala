package graft.catalog

import graft.SparkSpec

class HoldersSpec extends SparkSpec {
  import spark.implicits._

  test("blob holders: per-hash publish dedup, realm filter, self exclusion, " +
    "TTL, byte-sorted dedup (blob_holders.rs:143-153,251-262)") {
    // h1 has two backend copies -> ONE publish row; h2 one copy
    val locations = Seq("h1", "h1", "h2").toDF("blake3")
    val now = 1000L
    val dht = Seq(
      ("h1", "n3", "realm-0", 2000L),
      ("h1", "n1", "realm-0", 2000L),
      ("h1", "n1", "realm-0", 2000L), // duplicate entry dedups
      ("h1", "self", "realm-0", 2000L), // excluded
      ("h1", "n2", "realm-1", 2000L), // foreign realm
      ("h1", "n4", "realm-0", 999L), // expired
      ("h2", "n9", "realm-1", 2000L) // only foreign -> empty holder set
    ).toDF("blake3", "node_id", "realm", "expires_at_ms")
    val out = Holders.blobHolders(locations, dht, "realm-0", "self", now)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(out == Seq(("h1", 2L, "n1,n3", 2L), ("h2", 1L, "", 0L)))
  }

  test("GetObjectAttributes: missing location FAILS (not skip), Reference " +
    "cached metadata, FullObject default, include_parts fold " +
    "(get_object_attributes.rs:350-379)") {
    import org.apache.spark.sql.functions._
    val versions = Seq(
      // materialized head with location (ord%7 != 3, != 0)
      ("b", "k1", 22L, "022", false, "h1", 10L),
      // materialized, missing location -> failed
      ("b", "k2", 29L, "029", false, "hmiss", 10L),
      // reference (ord%7==3): ok despite missing location, cached meta
      ("b", "k3", 31L, "031", false, "hmiss", 10L),
      // multipart version (summary joined explicitly below)
      ("b", "k4", 14L, "014", false, "h1", 20000L)
    ).toDF("bucket", "key", "version_ord", "version_ulid", "is_delete_marker",
      "hash", "size").withColumn("created_at_ms", col("version_ord"))
    val loc = Seq(("h1", "fs")).toDF("blake3", "backend")
    val summ = Seq(("014", "Composite")).toDF("version_ulid", "checksum_type")
    val parts = Seq(("014", 1, 8192L), ("014", 2, 8192L), ("014", 3, 3616L))
      .toDF("version_ulid", "part_number", "part_size")
    // reference-state check: 31 % 7 == 3
    val reqs = Seq(
      ("r1", "b", "k1", null, true),
      ("r2", "b", "k2", null, true),
      ("r3", "b", "k3", null, true),
      ("r4", "b", "k4", "014", true),
      ("r5", "b", "k4", "014", false)
    ).toDF("req_id", "bucket", "key", "version_id", "include_parts")
    val m = ObjectOps.getObjectAttributes(versions, loc, summ, parts, reqs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("r1").getString(1) == "ok" &&
      m("r1").getString(3) == "fs" && // backend
      m("r1").getString(6) == "FullObject" && // checksum default
      m("r1").isNullAt(7)) // no summary -> no parts even with include_parts
    assert(m("r2").getString(1) == "failed")
    assert(m("r3").getString(1) == "ok" && m("r3").getBoolean(4) &&
      m("r3").isNullAt(3)) // cached_meta, no backend
    assert(m("r4").getString(1) == "ok" &&
      m("r4").getString(6) == "Composite" &&
      m("r4").getLong(7) == 3L && m("r4").getLong(8) == 20000L)
    assert(m("r5").isNullAt(7)) // include_parts=false
  }
}
