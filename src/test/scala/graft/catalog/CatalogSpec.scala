package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val objects = Seq(
    // bucket, key, version_ord, version_ulid, is_delete_marker, hash, size
    ("b1", "a/x/1.bin", 10L, "010", false, "h1", 100L),
    ("b1", "a/x/1.bin", 20L, "020", false, "h2", 200L), // newer version
    ("b1", "a/y/2.bin", 30L, "030", false, "h1", 100L),
    ("b1", "a/z.bin", 40L, "040", false, "h3", 300L), // leaf under a/
    ("b1", "a/del.bin", 50L, "050", false, "h1", 100L),
    ("b1", "a/del.bin", 60L, "060", true, "h1", 100L), // delete marker head
    ("b2", "a/x/1.bin", 70L, "070", false, "h1", 100L) // other bucket
  ).toDF("bucket", "key", "version_ord", "version_ulid", "is_delete_marker", "hash", "size")
    .withColumn("created_at_ms", col("version_ord"))

  test("common_prefix_of groups by first delimiter after prefix (listing.rs:4-14)") {
    val df = Seq("a/x/1.bin", "a/z.bin", "a/x/y/deep.bin").toDF("key")
      .select(col("key"), Listing.commonPrefixOf(col("key"), "a/", "/").as("cp"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a/x/1.bin") == "a/x/")
    assert(m("a/x/y/deep.bin") == "a/x/") // only first delimiter level
    assert(m("a/z.bin") == null) // leaf
  }

  test("ListObjectsV2: delimiter grouping, delete-marker head hides key, newest version size") {
    val rows = Listing.listObjectsV2(objects, "b1", "a/", Some("/"), None)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // del.bin's head is a delete marker → hidden; x/ and y/ grouped; z.bin leaf
    assert(rows == Seq(("CommonPrefix", "a/x/"), ("CommonPrefix", "a/y/"), ("Object", "a/z.bin")))
    val leaf = Listing.listObjectsV2(objects, "b1", "a/x/", Some("/"), None).collect()
    assert(leaf.length == 1 && leaf(0).getString(1) == "a/x/1.bin" && leaf(0).getLong(2) == 200L)
  }

  test("ListObjectsV2: start_after cursor and max_keys page") {
    val page = Listing.listObjectsV2(objects, "b1", "a/", Some("/"),
      Some("a/x/"), maxKeys = 1).collect()
    assert(page.length == 1 && page(0).getString(1) == "a/y/")
  }

  test("ListObjectVersions: is_latest flag, delete markers as own kind") {
    val v = Listing.listVersions(objects, "b1", "a/del")
      .select("kind", "version_ulid", "is_latest").collect().map(_.toSeq).toSeq
    assert(v == Seq(Seq("DeleteMarker", "060", true), Seq("Version", "050", false)))
  }

  test("bucket search: case-insensitive, ws- excluded (search_buckets.rs:88,144)") {
    val b = Seq("Prod-Data", "ws-scratch", "archive").toDF("bucket")
    assert(Listing.searchBuckets(b, "A").collect().map(_.getString(0)).toSeq
      == Seq("Prod-Data", "archive"))
  }

  test("user/group name search: min-chars guard, clamp, substring") {
    val users = Seq("Ada Lovelace", "Alan Turing", "Grace Hopper").toDF("name")
    // below min chars → empty, never a full scan result
    assert(Listing.searchNames(users, "name", "a").count() == 0)
    assert(Listing.searchNames(users, "name", " ").count() == 0)
    assert(Listing.searchNames(users, "name", "al").collect().map(_.getString(0)).toSeq
      == Seq("Alan Turing")) // case-insensitive substring
    assert(Listing.searchNames(users, "name", "ace", limit = 1).count() == 1) // clamp
  }

  test("usage delta apply == direct rebuild (UsageCounterUpdate::step)") {
    val base = Seq(("g1", 2L, 300L)).toDF("group_id", "stored_blobs", "stored_bytes")
    val deltas = Seq(("g1", 1L, 100L), ("g1", 1L, 50L), ("g2", 1L, 10L))
      .toDF("group_id", "d_blobs", "d_bytes")
    val merged = UsageStats.applyDeltas(base, deltas)
      .orderBy("group_id").collect().map(_.toSeq).toSeq
    assert(merged == Seq(Seq("g1", 4L, 450L), Seq("g2", 1L, 10L)))
  }
}
