package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S3 listing operators (reference `operations/src/s3/`):
  *
  *  - ListObjectsV2 (`list_objects_v2.rs`): prefix scan over current heads,
  *    delimiter grouping via `common_prefix_of` (`listing.rs:4-14`), objects
  *    + CommonPrefixes merged in key order, `max_keys` page (default 1000),
  *    `start_after`/continuation cursor = last emitted name.
  *  - ListObjectVersions: full-prefix scan, ordered (key asc, version desc),
  *    `is_latest` flag, delete markers included as their own kind.
  *  - bucket search (`search_buckets.rs:88,144`): case-insensitive substring,
  *    `ws-` workspaces excluded.
  *
  * Scale: listing is a prefix-bounded scan (predicate pushdown on a sorted
  * key column at 100 TB — the parquet min/max stats make this the reference's
  * LSM range scan), one bounded window for heads, and a TakeOrdered(max_keys).
  */
object Listing {

  val DefaultMaxKeys = 1000 // list_objects_v2.rs:128

  /** `common_prefix_of(key, prefix, delimiter)` (listing.rs:4-14): the key's
    * group prefix up to and including the first delimiter after `prefix`,
    * or NULL when the key has no further delimiter (a leaf object). */
  def commonPrefixOf(key: Column, prefix: String, delimiter: String): Column = {
    val rest = substring(key, prefix.length + 1, Int.MaxValue)
    val pos = instr(rest, delimiter)
    when(pos > 0, concat(lit(prefix), rest.substr(lit(1), pos + lit(delimiter.length - 1))))
      .otherwise(lit(null))
  }

  /** One ListObjectsV2 page: rows (kind ∈ Object|CommonPrefix, name, size). */
  def listObjectsV2(objects: DataFrame, bucket: String, prefix: String,
      delimiter: Option[String], startAfter: Option[String],
      maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val h = ObjectTables.heads(objects)
      .filter(col("bucket") === bucket && col("key").startsWith(prefix))
    delimiter match {
      case Some(d) =>
        // continuation resumes after the last *emitted* name — a common
        // prefix cursor must skip every key under it (list_objects_v2.rs:60-74)
        var withCp = h.withColumn("cp", commonPrefixOf(col("key"), prefix, d))
        startAfter.foreach(c => withCp = withCp.filter(coalesce(col("cp"), col("key")) > c))
        val prefixes = withCp.filter(col("cp").isNotNull)
          .select(lit("CommonPrefix").as("kind"), col("cp").as("name"),
            lit(null).cast("long").as("size"))
          .distinct()
        val entries = withCp.filter(col("cp").isNull)
          .select(lit("Object").as("kind"), col("key").as("name"), col("size"))
        prefixes.union(entries).orderBy(col("name")).limit(maxKeys)
      case None =>
        var hh = h
        startAfter.foreach(c => hh = hh.filter(col("key") > c))
        hh.select(lit("Object").as("kind"), col("key").as("name"), col("size"))
          .orderBy(col("name")).limit(maxKeys)
    }
  }

  /** ListObjectVersions: every version in (key asc, version desc) order with
    * `is_latest` and delete-marker kinds; `key_marker` resume. */
  def listVersions(objects: DataFrame, bucket: String, prefix: String,
      keyMarker: Option[String] = None, maxKeys: Int = DefaultMaxKeys): DataFrame = {
    val w = Window.partitionBy(col("bucket"), col("key"))
      .orderBy(col("version_ord").desc, col("hash").desc)
    var v = objects
      .filter(col("bucket") === bucket && col("key").startsWith(prefix))
    keyMarker.foreach(m => v = v.filter(col("key") > m))
    v.withColumn("is_latest", row_number().over(w) === 1)
      .select(
        when(col("is_delete_marker"), "DeleteMarker").otherwise("Version").as("kind"),
        col("key"), col("version_ulid"), col("is_latest"), col("size"))
      .orderBy(col("key"), col("version_ulid").desc, col("size"))
      .limit(maxKeys)
  }

  /** Case-insensitive bucket substring search, excluding `ws-` workspaces. */
  def searchBuckets(buckets: DataFrame, q: String): DataFrame =
    buckets
      .filter(lower(col("bucket")).contains(q.toLowerCase) &&
        !col("bucket").startsWith("ws-"))
      .orderBy(col("bucket"))

  /** Unified-search limits (reference `api/src/routes/search.rs:27-29`). */
  val UnifiedSearchDefaultLimit = 10
  val UnifiedSearchMaxLimit = 100
  val UnifiedSearchBucketLimit = 50

  /** Minimum query length for user/group name search (the reference's
    * `MIN_SEARCH_QUERY_CHARS` guard, `api/src/routes/users.rs`). */
  val MinSearchQueryChars = 2

  /** Case-insensitive substring search over a name column with the
    * min-chars guard and limit clamp — the user/group search shape
    * (`operations/src/search_users.rs` / `search_groups.rs`). */
  def searchNames(df: DataFrame, nameCol: String, q: String,
      limit: Int = UnifiedSearchDefaultLimit): DataFrame = {
    if (q == null || q.trim.length < MinSearchQueryChars)
      df.limit(0)
    else
      df.filter(lower(col(nameCol)).contains(q.trim.toLowerCase))
        .orderBy(col(nameCol))
        .limit(math.min(math.max(limit, 1), UnifiedSearchMaxLimit))
  }
}
