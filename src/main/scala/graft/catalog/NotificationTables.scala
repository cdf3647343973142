package graft.catalog

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Notification-inbox fixture (reference `NotificationRecord`,
  * `core/src/structs/notification.rs:116-124`) with an exact DuckDB CTE
  * twin. Every column derives from the lineitem/customer key value, so
  * duplicate synthetic source rows collapse with DISTINCT:
  *
  *  - five big inboxes `u0..u4` (~12k rows each at sf0.01) whose
  *    timestamps collide in 5000 classes (the id tie-break matters) and
  *    whose unread rates ramp 3→15% — the slow ones trip the 2000-row
  *    examine cap, the fast ones the 100-count badge cap;
  *  - three small inboxes `c0..c2` (~500 rows, ~5% unread) that scan
  *    fully and report exact counts.
  */
object NotificationTables {

  def inbox(spark: SparkSession, dir: String): DataFrame = {
    // explicit-width repartition BELOW the distinct: the aggregate's
    // hash(ord) requirement is satisfied by it (one exchange total), and —
    // unlike the AQE-coalesced exchange it replaces, which shrank this
    // CPU-dense 2.4 MB stream to ~3 tasks — the heavy per-row derivation
    // downstream keeps cluster width (r13 optimization, guide §2.4).
    val l = Tables.lineitem(spark, dir)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("ord"))
      .repartition(spark.sparkContext.defaultParallelism, col("ord"))
      .distinct()
    val big = l.select(
      concat(lit("u"), (col("ord") % 5).cast("string")).as("recipient"),
      (lit(1700000000000L) + (col("ord") % 5000) * 1000).as("created_at_ms"),
      lpad(col("ord").cast("string"), 12, "0").as("notification_id"),
      when(col("ord") % 100 < (col("ord") % 5 + 1) * 3,
        lit(null).cast("long"))
        .otherwise(lit(1700000000000L) + (col("ord") % 5000) * 1000 + 60000)
        .as("read_at_ms"))
    val small = Tables.customer(spark, dir).select(
      concat(lit("c"), (col("c_custkey") % 3).cast("string")).as("recipient"),
      (lit(1700000000000L) + col("c_custkey") * 1000).as("created_at_ms"),
      lpad(col("c_custkey").cast("string"), 12, "0").as("notification_id"),
      when(col("c_custkey") % 20 === 0, lit(null).cast("long"))
        .otherwise(lit(1700000000000L) + col("c_custkey") * 1000 + 60000)
        .as("read_at_ms"))
    big.unionByName(small)
  }

  val inboxCte: String =
    """inbox AS (
      |  SELECT 'u'||(ord%5) AS recipient,
      |         1700000000000 + (ord%5000)*1000 AS created_at_ms,
      |         lpad(CAST(ord AS VARCHAR), 12, '0') AS notification_id,
      |         CASE WHEN ord%100 < (ord%5 + 1)*3 THEN NULL
      |              ELSE 1700000000000 + (ord%5000)*1000 + 60000 END AS read_at_ms
      |  FROM (SELECT DISTINCT l_orderkey*10 + l_linenumber AS ord FROM lineitem)
      |  UNION ALL
      |  SELECT 'c'||(c_custkey%3),
      |         1700000000000 + c_custkey*1000,
      |         lpad(CAST(c_custkey AS VARCHAR), 12, '0'),
      |         CASE WHEN c_custkey%20 = 0 THEN NULL
      |              ELSE 1700000000000 + c_custkey*1000 + 60000 END
      |  FROM customer
      |)""".stripMargin
}
