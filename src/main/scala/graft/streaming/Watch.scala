package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Watch subscriptions (reference `core/src/structs/notification_watch.rs`):
  * per-user glob-pattern scopes × event-kind bitmask; deliveries are the
  * stream joined against the (small, broadcast) interest table.
  *
  * Kinds and mask per `notification_watch.rs:110-123`.
  */
object Watch {

  val KindBits: Map[String, Int] = Map(
    "METADATA_CREATED" -> 1,
    "DATA_UPLOADED" -> 2,
    "SYNC_COMPLETED" -> 4,
    "SYNC_FAILED" -> 8)

  /** driver-table event_type → reference kind. */
  val TypeToKind: Map[String, String] = Map(
    "signup" -> "METADATA_CREATED",
    "click" -> "DATA_UPLOADED",
    "view" -> "SYNC_COMPLETED",
    "purchase" -> "DATA_UPLOADED",
    "error" -> "SYNC_FAILED")

  def kindBitCol(eventType: Column): Column =
    TypeToKind.foldLeft(lit(0)) { case (acc, (t, k)) =>
      when(eventType === t, lit(KindBits(k))).otherwise(acc)
    }

  /** Glob → anchored regex: `**` crosses path segments, `*`/`?` do not.
    * (globset-compatible for the subset the reference's scopes use.) */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' =>
          sb.append(".*"); i += 2
        case '*' => sb.append("[^/]*"); i += 1
        case '?' => sb.append("[^/]"); i += 1
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append("\\").append(c); i += 1
        case c => sb.append(c); i += 1
      }
    }
    sb.append("$").toString
  }

  // per-executor compiled-pattern cache: the watch table is small and
  // static, but the UDF runs once per (event x watch) pair on the hot path
  @transient private lazy val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** Cached compile of a glob (shared with [[graft.catalog.Authz]], whose
    * rule patterns are equally small-and-static per broadcast). */
  def patternFor(glob: String): java.util.regex.Pattern =
    patternCache.computeIfAbsent(glob,
      g => java.util.regex.Pattern.compile(globToRegex(g)))

  val globMatch: UserDefinedFunction =
    udf { (path: String, glob: String) =>
      path != null && glob != null &&
        patternFor(glob).matcher(path).matches()
    }

  /** Deliveries: events × broadcast(watches) where the watch's kind mask has
    * the event's bit set and the scope glob matches the event path. The
    * bitmask test leads the conjunction so it short-circuits pairs before
    * the (much costlier) glob-regex UDF runs. Works on both batch and
    * streaming event frames (stream-static join). */
  def deliveries(events: DataFrame, watches: DataFrame): DataFrame =
    events
      .withColumn("__bit", kindBitCol(col("event_type")))
      .crossJoin(broadcast(watches))
      .filter(col("kind_mask").bitwiseAND(col("__bit")) =!= 0 &&
        globMatch(col("path"), col("scope_glob")))
      .drop("__bit")
}
