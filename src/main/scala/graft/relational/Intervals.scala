package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval algebra. The workhorse is overlap MERGE (interval
  * union): collapse overlapping/touching [start, end) intervals within each
  * key into disjoint islands — the primitive under span-corruption planning
  * (masked-span unions), duplicated-span coverage, retention windows and
  * range-tombstone compaction.
  *
  * Classic gaps-and-islands: order intervals by start within the key, an
  * interval opens a NEW island iff its start exceeds the running maximum
  * end of every earlier interval; island ids are the running sum of those
  * flags. One shuffle on the key; windows are bounded by a key's interval
  * count.
  */
object Intervals {

  /** Merge overlapping/touching [start, end) intervals per key.
    *
    * `df(key, start, end)` (long columns; end exclusive; touching =
    * `start == prior end` merges). Returns `(key, start, end, n_src)` —
    * one row per island with the source-interval count. */
  def merge(df: DataFrame): DataFrame = {
    val byStart = Window.partitionBy("key").orderBy(col("start"), col("end"))
    val before = byStart.rowsBetween(Window.unboundedPreceding, -1)
    df
      .withColumn("max_end_before", max("end").over(before))
      .withColumn("new_island",
        (col("max_end_before").isNull ||
          col("start") > col("max_end_before")).cast("int"))
      .withColumn("island", sum("new_island").over(byStart))
      .groupBy(col("key"), col("island"))
      .agg(min("start").as("start"), max("end").as("end"),
        count(lit(1)).as("n_src"))
      .drop("island")
  }
}
