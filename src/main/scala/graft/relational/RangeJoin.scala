package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval-containment) join via bin bucketing.
  *
  * `point IN [lo, hi]` joins have no equi-key, so Spark's only native plan
  * is a broadcast-nested-loop or cartesian filter — O(|points|·|ranges|)
  * comparisons, a non-starter when both sides are large. The classic scale
  * rewrite (used by every geospatial/genomics engine, e.g. the bin index of
  * ADAM/Hail and DuckDB's IEJoin literature) buckets the domain into
  * fixed-width bins: each range replicates into the ceil((hi-lo)/W) bins it
  * overlaps, each point lands in exactly one bin, and the join becomes an
  * EQUI-join on the bin id followed by the exact between-filter. Work is
  * O(|points| + Σ range-spans/W) with a plain shuffle-or-broadcast hash
  * join — no quadratic fallback, AQE-skew-splittable, and the bin key is
  * co-partitionable at 100 TB.
  *
  * `binWidth` trades replication (wide ranges → more bins) against bucket
  * selectivity (narrow bins → fewer false candidates); set it near the
  * median range span so replication stays O(1) per range.
  */
object RangeJoin {

  /** Equi-bin containment join: rows of `points` paired with every row of
    * `ranges` whose `[lo, hi]` contains `point`. Bin width is `2^binBits`
    * and bin ids come from an unsigned right shift — exact integer
    * arithmetic at any key magnitude (a float-division bin id would drift
    * past 2^53), and the power-of-two contract is the norm for bin indexes.
    * Columns must be integral and nonnegative. Output = points ⋈ ranges
    * with both sides' columns. */
  def binned(points: DataFrame, point: Column, ranges: DataFrame,
      lo: Column, hi: Column, binBits: Int): DataFrame = {
    require(binBits >= 1 && binBits <= 62, s"binBits must be in [1,62], got $binBits")
    val p = points.withColumn("__bin",
      shiftrightunsigned(point.cast("long"), binBits))
    val r = ranges.withColumn("__bin",
      explode(sequence(shiftrightunsigned(lo.cast("long"), binBits),
        shiftrightunsigned(hi.cast("long"), binBits))))
    p.join(r, Seq("__bin"))
      .filter(point >= lo && point <= hi)
      .drop("__bin")
  }
}
