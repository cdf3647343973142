package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join — the production answer to a shuffle join whose
  * key distribution has heavy hitters (one reducer receives a hot key's
  * entire row set and stalls the stage while the other 999 executors idle).
  *
  * Hybrid hot/cold plan:
  *   - the caller supplies the hot-key relation (from an exact map-side
  *     count at test scale; from the cm1 Count-Min or am1 F2 sketch at
  *     100 TB — same single-column shape either way);
  *   - hot fact rows gain a deterministic salt in [0, salts) and hot dim
  *     rows replicate once per salt value, so the join key becomes
  *     (key, salt) and one hot key spreads over `salts` reducers;
  *   - cold rows join normally (no replication cost for the bulk);
  *   - hot and cold slices are disjoint by construction, so the union of
  *     the two joins EQUALS the plain join row-for-row.
  *
  * Both joins are hinted sort-merge: salting only matters when neither side
  * broadcasts, and the hint keeps the demonstration honest at test scale
  * (Spark's AQE skew splitting is the runtime complement; this is the
  * planning-time form that also works under AQE-off and for first-stage
  * shuffles AQE cannot re-plan).
  */
object SkewJoin {

  /** `fact ⋈ dim` on `factKey = dimKey`, salted for the keys in `hotKeys`
    * (single column `hk`). `saltOf` must be deterministic per fact row
    * (e.g. a line number or md5-derived value — NOT rand(), which breaks
    * retry/replay determinism). Output columns: fact's then dim's. */
  def hybrid(fact: DataFrame, factKey: String, saltOf: Column,
      dim: DataFrame, dimKey: String, hotKeys: DataFrame,
      salts: Int): DataFrame = {
    val outCols = (fact.columns ++ dim.columns).map(col).toSeq
    val factT = fact.join(broadcast(hotKeys),
      fact(factKey) === hotKeys("hk"), "left")
    val dimT = dim.join(broadcast(hotKeys),
      dim(dimKey) === hotKeys("hk"), "left")
    val fh = factT.filter(col("hk").isNotNull)
      .withColumn("salt", pmod(saltOf, lit(salts)).cast("int"))
    val dh = dimT.filter(col("hk").isNotNull)
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    val hotJoin = fh.join(dh.hint("merge"),
      fh(factKey) === dh(dimKey) && fh("salt") === dh("salt"))
    val coldJoin = factT.filter(col("hk").isNull)
      .join(dimT.filter(col("hk").isNull).hint("merge"),
        col(factKey) === col(dimKey))
    hotJoin.select(outCols: _*).unionByName(coldJoin.select(outCols: _*))
  }

  /** Hot keys by exact count: fact keys with ≥ `minRows` rows. One
    * aggregation with map-side partial counts; the result is heavy-hitter
    * sized, so the tag joins broadcast. */
  def hotKeysByCount(fact: DataFrame, factKey: String,
      minRows: Long): DataFrame =
    fact.groupBy(col(factKey)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minRows).select(col(factKey).as("hk"))
}
