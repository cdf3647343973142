package graft.catalog

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Band-pool delegation lineage (reference `core/src/structs/placement.rs`:
  * BandPool `:256-287`, pool_is_valid `:289-331`, ancestor_ids `:334-348`,
  * band_owner `:350-374`, coordinator_spans `:376-397`, owned_pools
  * `:399-406`, admit_band_pool `:408-446`).
  *
  * Pools form a causal delegation tree: a root is self-issued; every child
  * is carved by its issuer from a parent it owns. A band belongs to the
  * unique valid pool that descends from EVERY other valid pool covering it
  * — incomparable coverage (siblings, forgeries, same-id divergence,
  * rival roots) fails closed and the band is unusable. Duplicate pool ids
  * (by OCCURRENCE, identical values included) invalidate the id entirely.
  *
  * Execution shape: a realm's pool set lives inside ONE RealmConfigDocument
  * (document-sized by contract — the reference folds a `Vec<BandPool>`), so
  * the per-scenario fold runs as a collect_list + fold UDF: one hash
  * shuffle keyed by scenario, the exact recursive algorithm per group,
  * scenarios processed in parallel across the cluster. The 1023-band sweep
  * per scenario is O(bands × covering pools) — bounded, branch-free work.
  */
object BandPools {

  val FirstGrantableHandle = 3L // placement.rs:238
  val HandleRangeSize = 1024L // placement.rs:243
  val HandleSpaceEnd = 1048576L // 20-bit space, placement.rs:241
  val HandleBands: Long = (HandleSpaceEnd - FirstGrantableHandle) / HandleRangeSize // 1023

  def bandStart(band: Long): Long = FirstGrantableHandle + band * HandleRangeSize

  final case class BPool(id: String, parent: Option[String], issuer: String,
      owner: String, start: Long, end: Long) {
    def wellFormed: Boolean =
      start >= FirstGrantableHandle && start < end && end <= HandleSpaceEnd
    def containsSpan(o: BPool): Boolean = start <= o.start && o.end <= end
    def coversBand(bs: Long): Boolean =
      start <= bs && bs + HandleRangeSize <= end
  }

  /** Unique-occurrence id resolution (`pool_by_id`, placement.rs:289-293):
    * identical duplicates also fail. */
  private def poolById(pools: Seq[BPool], id: String): Option[BPool] = {
    val m = pools.filter(_.id == id)
    if (m.lengthCompare(1) == 0) Some(m.head) else None
  }

  private def validWithGuard(pools: Seq[BPool], pool: BPool,
      seen: List[String]): Boolean = {
    if (!pool.wellFormed) false
    else pool.parent match {
      case None => pool.issuer == pool.owner
      case Some(pid) =>
        if (seen.contains(pid)) false
        else poolById(pools, pid) match {
          case None => false
          case Some(p) =>
            p.owner == pool.issuer && p.containsSpan(pool) &&
              validWithGuard(pools, p, pid :: seen)
        }
    }
  }

  def poolIsValid(pools: Seq[BPool], pool: BPool): Boolean =
    pools.count(_.id == pool.id) == 1 && validWithGuard(pools, pool, Nil)

  /** placement.rs:334-348 — parent chain up to the root, cycle/missing safe. */
  def ancestorIds(pools: Seq[BPool], pool: BPool): List[String] = {
    var ids = List.empty[String]
    var current = pool.parent
    var done = false
    while (!done) current match {
      case Some(id) if !ids.contains(id) =>
        ids = id :: ids
        current = poolById(pools, id).flatMap(_.parent)
        if (current.isEmpty) done = true
      case _ => done = true
    }
    ids
  }

  /** placement.rs:353-374 — the unique lineage-dominating owner of a band. */
  def bandOwner(valid: Seq[(BPool, List[String])], bs: Long): Option[String] = {
    val covering = valid.filter(_._1.coversBand(bs))
    if (covering.isEmpty) return None
    var winner: Option[String] = None
    covering.foreach { case (cand, anc) =>
      val dominates = covering.forall { case (o, _) =>
        o.id == cand.id || anc.contains(o.id)
      }
      if (dominates) {
        if (winner.isDefined) return None
        winner = Some(cand.owner)
      }
    }
    winner
  }

  /** One band sweep emitting every owner's merged spans (the per-owner
    * coordinator_spans of placement.rs:378-397, computed for all owners
    * at once). */
  def allSpans(pools: Seq[BPool]): Seq[(String, Long, Long)] = {
    val valid = pools.filter(poolIsValid(pools, _))
      .map(p => (p, ancestorIds(pools, p)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    var band = 0L
    while (band < HandleBands) {
      bandOwner(valid, bandStart(band)) match {
        case Some(owner) =>
          val start = bandStart(band)
          val end = start + HandleRangeSize
          out.lastOption match {
            case Some((o, s, e)) if o == owner && e == start =>
              out(out.length - 1) = (o, s, end)
            case _ => out += ((owner, start, end))
          }
        case None => ()
      }
      band += 1
    }
    // same-owner adjacency is merged in sweep order, which is exactly the
    // reference's per-owner span merge: a same-owner band separated by a
    // foreign or unusable band is never adjacent, so runs stay split
    out.toSeq
  }

  /** placement.rs:420-446 — inbound admission. */
  def admit(pools: Seq[BPool], pool: BPool, origin: String): String = {
    if (!pool.wellFormed || pool.issuer != origin) return "reject"
    pool.parent match {
      case None => if (pool.issuer == pool.owner) "accept" else "reject"
      case Some(pid) => poolById(pools, pid) match {
        case None => "missing_parent"
        case Some(p) =>
          if (poolIsValid(pools, p) && p.owner == pool.issuer &&
            p.containsSpan(pool)) "accept"
          else "reject"
      }
    }
  }

  private def toPool(r: Row): BPool =
    BPool(r.getString(0), Option(r.getString(1)), r.getString(2),
      r.getString(3), r.getLong(4), r.getLong(5))

  private val poolStruct = struct(col("pool_id"), col("parent"),
    col("issuer"), col("owner"), col("start"), col("end"))

  private val validityUdf = udf((rows: Seq[Row]) => {
    val pools = rows.map(toPool)
    pools.distinct.map(p => (p.id, p.parent.orNull, p.issuer, p.owner,
      p.start, p.end, poolIsValid(pools, p)))
  })

  private val spansUdf = udf((rows: Seq[Row]) => allSpans(rows.map(toPool)))

  private val admitUdf = udf((rows: Seq[Row], cand: Row, origin: String) => {
    val pools = Option(rows).map(_.map(toPool)).getOrElse(Seq.empty)
    admit(pools, toPool(cand), origin)
  })

  /** `pools(sc_id, pool_id, parent, issuer, owner, start, end)` →
    * `(sc_id, pool_id, parent, issuer, owner, start, end, valid)` per
    * distinct stored value. */
  def validity(pools: DataFrame): DataFrame =
    pools.groupBy("sc_id")
      .agg(validityUdf(collect_list(poolStruct)).as("vs"))
      .select(col("sc_id"), explode(col("vs")).as("v"))
      .select(col("sc_id"), col("v._1").as("pool_id"),
        col("v._2").as("parent"), col("v._3").as("issuer"),
        col("v._4").as("owner"), col("v._5").as("start"),
        col("v._6").as("end"), col("v._7").as("valid"))

  /** `(sc_id, owner, span_start, span_end)` — every owner's grantable
    * spans under lineage dominance. */
  def coordinatorSpans(pools: DataFrame): DataFrame =
    pools.groupBy("sc_id")
      .agg(spansUdf(collect_list(poolStruct)).as("sp"))
      .select(col("sc_id"), explode(col("sp")).as("s"))
      .select(col("sc_id"), col("s._1").as("owner"),
        col("s._2").as("span_start"), col("s._3").as("span_end"))

  /** `incoming(sc_id, inc_idx, pool_id, parent, issuer, owner, start, end,
    * origin)` admitted against the scenario's pool store →
    * `(sc_id, inc_idx, verdict)`. */
  def admitPools(pools: DataFrame, incoming: DataFrame): DataFrame = {
    val store = pools.groupBy("sc_id")
      .agg(collect_list(poolStruct).as("store"))
    incoming.join(store, Seq("sc_id"), "left_outer")
      .select(col("sc_id"), col("inc_idx"),
        admitUdf(col("store"), poolStruct, col("origin")).as("verdict"))
  }
}
