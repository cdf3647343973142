package graft.catalog

import graft.SparkSpec
import EnsureRealmConfig._
import BandPools.BPool

/** EnsureRealmConfig ladder (reference `ensure_realm_config.rs`; arms
  * mirror its own tests: pools_stay_disjoint `:892`, transfer_splits_pool
  * `:974`, missing_pool_fails `:1012`, idempotent ensure `:1037`,
  * rejects_existing_node_kind_mismatch `:1276`). */
class EnsureRealmConfigSpec extends SparkSpec {
  import spark.implicits._

  private val rootA = BPool("pA", None, "A", "A", 3L, 6147L)

  private def run(
      target: String = "T", kind: String = "storage",
      create: Boolean = true, rkm: Boolean = true,
      docExists: Boolean = true, reducer: Boolean = true,
      mismatch: Boolean = false, strategy: Boolean = true,
      nodes: Seq[(String, String)] = Nil,
      pools: Seq[BPool] = Seq(rootA),
      grants: Seq[HRange] = Nil, bindings: Seq[Long] = Nil,
      matNodes: Seq[(String, String)] = Nil,
      conflicts: Seq[String] = Nil, matRanges: Seq[String] = Nil,
      matPools: Seq[BPool] = Nil) =
    decideOne("A", target, kind, create, rkm, docExists, reducer,
      mismatch, strategy, nodes, pools, grants, bindings, matNodes,
      conflicts, matRanges, matPools)

  test("error arms in reference order") {
    assert(run(docExists = false, create = false).error
      .contains("realm_config_not_found"))
    assert(run(nodes = Seq(("T", "management"))).error
      .contains("node_kind_mismatch"))
    // tolerated when reject_kind_mismatch is off
    assert(run(nodes = Seq(("T", "management")), rkm = false)
      .error.isEmpty)
    assert(run(mismatch = true).error.contains("target_mismatch"))
    assert(run(pools = Nil).error.contains("coordinator_pool_missing"))
    assert(run(grants = Seq(HRange("gx", "B", 3L, 6147L))).error
      .contains("handle_space_exhausted"))
    assert(run(strategy = false).error
      .contains("default_strategy_missing"))
  }

  test("fresh document seeds the whole space and mints band 0") {
    val d = run(docExists = false, create = true, pools = Nil,
      strategy = false) // fresh seeds its own strategies
    assert(d.verdict == "ok_write" && d.fresh.contains(true) &&
      d.evSeed.contains(true))
    assert(d.rangeStart.contains(3L) && d.rangeEnd.contains(1027L))
    assert(d.bindingHandle.contains(3L))
  }

  test("fresh document with reducer-materialized pools does NOT seed " +
    "(rs:224 fresh && band_pools.is_empty after the overlay at rs:212)") {
    // the materialized pool belongs to B, not the actor -> with no seed
    // the actor has no pool and the ladder errors
    val d = run(docExists = false, create = true, pools = Nil,
      strategy = false, matPools = Seq(BPool("pB", None, "B", "B", 3L,
        6147L)))
    assert(d.error.contains("coordinator_pool_missing"))
    // a materialized pool the ACTOR owns: still no seed, mint from it
    val d2 = run(docExists = false, create = true, pools = Nil,
      strategy = false, matPools = Seq(rootA))
    assert(d2.verdict == "ok_write" && d2.evSeed.contains(false))
    assert(d2.rangeStart.contains(3L) && d2.rangeEnd.contains(1027L))
    // the overlay replaces by pool id: a materialized twin of a document
    // pool must not double-count (existing doc arm)
    val d3 = run(matPools = Seq(rootA.copy(start = 8195L, end = 10243L)))
    assert(d3.rangeStart.contains(8195L)) // materialized value wins
  }

  test("invalid_band_start: a reused grant outside the 20-bit handle " +
    "space aborts (rs:266-267 PlacementHandle::new)") {
    val above = HRange("gx", "T", BandPools.HandleSpaceEnd, // = 2^20
      BandPools.HandleSpaceEnd + 1024L)
    assert(run(grants = Seq(above)).error.contains("invalid_band_start"))
    val zero = HRange("gz", "T", 0L, 1024L)
    assert(run(grants = Seq(zero)).error.contains("invalid_band_start"))
    // the last in-space band is fine
    val edge = HRange("ge", "T", BandPools.HandleSpaceEnd - 1024L,
      BandPools.HandleSpaceEnd)
    assert(run(grants = Seq(edge)).error.isEmpty)
  }

  test("grant reuse wins over minting; conflicted grants fall through") {
    val g = HRange("g1", "T", 2051L, 3075L)
    val d = run(grants = Seq(g))
    assert(d.rangeReused.contains(true) && d.rangeStart.contains(2051L))
    // an overlapping rival conflicts both -> minted lowest band instead
    val d2 = run(grants = Seq(g, HRange("g2", "B", 2560L, 3100L)))
    assert(d2.rangeReused.contains(false) && d2.rangeStart.contains(3L))
    // conflicted grants still occupy the band space
    assert(d2.rangeStart.contains(3L) && d2.rangeEnd.contains(1027L))
  }

  test("idempotent ensure is a noop (ensure_realm_config.rs:1037)") {
    val g = HRange("g1", "T", 2051L, 3075L)
    val d = run(grants = Seq(g), bindings = Seq(2051L),
      matNodes = Seq(("T", "storage")), matRanges = Seq("g1"))
    assert(d.verdict == "ok_noop")
    // any missing leg re-opens the write path
    assert(run(grants = Seq(g), bindings = Seq(2051L),
      matRanges = Seq("g1")).verdict == "ok_write") // node not materialized
    assert(run(grants = Seq(g), bindings = Seq(2051L),
      matNodes = Seq(("T", "storage")), matRanges = Seq("g1"),
      conflicts = Seq("T")).verdict == "ok_write") // conflicted path
  }

  test("management transfer gets the upper-ceil-half slice (rs:974)") {
    // mint consumes band 0; free run = bands 1..5 (len 5) -> ceil half
    val d = run(kind = "management")
    assert(d.evTransfer.contains(true))
    // run = bands 1..5 after the band-0 mint -> start 1027 + ceil(5/2)
    assert(d.transferStart.contains(1027L + 3 * 1024L) &&
      d.transferEnd.contains(6147L))
    // a target with its own pool transfers nothing
    val dT = run(kind = "management",
      pools = Seq(rootA, BPool("pT", None, "T", "T", 8195L, 10243L)))
    assert(dT.evTransfer.contains(false))
    // a run shorter than two bands transfers nothing
    val dS = run(kind = "management",
      pools = Seq(BPool("pA", None, "A", "A", 3L, 2051L)))
    assert(dS.evTransfer.contains(false))
  }

  test("pure handle helpers agree with their DataFrame twins (hd1/hd2)") {
    val rows = Seq(
      (1L, "r1", "a", 1L, 1025L), (1L, "r2", "a", 1025L, 2049L),
      (2L, "r1", "a", 1L, 1025L), (2L, "r2", "a", 512L, 2049L),
      (3L, "r1", "a", 3L, 1027L), (3L, "r1", "a", 1027L, 2051L),
      (3L, "r2", "a", 1500L, 2500L))
    val df = rows.toDF("sc_id", "range_id", "owner", "start", "end")
    val dfDir = HandleRanges.directory(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)) -> r.getBoolean(6)).toMap
    rows.groupBy(_._1).foreach { case (sc, rs) =>
      val pure = rs.map(t => HRange(t._2, t._3, t._4, t._5))
      val bad = conflictedIds(pure)
      pure.distinct.foreach { h =>
        assert(dfDir((sc, h.id, h.owner, h.start)) == bad(h.id),
          s"sc=$sc ${h.id}")
      }
    }
    // free band: pure vs DataFrame on the divergence fixture (sc 3)
    val spans = Seq((3L, 0L, 3L, 3L + 4 * 1024L))
      .toDF("sc_id", "span_idx", "span_start", "span_end")
    val dfFree = HandleRanges
      .freeBand(df.filter($"sc_id" === 3), spans).collect().head
    val pureFree = freeBandIn(Seq((3L, 3L + 4 * 1024L)),
      rows.filter(_._1 == 3L).map(t => HRange(t._2, t._3, t._4, t._5)))
    assert(pureFree.contains((dfFree.getLong(1), dfFree.getLong(2))))
  }

  test("pure transfer slice agrees with HandlePool.transferSlices (hp1)") {
    for (k <- 0L to 5L) {
      val spans = Seq((k, 0L, 0L, (k % 6 + 2) * 1024L))
        .toDF("sc_id", "span_idx", "span_start", "span_end")
      val cons = Seq((k, k % 3 * 1024L, k % 3 * 1024L + 300L))
        .toDF("sc_id", "c_start", "c_end")
      val dfRow = HandlePool.transferSlices(spans, cons).collect().head
      val dfSlice = if (dfRow.isNullAt(1)) None
        else Some((dfRow.getLong(1), dfRow.getLong(2)))
      val pure = poolTransferSlice(Seq((0L, (k % 6 + 2) * 1024L)),
        Seq(HRange("c", "x", k % 3 * 1024L, k % 3 * 1024L + 300L)))
      assert(pure == dfSlice, s"k=$k")
    }
  }
}
