package graft.catalog

import graft.SparkSpec
import BandPools._

/** Band-pool lineage (reference `core/src/structs/placement.rs`; arms
  * mirror its own tests at `:794-936`). */
class BandPoolsSpec extends SparkSpec {

  private val Bands = HandleBands
  private def root(id: String, owner: String, sb: Long, eb: Long) =
    BPool(id, None, owner, owner, bandStart(sb), bandStart(eb))
  private def child(id: String, parent: BPool, owner: String, sb: Long,
      eb: Long) =
    BPool(id, Some(parent.id), parent.owner, owner, bandStart(sb),
      bandStart(eb))

  private def spansOf(pools: Seq[BPool], owner: String) =
    allSpans(pools).filter(_._1 == owner).map(s => (s._2, s._3))

  test("spans follow transfers, order-independent") {
    // placement.rs:794-821 spans_follow_transfers
    val full = root("p1", "elder", 0, Bands)
    assert(spansOf(Seq(full), "elder") ==
      Seq((FirstGrantableHandle, bandStart(Bands))))
    assert(spansOf(Seq(full), "newer").isEmpty)
    val transferred = child("p2", full, "newer", Bands / 2, Bands)
    assert(spansOf(Seq(full, transferred), "elder") ==
      Seq((FirstGrantableHandle, bandStart(Bands / 2))))
    assert(spansOf(Seq(full, transferred), "newer") ==
      Seq((bandStart(Bands / 2), bandStart(Bands))))
    assert(spansOf(Seq(transferred, full), "elder") ==
      spansOf(Seq(full, transferred), "elder"))
  }

  test("lineage beats id-order skew") {
    // placement.rs:823-845 — child id sorting before the parent's changes
    // nothing: resolution is by lineage, never ULID order
    val full = root("p9", "elder", 0, Bands)
    val transferred = child("p2", full, "newer", Bands / 2, Bands)
    assert(spansOf(Seq(full, transferred), "newer") ==
      Seq((bandStart(Bands / 2), bandStart(Bands))))
  }

  test("sibling overlap fails closed") {
    // placement.rs:847-873 sibling_overlap_fails
    val full = root("p1", "elder", 0, Bands)
    val a = child("p2", full, "left", 1, 3)
    val b = child("p3", full, "right", 2, 4)
    val pools = Seq(full, a, b)
    assert(spansOf(pools, "left") == Seq((bandStart(1), bandStart(2))))
    assert(spansOf(pools, "right") == Seq((bandStart(3), bandStart(4))))
    assert(spansOf(pools, "elder").forall { case (s, e) =>
      bandStart(2) + HandleRangeSize <= s || e <= bandStart(2)
    })
  }

  test("forged issuer grants nothing and is rejected") {
    // placement.rs:875-898 forged_issuer_invalid
    val full = root("p1", "elder", 0, Bands)
    val forged = BPool("p5", Some("p1"), "attacker", "victim",
      bandStart(1), bandStart(2))
    assert(spansOf(Seq(full, forged), "victim").isEmpty)
    assert(spansOf(Seq(full, forged), "attacker").isEmpty)
    assert(admit(Seq(full), forged, "attacker") == "reject")
  }

  test("admission defers on missing parent, roots must be self-issued") {
    // placement.rs:900-918 admit_defers_missing
    val full = root("p1", "elder", 0, Bands)
    val transfer = child("p2", full, "newer", Bands / 2, Bands)
    assert(admit(Seq.empty, transfer, "elder") == "missing_parent")
    assert(admit(Seq(full), transfer, "elder") == "accept")
    assert(admit(Seq.empty, full, "elder") == "accept")
    assert(admit(Seq.empty, full, "newer") == "reject")
    // duplicate-occurrence parent resolves to nobody -> defer
    assert(admit(Seq(full, full), transfer, "elder") == "missing_parent")
  }

  test("partial bands are never grantable") {
    // placement.rs:920-936 partial_bands_ignored
    val partial = BPool("p3", None, "o", "o",
      FirstGrantableHandle + 1, bandStart(2) + 5)
    assert(spansOf(Seq(partial), "o") == Seq((bandStart(1), bandStart(2))))
  }

  test("cycles and duplicate occurrences invalidate") {
    val x = BPool("px", Some("py"), "g", "g", bandStart(1), bandStart(2))
    val y = BPool("py", Some("px"), "g", "g", bandStart(1), bandStart(2))
    assert(!poolIsValid(Seq(x, y), x) && !poolIsValid(Seq(x, y), y))
    val r = root("pr", "a", 0, 4)
    assert(!poolIsValid(Seq(r, r), r))
    assert(poolIsValid(Seq(r), r))
  }
}
