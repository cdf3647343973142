package graft.catalog

import graft.SparkSpec

/** Integer weighted rendezvous (placement/selector.rs). */
class PlacementRankSpec extends SparkSpec {

  private val Q48 = 1L << 48

  test("neg_log2_q48 exact vectors + float agreement + monotonicity " +
    "(selector.rs:108-165)") {
    assert(PlacementRank.negLog2Q48(1L << 63) == Q48)
    assert(PlacementRank.negLog2Q48(1L << 62) == 2 * Q48)
    assert(PlacementRank.negLog2Q48(1L) == 64 * Q48)
    val max = PlacementRank.negLog2Q48(-1L) // u64::MAX
    assert(max > 0 && max < Q48)
    // float reference within 1e-9 (the reference's own bound)
    val rnd = new scala.util.Random(7)
    var worst = 0.0
    for (_ <- 1 to 2048) {
      val h = rnd.nextLong() | 1L
      val fixed = PlacementRank.negLog2Q48(h).toDouble / math.pow(2, 48)
      val hf = (h >>> 1).toDouble * 2.0 + (h & 1L).toDouble
      val ref = -(math.log(hf / math.pow(2, 64)) / math.log(2))
      worst = math.max(worst, math.abs(fixed - ref))
    }
    assert(worst < 1e-9, s"worst error $worst")
    // monotone decreasing in h
    val hs = Seq(1L, 7L, 1L << 20, 1L << 40, 1L << 62, 1L << 63, -1L)
    val vals = hs.map(PlacementRank.negLog2Q48)
    assert(vals == vals.sorted.reverse)
  }

  test("rank_weighted: deterministic permutation, input-order independent, " +
    "zero weights sort last (selector.rs:167-190)") {
    val rnd = new scala.util.Random(11)
    val ids = (1 to 9).map { i =>
      val b = new Array[Byte](6); rnd.nextBytes(b); b
    }
    val cands = ids.zipWithIndex.map { case (id, i) =>
      (id, if (i < 2) 0L else (i * 137L) % 1000 + 1) }
    val order = PlacementRank.rankWeighted(PlacementRank.RoleShard,
      "subj".getBytes, cands)
    assert(order.sorted == (0 until 9))
    // zero-weight candidates (indices 0, 1) after every positive one
    assert(order.takeRight(2).toSet == Set(0, 1))
    // shuffled input ranks the same ids in the same order
    val perm = rnd.shuffle(cands.indices.toList)
    val shuffled = perm.map(cands)
    val order2 = PlacementRank.rankWeighted(PlacementRank.RoleShard,
      "subj".getBytes, shuffled)
    assert(order2.map(i => shuffled(i)._1.toSeq) ==
      order.map(i => cands(i)._1.toSeq))
  }

  test("golden order (selector.rs rank_weighted_golden_order)") {
    val ids = (1 to 6).map(i => Array.fill[Byte](32)(i.toByte))
    val weights = Seq(100L, 100L, 100L, 300L, 50L, 200L)
    val order = PlacementRank.rankWeighted(PlacementRank.RoleNode,
      "golden-subject".getBytes, ids.zip(weights))
    assert(order == Seq(0, 5, 3, 4, 2, 1))
  }
}
