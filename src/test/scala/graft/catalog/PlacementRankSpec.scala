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

  test("strategy resolution fallbacks: default when no binding applies, " +
    "first configured when no default, dangling default fails closed " +
    "(resolver.rs:418-421,166-186)") {
    import spark.implicits._
    val strategies = Seq(("st-a", 0L), ("st-b", 1L))
      .toDF("strategy_id", "seq")
    val noBind = Seq.empty[(Long, String, String, String)]
      .toDF("seq", "scope_kind", "scope_val", "strategy_id")
    val noOvr = Seq.empty[(String, String)].toDF("subject", "strategy_id")
    val reqs = Seq(("r1", "s", "Blob", null: String, null: String))
      .toDF("req_id", "subject", "class", "group_id", "metadata_path")
    def res(default: Option[String]) =
      PlacementRank.strategyForTarget(reqs, strategies, noBind, noOvr,
        default).collect().head
    assert(res(Some("st-b")).getString(2) == "st-b" &&
      res(Some("st-b")).getString(3) == "default")
    assert(res(None).getString(2) == "st-a" &&
      res(None).getString(3) == "first")
    assert(res(Some("st-gone")).getString(1) == "DanglingRef")
  }

  // ---- resolve_holders: the reference's deterministic distribution gates
  // (placement/distribution.rs), re-expressed over [seed; 32] ids — the
  // statistical bands are id-set independent ----

  import PlacementRank.{RNode, Affinity, Strategy}

  private def nodeHex(seed: Int) = ("%02x".format(seed)) * 32
  private def node(seed: Int, loc: String = "default", weight: Long = 100,
      labels: Map[String, String] = Map.empty) =
    RNode(nodeHex(seed), "Server", loc, weight, full = false,
      draining = false, labels)
  private def subject(counter: Long): Array[Byte] = {
    val le = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(counter).array()
    graft.functions.Blake3.hash(le, 32)
  }
  private val r1 = Strategy(Some(1), distinctLocations = false, Nil)
  private val Subjects = 4000

  private def shareOf(nodes: Seq[RNode], s: Strategy, seed: Int): Double =
    (0L until Subjects).count(c =>
      PlacementRank.resolveHolders(nodes, s, subject(c)).head ==
        nodeHex(seed)).toDouble / Subjects

  test("distribution: uniform balance, weighted shares, proportional-" +
    "minimum movement (distribution.rs:88-142)") {
    val uniform = (1 to 5).map(node(_))
    for (seed <- 1 to 5)
      assert(math.abs(shareOf(uniform, r1, seed) - 0.20) < 0.025)
    val weighted = Seq(node(1, weight = 100), node(2, weight = 200),
      node(3, weight = 300))
    for ((seed, want) <- Seq((1, 1.0 / 6), (2, 2.0 / 6), (3, 3.0 / 6)))
      assert(math.abs(shareOf(weighted, r1, seed) - want) < 0.025)
    // bump node 1's weight: every moved subject moves ONTO it
    val after = node(1, weight = 150) +: (2 to 5).map(node(_))
    var changed = 0
    for (c <- 0L until Subjects) {
      val old = PlacementRank.resolveHolders(uniform, r1, subject(c)).head
      val neu = PlacementRank.resolveHolders(after, r1, subject(c)).head
      if (old != neu) { changed += 1; assert(neu == nodeHex(1)) }
    }
    val fraction = changed.toDouble / Subjects
    assert(fraction > 0.04 && fraction < 0.12, s"movement $fraction")
  }

  test("multiply affinity shifts the cross-location share 0.50 -> 0.75 " +
    "(distribution.rs:145-168)") {
    val nodes = Seq(node(1, "a", 100, Map("tier" -> "boosted")),
      node(2, "b", 100))
    assert(math.abs(shareOf(nodes, r1, 1) - 0.50) < 0.025)
    val boosted = r1.copy(affinity =
      Seq(Affinity("multiply", 3000, "tier", "boosted")))
    assert(math.abs(shareOf(nodes, boosted, 1) - 0.75) < 0.025)
  }

  test("resolve_holders ladder: pins lead and bypass filters, exclusion " +
    "wins over a pin, distinct locations, full/draining/zero-weight and " +
    "User nodes never selected (resolver.rs:88-162,316-336)") {
    val nodes = Seq(
      node(1, "a"), node(2, "a"), node(3, "b"), node(4, "c"),
      node(5, "c").copy(full = true),
      node(6, "c").copy(draining = true),
      node(7, "d", weight = 0),
      node(8, "d").copy(kind = "User"))
    val all = Strategy(None, distinctLocations = false, Nil)
    val got = PlacementRank.resolveHolders(nodes, all, subject(1))
    assert(got.toSet == Set(1, 2, 3, 4).map(nodeHex))
    // distinct locations: at most one holder per location
    val d3 = Strategy(Some(3), distinctLocations = true, Nil)
    val dist = PlacementRank.resolveHolders(nodes, d3, subject(2))
    assert(dist.length == 3)
    assert(dist.map(h => nodes.find(_.idHex == h).get.location)
      .distinct.length == 3)
    // pins lead even when an affinity filter would reject them
    val filt = Strategy(Some(2), distinctLocations = false,
      Seq(Affinity("filter", 0, "zone", "z1")))
    val zoned = nodes.take(4).map(n =>
      if (n.idHex == nodeHex(3)) n.copy(labels = Map("zone" -> "z1")) else n)
    val pinned = PlacementRank.resolveHolders(zoned, filt, subject(3),
      pinned = Seq(nodeHex(2)))
    assert(pinned.head == nodeHex(2) && pinned(1) == nodeHex(3))
    // exclusion wins over a pin
    val exPin = PlacementRank.resolveHolders(zoned, filt, subject(3),
      pinned = Seq(nodeHex(2)), excluded = Set(nodeHex(2)))
    assert(exPin == Seq(nodeHex(3)))
  }
}
