package graft.catalog

import java.math.BigInteger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Blake3

/** Weighted two-level rendezvous placement (reference
  * `operations/src/placement/selector.rs` + `resolver.rs`).
  *
  * Pinned semantics:
  *  - `selector_hash` (`selector.rs:15-25`): hash of
  *    `domain ‖ role ‖ subject ‖ id`, first 8 bytes big-endian, forced
  *    nonzero via `| 1`. The seed excludes any epoch: the selector is a
  *    pure function of the bucket (spec 6.3.1), so rebalances never
  *    rewrite it.
  *  - `neg_log2_q48` (`selector.rs:27-47`): EXACT UQ16.48 fixed-point
  *    `-log2(h / 2^64)` — normalize by leading zeros, then peel 48
  *    fraction bits by repeated squaring. Integer-only: identical
  *    rankings on every platform.
  *  - `rank_weighted` (`selector.rs:49-72`): best-first by
  *    `-log2(u)/weight`, compared exactly as `L_i·w_j < L_j·w_i` in
  *    128-bit; ties by `(L, id bytes)`, so zero-weight candidates sort
  *    after every positive one.
  *  - `resolve_holders` (`resolver.rs:88-162`): available pinned nodes
  *    lead (bypassing affinity FILTERS but not availability; exclusion
  *    wins over a pin), then the two-level walk — locations ranked by
  *    `W_loc` = Σ effective weights of sync-eligible filter-passing
  *    members (full/draining/excluded members still COUNT toward
  *    `W_loc`, preserving location order when a candidate is rejected —
  *    `resolver.rs:268-270`), zero-weight locations skipped, nodes
  *    ranked within each location by effective weight; under
  *    `distinct_locations` at most one holder per location and pin
  *    locations count as seen. `replica_count = None` takes every
  *    eligible node.
  *  - affinity (`resolver.rs:330-353`): `Filter` rules gate eligibility
  *    AND `W_loc` membership; `Multiply{permille}` scales
  *    `effective_weight = w·permille/1000` (floor).
  *  - eligibility: kind != User (`realm.rs:308-310`), not full, not
  *    draining, effective weight > 0, not excluded, passes filters.
  *
  * Distribution contracts pinned by spec tests (`distribution.rs`):
  * shares track weight, reweights move keys only onto the bumped node
  * (rendezvous minimal movement), multiply-affinity shifts cross-location
  * share.
  *
  * The DataFrame operator substitutes an md5-backed `selector_hash`
  * (identical pipeline after the hash) so the DuckDB oracle can replay
  * it; the blake3 production path is pinned against the reference's own
  * golden vectors in the spec (`rank_weighted_golden_order`).
  *
  * EXACT ordering without u128 columns: candidates sort by
  * `floor((L << 64) / w)` as a zero-padded 40-digit decimal string.
  * Distinct rationals `L/w` with `L < 2^54, w ≤ 2^20` differ by at least
  * `1/(w_i·w_j) ≥ 2^-40`, while the fixed-point floor resolves `2^-64` —
  * so key equality holds exactly when the reference's cross-products tie,
  * and the `(L, id)` tie-break then matches the reference comparator.
  *
  * Scale shape: the node view and strategy are realm-config-sized and
  * broadcast; every per-subject score/rank is a codegen-friendly
  * projection + two bounded per-subject windows. The subject batch never
  * shuffles beyond its own rank windows.
  */
object Placement {

  val Domain = "aruna-placement-rendezvous-v3"
  val RoleLocation = 'L'.toByte
  val RoleNode = 'N'.toByte

  /** Exact UQ16.48 `-log2(h / 2^64)` for nonzero `h` (u64 bit pattern). */
  def negLog2Q48(h: Long): Long = {
    require(h != 0L, "neg_log2_q48 needs nonzero input")
    val z = java.lang.Long.numberOfLeadingZeros(h)
    var x = h << z
    var f = 0L
    var i = 0
    while (i < 48) {
      // y = (x*x as u128) >> 63; bit set iff y >= 2^64 (top bit of hi)
      val hi = unsignedMulHi(x, x)
      val lo = x * x
      if ((hi >>> 63) == 1L) { f = (f << 1) | 1L; x = hi }
      else { f = f << 1; x = (hi << 1) | (lo >>> 63) }
      i += 1
    }
    ((z.toLong + 1L) << 48) - f
  }

  /** High 64 bits of the unsigned 128-bit product (Java 17 lacks
    * `Math.unsignedMultiplyHigh`). */
  private def unsignedMulHi(x: Long, y: Long): Long =
    Math.multiplyHigh(x, y) + ((x >> 63) & y) + ((y >> 63) & x)

  /** `selector_hash` over blake3 — the production path. */
  def selectorHashBlake3(role: Byte, subject: Array[Byte],
      id: Array[Byte]): Long = {
    val buf = new java.io.ByteArrayOutputStream()
    buf.write(Domain.getBytes("UTF-8"))
    buf.write(role.toInt)
    buf.write(subject)
    buf.write(id)
    val d = Blake3.hash(buf.toByteArray, 8)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h | 1L
  }

  /** `rank_weighted`: candidate indices best-first. Exact u128 compare
    * via BigInteger (candidate lists are realm-config-sized). */
  def rankWeighted(role: Byte, subject: Array[Byte],
      candidates: Seq[(Array[Byte], Long)]): Seq[Int] = {
    val scores = candidates.map { case (id, _) =>
      negLog2Q48(selectorHashBlake3(role, subject, id))
    }
    def u128(a: Long, b: Long): BigInteger =
      BigInteger.valueOf(a).multiply(BigInteger.valueOf(b))
    candidates.indices.sortWith { (i, j) =>
      val lhs = u128(scores(i), candidates(j)._2)
      val rhs = u128(scores(j), candidates(i)._2)
      val c = lhs.compareTo(rhs)
      if (c != 0) c < 0
      else if (scores(i) != scores(j)) scores(i) < scores(j)
      else byteLt(candidates(i)._1, candidates(j)._1)
    }
  }

  private def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  // ---- DataFrame operator (md5-backed hash; identical downstream) ----

  private val negLog2Udf = udf((h: Long) => negLog2Q48(h))

  /** `floor((score << 64) / w)` as a 40-digit zero-padded decimal string
    * (exact sortable fixed-point ratio); null marks `w == 0`, which sorts
    * AFTER every keyed candidate. */
  private val ratioKeyUdf = udf { (score: Long, w: Long) =>
    if (w <= 0L) null
    else {
      val k = BigInteger.valueOf(score).shiftLeft(64)
        .divide(BigInteger.valueOf(w)).toString
      ("0" * (40 - k.length)) + k
    }
  }

  /** md5-backed `selector_hash` as a column (u64 bit pattern in a Long):
    * first 8 big-endian bytes of `md5(domain|role|subject|id)`, `| 1`. */
  def selectorHashCol(role: String, subject: Column, id: Column): Column = {
    // one native digest-slice kernel (≡ the hex/conv composition over
    // md5(...cast binary) — same UTF-8 bytes, fuzz-pinned in Md5SlicesSpec)
    val hs = graft.functions.Md5HexLongs(concat(lit(Domain), lit("|"),
      lit(role), lit("|"), subject, lit("|"), id), Seq((1, 8), (9, 8)))
    val hi = hs.getItem(0)
    val lo = hs.getItem(1)
    shiftleft(hi, 32).bitwiseOR(lo).bitwiseOR(lit(1L))
  }

  private def scoreCol(role: String, subject: Column, id: Column): Column =
    negLog2Udf(selectorHashCol(role, subject, id))

  /** One placement strategy (the realm-config `PlacementStrategy`).
    * Affinity rules: (labelKey, labelValue, effect, permille) with effect
    * `"filter"` or `"multiply"`. */
  final case class Strategy(replicaCount: Option[Int],
      distinctLocations: Boolean,
      affinity: Seq[(String, String, String, Int)] = Nil)

  /** Resolve holders for every subject.
    *
    * `subjects(subject)`; `nodes(node_id, kind, location, weight, full,
    * draining, labels: map<string,string>)` (realm-config-sized);
    * `overrides(subject, pinned: array<string>, excluded: array<string>)`
    * or null. Emits `(subject, rank, node_id, location, via)` rows in
    * holder order (`via` = pin | walk).
    */
  def resolveHolders(subjects: DataFrame, nodes: DataFrame,
      strategy: Strategy, overrides: DataFrame = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // effective weight + filter pass as columns over the node view
    val effW = strategy.affinity.foldLeft(col("weight").cast("long")) {
      case (w, (k, v, "multiply", permille)) =>
        when(element_at(col("labels"), k) === v,
          floor(w * permille / 1000).cast("long")).otherwise(w)
      case (w, _) => w
    }
    val passes = strategy.affinity.foldLeft(lit(true)) {
      case (p, (k, v, "filter", _)) =>
        p && element_at(col("labels"), k) === v
      case (p, _) => p
    }
    val prepped = nodes.select(col("node_id"), col("kind"), col("location"),
      effW.as("eff_w"), passes.as("passes"),
      (col("kind") =!= "User").as("sync_ok"),
      (!col("full") && !col("draining") && effW > 0).as("avail"))

    // W_loc: full/draining members still count (resolver.rs:268-270)
    val locW = prepped.groupBy("location").agg(
      sum(when(col("sync_ok") && col("passes"), col("eff_w"))
        .otherwise(0L)).as("w_loc"))

    val ov = Option(overrides).getOrElse(
      subjects.sparkSession.emptyDataFrame
        .withColumn("subject", lit(null).cast("string"))
        .withColumn("pinned", lit(null).cast("array<string>"))
        .withColumn("excluded", lit(null).cast("array<string>"))
        .limit(0))
    val subj = subjects.join(broadcast(ov), Seq("subject"), "left_outer")
      .select(col("subject"),
        coalesce(col("pinned"), array()).as("pinned"),
        coalesce(col("excluded"), array()).as("excluded"))

    // ---- pins: override order, availability-gated, exclusion wins ----
    val pinCand = subj.filter(size(col("pinned")) > 0)
      .select(col("subject"), col("excluded"),
        posexplode(col("pinned")).as(Seq("pin_pos", "node_id")))
      // first occurrence only (duplicate pins are skipped as used)
      .withColumn("dup_rn", row_number().over(
        Window.partitionBy("subject", "node_id").orderBy("pin_pos")))
      .filter(col("dup_rn") === 1)
      .join(broadcast(prepped), Seq("node_id"), "inner")
      .filter(col("sync_ok") && col("avail") &&
        !array_contains(col("excluded"), col("node_id")))
      .select(col("subject"), col("pin_pos"), col("node_id"),
        col("location"))
    val pins = pinCand
      .withColumn("pin_rank", row_number().over(
        Window.partitionBy("subject").orderBy("pin_pos")))
      .filter(strategy.replicaCount
        .map(t => col("pin_rank") <= t).getOrElse(lit(true)))

    val pinStats = pins.groupBy("subject").agg(
      count(lit(1)).cast("int").as("n_pins"),
      collect_set(col("node_id")).as("pin_nodes"),
      collect_set(col("location")).as("pin_locs"))

    // ---- the weighted two-level walk ----
    val cand = subj
      .join(broadcast(pinStats), Seq("subject"), "left_outer")
      .select(col("subject"), col("excluded"),
        coalesce(col("n_pins"), lit(0)).as("n_pins"),
        coalesce(col("pin_nodes"), array()).as("pin_nodes"),
        coalesce(col("pin_locs"), array()).as("pin_locs"))
      .crossJoin(broadcast(prepped.join(locW, Seq("location"))))
      .filter(col("sync_ok") && col("avail") && col("passes") &&
        !array_contains(col("excluded"), col("node_id")) &&
        !array_contains(col("pin_nodes"), col("node_id")) &&
        col("w_loc") > 0)
      .filter(if (strategy.distinctLocations)
        !array_contains(col("pin_locs"), col("location")) else lit(true))
      .withColumn("l_score",
        scoreCol("L", col("subject"), col("location")))
      .withColumn("l_key", ratioKeyUdf(col("l_score"), col("w_loc")))
      .withColumn("n_score",
        scoreCol("N", col("subject"), col("node_id")))
      .withColumn("n_key", ratioKeyUdf(col("n_score"), col("eff_w")))

    val walkOrdered =
      if (strategy.distinctLocations) {
        // best eligible node per location, then locations in rank order
        cand.withColumn("in_loc", row_number().over(
            Window.partitionBy("subject", "location")
              .orderBy(asc_nulls_last("n_key"), col("n_score"),
                col("node_id"))))
          .filter(col("in_loc") === 1)
          .withColumn("walk_rank", row_number().over(
            Window.partitionBy("subject")
              .orderBy(asc_nulls_last("l_key"), col("l_score"),
                col("location"))))
      } else {
        cand.withColumn("walk_rank", row_number().over(
          Window.partitionBy("subject")
            .orderBy(asc_nulls_last("l_key"), col("l_score"),
              col("location"), asc_nulls_last("n_key"), col("n_score"),
              col("node_id"))))
      }
    val walk = strategy.replicaCount match {
      case Some(t) => walkOrdered.filter(
        col("walk_rank") + col("n_pins") <= t)
      case None => walkOrdered
    }

    pins.select(col("subject"), col("pin_rank").as("rank"),
        col("node_id"), col("location"), lit("pin").as("via"))
      .unionByName(walk.select(col("subject"),
        (col("walk_rank") + col("n_pins")).as("rank"),
        col("node_id"), col("location"), lit("walk").as("via")))
  }
}
