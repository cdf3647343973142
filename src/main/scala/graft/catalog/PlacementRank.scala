package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Integer-only weighted two-level rendezvous (reference
  * `operations/src/placement/selector.rs` — "determinism is the whole
  * contract": identical inputs must rank identically on every platform,
  * so no floating point anywhere).
  *
  *  - `selector_hash` (`selector.rs:14-24`): blake3 over
  *    domain || role || subject || id, first 8 bytes big-endian, forced
  *    nonzero via `| 1`. The seed EXCLUDES the epoch — the selector is a
  *    pure function of the bucket alone, so a rebalance never rewrites
  *    it;
  *  - `neg_log2_q48` (`:31-46`): exact UQ16.48 fixed-point
  *    `-log2(h / 2^64)` — mantissa normalized by leading zeros, 48
  *    fraction bits peeled by repeated squaring;
  *  - `rank_weighted` (`:53-73`): candidate `i` precedes `j` iff
  *    `L_i·w_j < L_j·w_i` (the cross-multiplied weighted score, no
  *    division); ties break by `(L, id bytes)` ascending, so zero-weight
  *    candidates sort after every positive one.
  */
object PlacementRank {

  val Domain: Array[Byte] = "aruna-placement-rendezvous-v3".getBytes("UTF-8")
  val RoleLocation: Byte = 'L'.toByte
  val RoleNode: Byte = 'N'.toByte
  val RoleShard: Byte = 'S'.toByte

  def selectorHash(role: Byte, subject: Array[Byte],
      id: Array[Byte]): Long = {
    val input = Domain ++ Array(role) ++ subject ++ id
    val digest = graft.functions.Blake3.hash(input, 32)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h | 1L
  }

  /** Exact UQ16.48 `-log2(h / 2^64)` for nonzero `h` (`selector.rs:31-46`). */
  def negLog2Q48(h: Long): Long = {
    require(h != 0L)
    val z = java.lang.Long.numberOfLeadingZeros(h)
    var x = h << z
    var f = 0L
    var i = 0
    while (i < 48) {
      // y = (x² >> 63) in unsigned 128-bit arithmetic
      val xi = java.math.BigInteger.valueOf(x)
        .and(java.math.BigInteger.ONE.shiftLeft(64)
          .subtract(java.math.BigInteger.ONE))
      var y = xi.multiply(xi).shiftRight(63)
      if (y.bitLength() > 64) { // y >= 2^64
        f = (f << 1) | 1L
        y = y.shiftRight(1)
      } else f = f << 1
      x = y.longValue()
      i += 1
    }
    (((z.toLong) + 1L) << 48) - f
  }

  /** Rank one candidate set best-first. `candidates` = (idBytes, weight). */
  def rankWeighted(role: Byte, subject: Array[Byte],
      candidates: Seq[(Array[Byte], Long)]): Seq[Int] = {
    val scores = candidates.map { case (id, _) =>
      negLog2Q48(selectorHash(role, subject, id))
    }
    def bigU(l: Long) = java.math.BigInteger.valueOf(l)
      .and(java.math.BigInteger.ONE.shiftLeft(64)
        .subtract(java.math.BigInteger.ONE))
    candidates.indices.sortWith { (i, j) =>
      val lhs = bigU(scores(i)).multiply(bigU(candidates(j)._2))
      val rhs = bigU(scores(j)).multiply(bigU(candidates(i)._2))
      val c = lhs.compareTo(rhs)
      if (c != 0) c < 0
      else if (scores(i) != scores(j)) scores(i) < scores(j)
      else byteLt(candidates(i)._1, candidates(j)._1)
    }
  }

  private def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** A node as the resolver sees it (`resolver.rs:19-32`). */
  case class RNode(idHex: String, kind: String, location: String,
      weight: Long, full: Boolean, draining: Boolean,
      labels: Map[String, String])

  /** An affinity rule: effect ∈ filter | multiply (`resolver.rs:331-348`). */
  case class Affinity(effect: String, permille: Long, key: String,
      value: String)

  case class Strategy(replicaCount: Option[Int], distinctLocations: Boolean,
      affinity: Seq[Affinity])

  private def labelMatches(n: RNode, a: Affinity) =
    n.labels.get(a.key).contains(a.value)
  private def passesFilters(n: RNode, s: Strategy) =
    s.affinity.forall(a => a.effect != "filter" || labelMatches(n, a))
  private def effectiveWeight(n: RNode, s: Strategy): Long =
    s.affinity.foldLeft(n.weight) { (w, a) =>
      if (a.effect == "multiply" && labelMatches(n, a))
        // saturating u64 multiply then /1000; weights stay far below
        (BigInt(w) * a.permille / 1000).min(BigInt("18446744073709551615"))
          .toLong
      else w
    }
  private def syncEligible(n: RNode) = n.kind != "User" // realm.rs:308-310
  private def available(n: RNode, s: Strategy) =
    !n.full && !n.draining && effectiveWeight(n, s) > 0
  private def hexBytes(h: String) =
    h.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray

  /** The full holder resolution (`resolve_holders`, `resolver.rs:88-162`):
    * available pinned nodes lead (BYPASSING affinity filters, but
    * exclusion wins over a pin); then the weighted two-level walk —
    * locations ranked by their aggregate eligible weight (availability
    * and exclusions deliberately do NOT affect W_loc, preserving the
    * location order when a candidate is rejected), zero-weight locations
    * skipped, nodes ranked within each location — fills to
    * `replica_count` (None takes every eligible node);
    * `distinct_locations` takes at most one node per location, counting
    * the locations pins already used. */
  def resolveHolders(nodes: Seq[RNode], strategy: Strategy,
      subject: Array[Byte], pinned: Seq[String] = Nil,
      excluded: Set[String] = Set.empty): Seq[String] = {
    val target = strategy.replicaCount
    def reached(r: Seq[String]) = target.exists(r.length >= _)
    var result = Vector.empty[String]
    var used = Set.empty[String]
    var seenLoc = Set.empty[String]
    for (pin <- pinned if !reached(result) && !used(pin) && !excluded(pin)) {
      nodes.find(_.idHex == pin).foreach { n =>
        if (syncEligible(n) && available(n, strategy)) {
          result :+= pin; used += pin; seenLoc += n.location
        }
      }
    }
    if (reached(result)) return result
    // location groups in BTreeMap (sorted-name) intake order
    val groups = nodes.zipWithIndex.groupBy(_._1.location).toSeq
      .sortBy(_._1)
    val wLocs = groups.map { case (_, members) =>
      members.map(_._1)
        .filter(n => syncEligible(n) && passesFilters(n, strategy))
        .map(effectiveWeight(_, strategy)).sum
    }
    val locOrder = rankWeighted(RoleLocation, subject,
      groups.map(_._1.getBytes("UTF-8")).zip(wLocs))
    var done = false
    for (li <- locOrder if !done) {
      val (locName, members) = groups(li)
      if (wLocs(li) != 0 &&
          !(strategy.distinctLocations && seenLoc(locName))) {
        val ranked = rankWeighted(RoleNode, subject,
          members.map { case (n, _) =>
            (hexBytes(n.idHex), effectiveWeight(n, strategy)) })
        var tookFromLoc = false
        for (mi <- ranked if !done && !tookFromLoc) {
          val n = members(mi)._1
          if (!used(n.idHex) && syncEligible(n) &&
              available(n, strategy) && !excluded(n.idHex) &&
              passesFilters(n, strategy)) {
            result :+= n.idHex; used += n.idHex; seenLoc += n.location
            if (reached(result)) done = true
            else if (strategy.distinctLocations) tookFromLoc = true
          }
        }
      }
    }
    result
  }

  /** Strategy resolution for a sync target (`strategy_for_target` +
    * `resolve_strategy`, `resolver.rs:166-186,374-463`). Precedence:
    * subject override strategy > LONGEST matching metadata-path-prefix
    * binding (Metadata/MetadataRegistry classes only; prefix match is
    * whole-segment — equal, or followed by '/'; an empty prefix matches
    * everything; Rust's `max_by_key` keeps the LAST maximal element, so
    * equal lengths resolve to the latest binding) > group binding >
    * class binding > realm binding > `default_strategy_id`, falling back
    * to the FIRST configured strategy; any configured ref naming no
    * strategy fails the resolution (DanglingRef, fail-closed).
    *
    * `requests(req_id, subject, class, group_id, metadata_path)`;
    * `strategies(strategy_id, seq)`; `bindings(seq, scope_kind,
    * scope_val, strategy_id)`; `overrides(subject, strategy_id)`;
    * `defaultStrategy` — the config's default id (None = unset).
    *
    * Scale: strategies/bindings/overrides are realm-config relations —
    * all broadcast; the prefix match is a broadcast theta-join against
    * config-sized bindings. */
  def strategyForTarget(requests: DataFrame, strategies: DataFrame,
      bindings: DataFrame, overrides: DataFrame,
      defaultStrategy: Option[String]): DataFrame = {
    val known = strategies.select(col("strategy_id"),
      lit(true).as("known"))
    def resolved(idCol: org.apache.spark.sql.Column) = idCol
    val normPath = regexp_replace(trim(col("metadata_path")), "^/+|/+$", "")

    // longest whole-segment prefix binding (Metadata classes only)
    val pathBind = bindings.filter(col("scope_kind") === "PathPrefix")
      .select(col("seq").as("b_seq"),
        regexp_replace(trim(col("scope_val")), "^/+|/+$", "")
          .as("b_prefix"),
        col("strategy_id").as("path_sid"))
    val pathMatches = requests
      .filter(col("class").isin("Metadata", "MetadataRegistry") &&
        col("metadata_path").isNotNull)
      .withColumn("np", normPath)
      .join(broadcast(pathBind),
        col("b_prefix") === "" || col("np") === col("b_prefix") ||
          col("np").startsWith(concat(col("b_prefix"), lit("/"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("req_id")
          .orderBy(length(col("b_prefix")).desc, col("b_seq").desc)))
      .filter(col("rk") === 1)
      .select(col("req_id"), col("path_sid"))

    def firstBinding(kind: String, keyCol: String) = bindings
      .filter(col("scope_kind") === kind)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("scope_val").orderBy("seq")))
      .filter(col("rk") === 1)
      .select(col("scope_val").as(keyCol),
        col("strategy_id").as(kind.toLowerCase + "_sid"))
    val groupBind = firstBinding("Group", "group_id")
    val classBind = firstBinding("Class", "class")
    val realmBind = bindings.filter(col("scope_kind") === "Realm")
      .orderBy("seq").limit(1)
      .select(col("strategy_id").as("realm_sid"))
    val firstStrat = strategies.orderBy("seq").limit(1)
      .select(col("strategy_id").as("first_sid"))

    val j = requests
      .join(broadcast(overrides.select(col("subject"),
        col("strategy_id").as("ovr_sid"),
        lit(true).as("has_ovr"))), Seq("subject"), "left")
      .join(broadcast(pathMatches), Seq("req_id"), "left")
      .join(broadcast(groupBind), Seq("group_id"), "left")
      .join(broadcast(classBind), Seq("class"), "left")
      .crossJoin(broadcast(realmBind.withColumn("one", lit(1)))
        .join(broadcast(firstStrat.withColumn("one", lit(1))), Seq("one"),
          "full_outer").drop("one"))

    val chosen =
      when(col("ovr_sid").isNotNull, struct(col("ovr_sid").as("sid"),
        lit("override").as("source")))
        .when(col("path_sid").isNotNull, struct(col("path_sid").as("sid"),
          lit("path").as("source")))
        .when(col("group_sid").isNotNull, struct(col("group_sid").as("sid"),
          lit("group").as("source")))
        .when(col("class_sid").isNotNull, struct(col("class_sid").as("sid"),
          lit("class").as("source")))
        .when(col("realm_sid").isNotNull, struct(col("realm_sid").as("sid"),
          lit("realm").as("source")))
        .when(defaultStrategy.map(s => lit(s).isNotNull)
          .getOrElse(lit(false)),
          struct(lit(defaultStrategy.orNull).as("sid"),
            lit("default").as("source")))
        .otherwise(struct(col("first_sid").as("sid"),
          lit("first").as("source")))

    j.withColumn("chosen", chosen)
      .join(broadcast(known),
        col("chosen.sid") === col("strategy_id"), "left")
      .select(col("req_id"),
        when(col("chosen.sid").isNull, "NoStrategy")
          .when(col("known").isNull, "DanglingRef")
          .otherwise("Ok").as("verdict"),
        when(col("known").isNotNull, col("chosen.sid")).as("strategy_out"),
        when(col("known").isNotNull, col("chosen.source")).as("source"))
  }

  /** DataFrame face: rank each subject's candidate set.
    * `candidates(subject, id_hex, weight)` → `(subject, pos, id_hex)`.
    * Per-subject sets are shard-replica sized (a handful of nodes), so
    * the per-group sort is constant work; subjects partition freely. */
  def rank(spark: SparkSession, candidates: DataFrame,
      role: Byte): DataFrame = {
    import spark.implicits._
    candidates.select(col("subject"), col("id_hex"), col("weight"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (subject, it) =>
        val cs = it.toSeq.sortBy(_._2) // deterministic intake order
          .map(t => (t._2, t._3))
        val byteIds = cs.map { case (hex, w) =>
          (hex.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray, w)
        }
        rankWeighted(role, subject.getBytes("UTF-8"), byteIds)
          .zipWithIndex.map { case (ci, pos) =>
            (subject, pos + 1, cs(ci)._1)
          }.iterator
      }.toDF("subject", "pos", "id_hex")
  }
}
