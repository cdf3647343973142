package graft.catalog

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.catalog.BandPools.BPool

/** EnsureRealmConfig decision ladder (reference
  * `operations/src/ensure_realm_config.rs:155-409` emit_write_document_and_
  * admin_state + `pool_transfer_slice` `:582-610`, node-noop `:654-677`).
  *
  * Per request the ladder decides, in the reference's exact order:
  *  1. absent document + !create_if_missing → RealmConfigNotFound; absent +
  *     create → fresh seeded document (`:163-179`);
  *  2. reject_kind_mismatch against the RAW document's nodes (`:181-190`);
  *  3. reducer-state admin-target mismatch (`:202-207`);
  *  4. node-ensure noop: reducer materialized the target node with the same
  *     kind and no conflict on its path (`:214-221`, `:654-667`);
  *  5. seed pool: a fresh document grants the creating coordinator the
  *     whole band space as a self-issued root (`:222-233`);
  *  6. handle range: reuse the target's first usable (non-conflicted)
  *     grant, else mint the lowest free band of the actor's own pool —
  *     CoordinatorPoolMissing / HandleSpaceExhausted arms (`:235-259`);
  *  7. range noop: the reused grant is already reducer-materialized
  *     (`:260-263`);
  *  8. JobControl binding: the band's first handle, appended at most once;
  *     DefaultStrategyMissing when no strategy can back it (`:264-288`);
  *  9. transfer pool: a new management coordinator with no spans receives
  *     the upper-ceil-half of the actor's largest free run, provided the
  *     slice sits inside one owned parent pool (`:289-321`);
  * 10. all-noop → commit-noop, else the admin-event write set (`:322-366`).
  *
  * Modeling note: the node-noop check takes the overlay as given — the
  * reducer's materialized nodes and conflict paths arrive as inputs, and
  * document node ids are unique per document (ensure_node's update-first
  * semantics make the reference's has_node_kind equivalent to
  * "materialized kind matches" under that invariant; a divergent duplicate
  * in a raw Vec would be order-dependent in the reference itself,
  * `ensure_realm_config.rs:669-677`).
  *
  * Execution shape: one request resolves against ONE config document —
  * document-sized state by contract — so the fold runs per scenario as a
  * collect_list + pure-fold UDF (the same shape the reference uses: a pure
  * function over the decoded document), scenarios parallel across the
  * cluster. The pure band/lineage helpers reuse [[BandPools]]; the grant
  * directory and transfer fold are pure ports cross-checked against their
  * DataFrame twins (hd1/hd2, hp1) in the specs.
  */
object EnsureRealmConfig {

  final case class HRange(id: String, owner: String, start: Long, end: Long)

  /** handle_allocation.rs:22-58 — pure twin of HandleRanges.directory. */
  def conflictedIds(rs: Seq[HRange]): Set[String] = {
    val vals = rs.distinct
    val dup = vals.groupBy(_.id).collect {
      case (id, vs) if vs.lengthCompare(1) > 0 => id
    }.toSet
    val ov = (for {
      a <- vals; b <- vals
      if a.id != b.id && a.start < b.end && b.start < a.end
    } yield a.id).toSet
    dup ++ ov
  }

  /** handle_allocation.rs:66-77 — non-conflicted grants of `owner`, sorted. */
  def grantedTo(rs: Seq[HRange], owner: String): Seq[HRange] = {
    val bad = conflictedIds(rs)
    rs.distinct.filter(r => !bad(r.id) && r.owner == owner)
      .sortBy(r => (r.start, r.id))
  }

  /** handle_allocation.rs:90-107 — lowest free band in span order; ALL
    * stored grants (conflicted included) occupy. */
  def freeBandIn(spans: Seq[(Long, Long)], rs: Seq[HRange])
      : Option[(Long, Long)] = {
    val vals = rs.distinct
    spans.iterator.flatMap { case (ss, se) =>
      val n = math.max(0L, se - ss) / 1024
      (0L until n).iterator
        .map(b => (ss + b * 1024, ss + b * 1024 + 1024))
    }.find { case (s, e) => !vals.exists(r => r.start < e && s < r.end) }
  }

  /** ensure_realm_config.rs:582-610 — pure twin of
    * HandlePool.transferSlices (hp1). */
  def poolTransferSlice(spans: Seq[(Long, Long)], consumed: Seq[HRange])
      : Option[(Long, Long)] = {
    var best: Option[(Long, Long)] = None
    spans.foreach { case (ss, se) =>
      var runStart: Option[Long] = None
      val bands = math.max(0L, se - ss) / 1024
      var band = 0L
      while (band <= bands) {
        val start = ss + band * 1024
        val free = band < bands &&
          !consumed.exists(r => r.start < start + 1024 && start < r.end)
        (free, runStart) match {
          case (true, None) => runStart = Some(start)
          case (false, Some(from)) =>
            if (best.forall { case (bs, be) => start - from > be - bs })
              best = Some((from, start))
            runStart = None
          case _ => ()
        }
        band += 1
      }
    }
    best.flatMap { case (s, e) =>
      val bands = (e - s) / 1024
      if (bands >= 2) Some((s + ((bands + 1) / 2) * 1024, e)) else None
    }
  }

  final case class Decision(verdict: String, error: Option[String],
      fresh: Option[Boolean], evNode: Option[Boolean],
      evSeed: Option[Boolean], evRange: Option[Boolean],
      evBinding: Option[Boolean], evTransfer: Option[Boolean],
      rangeStart: Option[Long], rangeEnd: Option[Long],
      rangeReused: Option[Boolean], bindingHandle: Option[Long],
      transferStart: Option[Long], transferEnd: Option[Long])

  private def err(e: String) = Decision("error", Some(e), None, None, None,
    None, None, None, None, None, None, None, None, None)

  /** The whole-space self-issued root a fresh document seeds (`:222-231`):
    * FIRST_GRANTABLE_HANDLE .. band_start(HANDLE_BANDS). */
  val SeedPoolEnd: Long = BandPools.bandStart(BandPools.HandleBands)

  // scalar request fields: (actor, target, kind, create_if_missing,
  // reject_kind_mismatch, doc_exists, reducer_exists, target_mismatch,
  // has_strategy). `matPools` is the reducer overlay's materialized pool
  // set (`admin_document_reducer.rs:272-283` replace-by-id into the
  // document BEFORE the seed check, `ensure_realm_config.rs:212` — so a
  // FRESH document with reducer-materialized pools does NOT seed,
  // `:224` `fresh && document.band_pools.is_empty()`).
  def decideOne(actor: String, target: String, kind: String,
      createIfMissing: Boolean, rejectKindMismatch: Boolean,
      docExists: Boolean, reducerExists: Boolean, targetMismatch: Boolean,
      hasStrategy: Boolean,
      docNodes: Seq[(String, String)], docPools: Seq[BPool],
      docGrants: Seq[HRange], docBindings: Seq[Long],
      matNodes: Seq[(String, String)], nodeConflicts: Seq[String],
      matRanges: Seq[String], matPools: Seq[BPool] = Seq.empty): Decision = {
    if (!docExists && !createIfMissing) return err("realm_config_not_found")
    val fresh = !docExists
    val nodes = if (docExists) docNodes else Seq.empty
    if (rejectKindMismatch &&
      nodes.exists(n => n._1 == target && n._2 != kind))
      return err("node_kind_mismatch")
    if (reducerExists && targetMismatch) return err("target_mismatch")

    val nodeNoop = reducerExists && !nodeConflicts.contains(target) &&
      matNodes.exists(m => m._1 == target && m._2 == kind)
    // the reducer overlay materializes into the document first (replace by
    // pool id); the seed fires only when the OVERLAID pool set is empty
    val overlaid = (if (docExists) docPools else Seq.empty)
      .filterNot(p => matPools.exists(_.id == p.id)) ++ matPools
    val seed = fresh && overlaid.isEmpty
    val poolsEff = overlaid ++
      (if (seed) Seq(BPool("seed", None, actor, actor, 3L, SeedPoolEnd))
       else Seq.empty)
    val grantsEff = if (docExists) docGrants else Seq.empty
    def spansOf(owner: String): Seq[(Long, Long)] =
      BandPools.allSpans(poolsEff).collect {
        case (o, s, e) if o == owner => (s, e)
      }

    val usable = grantedTo(grantsEff, target)
    val (assigned, reused) = usable.headOption match {
      case Some(u) => (u, true)
      case None =>
        val spans = spansOf(actor)
        if (spans.isEmpty) return err("coordinator_pool_missing")
        freeBandIn(spans, grantsEff) match {
          case None => return err("handle_space_exhausted")
          case Some((s, e)) => (HRange("new", target, s, e), false)
        }
    }
    val rangeNoop = reused && reducerExists && matRanges.contains(assigned.id)

    // PlacementHandle::new on the band's first handle
    // (ensure_realm_config.rs:266-267): 0 is the reserved handle and the
    // space is 20-bit — a malformed stored grant outside it aborts. A
    // minted band can never trip this (spans derive from validated pools).
    if (assigned.start == 0L || assigned.start >= BandPools.HandleSpaceEnd)
      return err("invalid_band_start")

    val jobHandle = assigned.start
    val binding =
      if ((if (docExists) docBindings else Seq.empty).contains(jobHandle))
        None
      else {
        if (!fresh && !hasStrategy) return err("default_strategy_missing")
        Some(jobHandle)
      }

    val transfer =
      if (kind == "management" && target != actor && spansOf(target).isEmpty) {
        poolTransferSlice(spansOf(actor), grantsEff :+ assigned)
          .filter { case (s, e) =>
            poolsEff.exists(p => BandPools.poolIsValid(poolsEff, p) &&
              p.owner == actor && p.start <= s && e <= p.end)
          }
      } else None

    val noop = nodeNoop && rangeNoop && binding.isEmpty && !seed &&
      transfer.isEmpty
    Decision(if (noop) "ok_noop" else "ok_write", None, Some(fresh),
      Some(!nodeNoop), Some(seed), Some(!rangeNoop), Some(binding.isDefined),
      Some(transfer.isDefined), Some(assigned.start), Some(assigned.end),
      Some(reused), binding, transfer.map(_._1), transfer.map(_._2))
  }

  private val decideUdf = udf((req: Row, nodes: Seq[Row], pools: Seq[Row],
      grants: Seq[Row], bindings: Seq[Long], matNodes: Seq[Row],
      nodeConflicts: Seq[String], matRanges: Seq[String],
      matPools: Seq[Row]) => {
    val opt = (xs: Seq[Row]) => Option(xs).getOrElse(Seq.empty)
    val toPool = (r: Row) => BPool(r.getString(0), Option(r.getString(1)),
      r.getString(2), r.getString(3), r.getLong(4), r.getLong(5))
    decideOne(
      req.getString(0), req.getString(1), req.getString(2),
      req.getBoolean(3), req.getBoolean(4), req.getBoolean(5),
      req.getBoolean(6), req.getBoolean(7), req.getBoolean(8),
      opt(nodes).map(r => (r.getString(0), r.getString(1))),
      opt(pools).map(toPool),
      opt(grants).map(r => HRange(r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))),
      Option(bindings).getOrElse(Seq.empty),
      opt(matNodes).map(r => (r.getString(0), r.getString(1))),
      Option(nodeConflicts).getOrElse(Seq.empty),
      Option(matRanges).getOrElse(Seq.empty),
      opt(matPools).map(toPool))
  })

  /** Per-scenario decision relation. `reqs` carries the scalar request +
    * document flags; the remaining inputs are the document/reducer
    * collections keyed by `sc_id`. */
  def decide(reqs: DataFrame, nodes: DataFrame, pools: DataFrame,
      grants: DataFrame, bindings: DataFrame, matNodes: DataFrame,
      nodeConflicts: DataFrame, matRanges: DataFrame,
      matPools: Option[DataFrame] = None): DataFrame = {
    def agg(df: DataFrame, c: org.apache.spark.sql.Column, name: String) =
      df.groupBy("sc_id").agg(collect_list(c).as(name))
    val poolStruct = struct(col("pool_id"), col("parent"), col("issuer"),
      col("owner"), col("start"), col("end"))
    val base = reqs
      .join(agg(nodes, struct(col("node_id"), col("kind")), "ns"),
        Seq("sc_id"), "left_outer")
      .join(agg(pools, poolStruct, "ps"), Seq("sc_id"), "left_outer")
      .join(agg(grants, struct(col("range_id"), col("owner"), col("start"),
        col("end")), "gs"), Seq("sc_id"), "left_outer")
      .join(agg(bindings, col("handle"), "bs"), Seq("sc_id"), "left_outer")
      .join(agg(matNodes, struct(col("node_id"), col("kind")), "mn"),
        Seq("sc_id"), "left_outer")
      .join(agg(nodeConflicts, col("node_id"), "nc"), Seq("sc_id"),
        "left_outer")
      .join(agg(matRanges, col("range_id"), "mr"), Seq("sc_id"),
        "left_outer")
    val withMp = matPools match {
      case Some(mp) => base.join(agg(mp, poolStruct, "mp"), Seq("sc_id"),
        "left_outer")
      case None => base.withColumn("mp", lit(null).cast(
        "array<struct<pool_id:string,parent:string,issuer:string," +
          "owner:string,start:bigint,end:bigint>>"))
    }
    val out = withMp
      .withColumn("d", decideUdf(
        struct(col("actor"), col("target"), col("kind"),
          col("create_if_missing"), col("reject_kind_mismatch"),
          col("doc_exists"), col("reducer_exists"), col("target_mismatch"),
          col("has_strategy")),
        col("ns"), col("ps"), col("gs"), col("bs"), col("mn"), col("nc"),
        col("mr"), col("mp")))
    out.select(col("sc_id"),
      col("d.verdict").as("verdict"), col("d.error").as("error"),
      col("d.fresh").as("fresh"), col("d.evNode").as("ev_node"),
      col("d.evSeed").as("ev_seed"), col("d.evRange").as("ev_range"),
      col("d.evBinding").as("ev_binding"),
      col("d.evTransfer").as("ev_transfer"),
      col("d.rangeStart").as("range_start"),
      col("d.rangeEnd").as("range_end"),
      col("d.rangeReused").as("range_reused"),
      col("d.bindingHandle").as("binding_handle"),
      col("d.transferStart").as("transfer_start"),
      col("d.transferEnd").as("transfer_end"))
  }
}
