package graft.relational

import graft.Tables
import graft.Tables.{davg, dsum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operator coverage (SURVEY §2.2–§2.6) expressed over the
  * driver's TPC-H-ish tables: scan+filter+project, multi-way joins with
  * broadcast dims, semi/anti joins, aggregation, window functions, set ops,
  * sort/limit/offset pagination.
  *
  * Every query is paired with an ANSI-SQL oracle (DuckDB). Double-typed
  * aggregates go through exact decimal arithmetic (see [[graft.Tables]]) so
  * results are bit-identical regardless of partitioning/order — aggregation
  * over doubles is otherwise non-associative and would flap at scale.
  *
  * Scale design notes (100 TB):
  *  - dimension tables (region/nation/supplier/part/customer) are broadcast;
  *    only fact-fact joins (lineitem ⋈ orders) shuffle, on their join key.
  *  - all filters are plain column predicates → pushed to parquet scans.
  *  - windows partition by a high-cardinality key (custkey), never global.
  */
object CoreQueries {

  // Exact decimal per-row products: raw money columns carry <=4 decimal
  // digits, so the double->decimal(.,4) casts below are unambiguous (no
  // value sits near a rounding boundary); decimal multiplication is then
  // exact with no scale reduction anywhere. The oracle routes its final
  // decimal->double cast through VARCHAR so both engines use a correctly
  // rounded conversion of the same exact decimal.
  private def revenue = col("l_extendedprice").cast(DecimalType(14, 4)) *
    (lit(1.0) - col("l_discount")).cast(DecimalType(8, 4))
  private def charge = revenue * (lit(1.0) + col("l_tax")).cast(DecimalType(8, 4))
  private def psum(c: org.apache.spark.sql.Column) = sum(c).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scan + filter + full aggregation battery (TPC-H Q1 shape) -------
    "q1_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          psum(revenue).as("sum_disc_price"),
          psum(charge).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- fact⋈fact⋈broadcast-dim join + top-k (TPC-H Q3 shape) -----------
    "q3_shipping_priority" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1999-03-15"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1999-03-15"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(psum(revenue).as("rev"))
        .orderBy(col("rev").desc, col("o_orderkey"))
        .limit(10)
    },

    // --- EXISTS via left-semi join (SPARQL Exists / TPC-H Q4 shape) ------
    "q4_order_priority" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // --- multi-way join through broadcast dims (TPC-H Q5 shape) ----------
    "q5_supplier_volume" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1999-01-01"))
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(psum(revenue).as("rev"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // --- pure filter + scalar aggregate (TPC-H Q6 shape) -----------------
    "q6_revenue_delta" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01")
          && col("l_discount") >= 0.02 && col("l_discount") <= 0.08
          && col("l_quantity") < 24)
        .agg(psum(col("l_extendedprice").cast(DecimalType(14, 4)) * col("l_discount").cast(DecimalType(8, 4))).as("rev"),
          count(lit(1)).as("n"))
    },

    // --- window: latest-row-per-key (is_latest pattern, SURVEY §2.5) -----
    "q7_latest_order" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          col("o_orderdate").as("latest_orderdate"))
        .orderBy(col("o_custkey"))
    },

    // --- window: running total per key ----------------------------------
    "q8_running_total" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // --- MINUS as anti join (SPARQL Minus semantics, SURVEY §2.6) --------
    "q9_minus_anti" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")).distinct()
      val open = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_custkey"))
      c.join(open, c("c_custkey") === open("o_custkey"), "left_anti")
        .orderBy(col("c_custkey"))
    },

    // --- dedup-union merge (distributed SELECT merge, SURVEY §2.4) -------
    "q10_union_dedup" -> { (s, d) =>
      val p = Tables.part(s, d)
      val a = p.filter(col("p_size") < 15).select(col("p_brand"))
      val b = p.filter(col("p_type").contains("STEEL")).select(col("p_brand"))
      a.union(b).dropDuplicates().orderBy(col("p_brand"))
    },

    // --- GROUP_CONCAT analog (SPARQL aggregates, SURVEY §2.4) ------------
    "q11_group_concat" -> { (s, d) =>
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("suppliers"),
          count(lit(1)).as("n_suppliers"))
        .orderBy(col("n_name"))
    },

    // --- pagination: sort + offset + limit (listing pages, SURVEY §2.5) --
    "q12_page_offset" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .offset(20).limit(10)
    },

    // --- gated count estimate (SURVEY §2.4) ------------------------------
    "q13_status_counts" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // --- conditional aggregate over a broadcast-dim join (TPC-H Q14) -----
    // promo share of revenue in one month; CASE inside exact-decimal sums,
    // the final ratio is one double division of two exact decimals
    "q14_promo_revenue" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-03-01") && col("l_shipdate") < lit("1997-04-01"))
      val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          psum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0.0).cast(DecimalType(14, 4)))).as("promo_rev"),
          psum(revenue).as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"))
    },

    // --- pre-aggregated semi join (TPC-H Q18: large-volume orders) -------
    // lineitem aggregates FIRST (one shuffle on orderkey, map-side partial
    // sums), the small filtered survivor set then joins orders + broadcast
    // customer — the fact table is never joined row-for-row at full width
    "q18_large_orders" -> { (s, d) =>
      val bigOrders = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      bigOrders.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // --- scalar subquery + anti join (TPC-H Q22 shape) -------------------
    // lapsed rich customers: above-average balance, nothing ordered in the
    // final 14 months; the 1-row average rides a broadcast cross join, the
    // anti-join side prunes to (filtered) order keys only
    "q22_idle_customers" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-06-01"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    // --- grouped view + scalar-max subquery (TPC-H Q15 shape) -----------
    // quarterly revenue per supplier; emit the supplier(s) achieving the
    // maximum. The max rides a 1-row broadcast cross join; the equality
    // compares the EXACT decimal sums (a double round-trip before the
    // compare could merge near-ties differently per engine)
    "q15_top_supplier" -> { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(top))
        .filter(col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // --- correlated average subquery (TPC-H Q17 shape) ------------------
    // revenue lost to small-quantity orders of a brand: per-part average
    // quantity is aggregated ONCE over the fact table and joined back —
    // the decorrelation Catalyst applies to the correlated scalar form
    "q17_small_qty" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val partAvg = l.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      val p = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#2" && col("p_size") <= 10)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(partAvg, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    // --- double-nested EXISTS / NOT EXISTS (TPC-H Q21 shape) ------------
    // sole late shipper on multi-supplier finished orders ("late" adapted
    // to shipdate > orderdate + 60 days: this lineitem set has no
    // commit/receipt dates). Semi + anti join against the same relation,
    // both correlated on (orderkey, <> suppkey)
    "q21_sole_late" -> { (s, d) =>
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      // decorrelated: EXISTS(other supplier, same order) ⇔ the order has
      // ≥2 distinct suppliers; NOT EXISTS(other LATE supplier) ⇔ exactly 1
      // distinct late supplier (l1 itself is late, so it is that one).
      // Two per-order distinct-aggregates + orderkey joins replace the
      // semi + anti SELF-joins — the shuffle carries distinct
      // (order, supplier) pairs instead of full lineitem twice (the sf10
      // probe measured the self-join form at 2× the cost)
      val nSupp = l.groupBy(col("l_orderkey").as("a_orderkey"))
        .agg(countDistinct("l_suppkey").as("n_supp"))
      val nLate = late.groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(countDistinct("l_suppkey").as("n_late"))
      late
        .join(nSupp, col("l_orderkey") === col("a_orderkey"))
        .filter(col("n_supp") >= 2)
        .join(nLate, col("l_orderkey") === col("b_orderkey"))
        .filter(col("n_late") === 1)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // --- INTERSECT set op (completes §2.6: union/minus/intersect) --------
    // high-balance customers who also ordered in 1997; plans as a
    // left-semi aggregate join, no full distinct-sort of either side
    "q24_intersect" -> { (s, d) =>
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val active = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_custkey").as("c_custkey"))
      rich.intersect(active).orderBy(col("c_custkey"))
    },

    // --- ROLLUP multi-grain aggregation ---------------------------------
    // (flag, status) -> (flag) -> () in ONE pass over the partial
    // aggregates (the Expand operator), not one scan per grain
    "q25_rollup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // --- exact grouped percentiles (price-distribution report) ----------
    // percentile() is the exact sort-based aggregate (linear interpolation
    // at rank p·(n−1), same definition as DuckDB's quantile_cont); the f32
    // round-trip on each output absorbs the engines' last-ulp interpolation
    // differences, the same trick as the BM25/tf-idf score keys. At scale
    // the exact path shuffles each group's values once; the approximate
    // alternative (approx_percentile, t-digest) is the knob to turn when a
    // group stops fitting an executor — same query shape either way.
    "q23_percentiles" -> { (s, d) =>
      val ps = Seq(0.25, 0.5, 0.75, 0.95)
      val arr = percentile(col("l_extendedprice"), typedlit(ps))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), arr.as("pcts"))
        .select(col("l_returnflag") +: col("n") +:
          ps.zipWithIndex.map { case (p, i) =>
            element_at(col("pcts"), i + 1).cast("float").cast("double")
              .as(s"p${(p * 100).toInt}")
          }: _*)
        .orderBy(col("l_returnflag"))
    },

    // --- disjunctive multi-column predicates (TPC-H Q19 shape) -----------
    // three OR'd conjunction branches over the join of lineitem x part;
    // Catalyst extracts the common l_quantity/p_size bounds for pushdown
    "q19_disjunctive" -> { (s, d) =>
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(psum(revenue).as("rev"), count(lit(1)).as("n"))
    },

    // --- range (interval-containment) join via bin bucketing -------------
    // a generated 64-range lookup relation (overlapping spans — a point can
    // land in up to 5 ranges) probed by o_orderkey % 16384, so every range
    // is populated at every scale. No native equi-key exists, so the naive
    // plan is a nested-loop filter; [[RangeJoin.binned]] rewrites it to an
    // equi-join on a 256-wide bin id + exact between-filter (PlanSpec pins
    // no-cartesian). The oracle states the declarative BETWEEN join —
    // DuckDB plans its own IEJoin.
    "rj1_range_bin" -> { (s, d) =>
      val ranges = s.range(RjRanges).select(col("id").as("r_id"),
        (col("id") * RjStride).as("lo"),
        (col("id") * RjStride + RjBaseW + (col("id") % 13) * RjWStep).as("hi"))
      val points = Tables.orders(s, d)
        .select(col("o_orderkey"), (col("o_orderkey") % RjDomain).as("pt"))
      RangeJoin.binned(points, col("pt"), ranges, col("lo"), col("hi"), RjBinBits)
        .groupBy(col("r_id"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_orderkey")).as("sum_key"))
        .orderBy(col("r_id"))
    },

    // --- returned-item revenue report (TPC-H Q10 shape) ------------------
    // 4-table join: customer × orders (one quarter) × R-flagged lineitem ×
    // broadcast nation; revenue per customer, top 20 — the classic
    // "who returned the most" report: dims broadcast, the fact join rides
    // the orderkey, top-k is TakeOrdered (never a global sort)
    "q26_returned_revenue" -> { (s, d) =>
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01") &&
          col("o_orderdate") < lit("1997-10-01"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(psum(revenue).as("rev"), count(lit(1)).as("n_items"))
        .orderBy(col("rev").desc, col("c_custkey"))
        .limit(20)
    },

    // --- skew-salted join (hybrid hot/cold) ------------------------------
    // The production mitigation for a shuffle join whose key distribution
    // has heavy hitters: detect hot keys (one map-side-partial count — at
    // 100 TB the cm1/am1 sketches give the same relation without the exact
    // pass), then join the hot slice SALTED (fact side gets salt =
    // l_linenumber % S, dim side replicates each hot row S ways) so one hot
    // key spreads over S reducers instead of stalling one, and the cold
    // slice joins normally. The two slices are disjoint, so
    // union-then-aggregate EQUALS the plain join — which is exactly what
    // the oracle runs. Both joins are pinned as sort-merge (no broadcast):
    // salting only matters when neither side broadcasts.
    "sk1_salted_join" -> { (s, d) =>
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val dim = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      SkewJoin.hybrid(fact, "l_orderkey", col("l_linenumber"),
          dim, "o_orderkey",
          SkewJoin.hotKeysByCount(fact, "l_orderkey", SkHotMin), SkSalts)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }
  )

  // rj1 shared parameters (interpolated into Spark AND oracle from one
  // definition). Stride 256 vs max width 64+12*96=1216: spans overlap up to
  // four successors, so containment is genuinely multi-match.
  private val RjRanges = 64
  private val RjStride = 256L
  private val RjBaseW  = 64L
  private val RjWStep  = 96L
  private val RjDomain = 16384L  // probe key domain: o_orderkey % 16384
  private val RjBinBits = 8      // bin width 256

  // sk1 parameters: keys with ≥ HotMin fact rows take the salted path
  // (lineitem has 1–7 rows per order, so ≥6 marks a real minority slice);
  // hot fact rows spread over Salts reducers.
  private val SkHotMin = 6
  private val SkSalts  = 8

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4)) * CAST(1.0 + l_tax AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        | CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-03-15'
        |  AND l_shipdate > TIMESTAMP '1999-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY rev DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q5_supplier_volume" ->
      """SELECT r_name, n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS rev
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q6_revenue_delta" ->
      """SELECT
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS rev,
        | COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 24""".stripMargin,

    "q7_latest_order" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q8_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q9_minus_anti" ->
      """SELECT DISTINCT c_custkey FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q10_union_dedup" ->
      """SELECT DISTINCT p_brand FROM (
        |  SELECT p_brand FROM part WHERE p_size < 15
        |  UNION ALL
        |  SELECT p_brand FROM part WHERE p_type LIKE '%STEEL%'
        |) t ORDER BY p_brand""".stripMargin,

    "q11_group_concat" ->
      """SELECT n_name,
        | STRING_AGG(s_name, ',' ORDER BY s_name) AS suppliers,
        | COUNT(*) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q12_page_offset" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders ORDER BY o_orderdate, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin,

    "q13_status_counts" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct
        |FROM (
        |  SELECT
        |    CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))
        |      ELSE CAST(0.0 AS DECIMAL(14,4)) END) AS VARCHAR) AS DOUBLE) AS promo_rev,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |) t""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM (
        |  SELECT l_orderkey,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) > 150
        |) bo
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q22_idle_customers" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        | CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(c_acctbal)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(CAST(total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS ap_partkey,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_partkey
        |WHERE p_brand = 'Brand#2' AND p_size <= 10
        |  AND l_quantity < 0.5 * avg_qty""".stripMargin,

    "q21_sole_late" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
        |late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM l JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM l l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q25_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q24_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY c_custkey""".stripMargin,

    "q23_percentiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.25) AS REAL) AS DOUBLE) AS p25,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.5)  AS REAL) AS DOUBLE) AS p50,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.75) AS REAL) AS DOUBLE) AS p75,
        |  CAST(CAST(quantile_cont(l_extendedprice, 0.95) AS REAL) AS DOUBLE) AS p95
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS rev,
        | COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q26_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS rev,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,

    // hot/cold slices are disjoint, so the hybrid ≡ the plain join
    "sk1_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "rj1_range_bin" ->
      s"""WITH ranges AS (
         |  SELECT range AS r_id, range * $RjStride AS lo,
         |         range * $RjStride + $RjBaseW + (range % 13) * $RjWStep AS hi
         |  FROM range($RjRanges))
         |SELECT r_id, lo, hi, COUNT(*) AS n_orders,
         |       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
         |FROM ranges JOIN orders ON (o_orderkey % $RjDomain) BETWEEN lo AND hi
         |GROUP BY 1, 2, 3 ORDER BY r_id""".stripMargin
  )
}
