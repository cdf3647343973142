package graft.layout

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver gates for the physical-layout planners ([[Layout]]) and the
  * deterministic cardinality sketch ([[Sketches]]). Shared operator
  * parameters are interpolated into BOTH the Spark pipeline and its DuckDB
  * oracle from one definition (the PipelineQueries discipline), so one-sided
  * edits cannot silently diverge a gate.
  */
object LayoutQueries {

  /** z-prefix depth: file = top (32 − ZoShift) bits of the 32-bit z-value →
    * ≤ 256 z-files. Fixed prefix depth, not fixed file count: at 100 TB the
    * same shift yields deeper trees by raising it — the plan shape (map-side
    * z arithmetic + one ≤2^k-key agg) is scale-invariant. */
  val ZoShift = 24
  val ZoFiles = 256

  /** zo2 probe rectangle, as percentiles of each dimension's range (computed
    * in-query, so the predicate stays meaningful at every scale factor). */
  val RectXLoPct = 5; val RectXHiPct = 45
  val RectYLoPct = 10; val RectYHiPct = 40

  /** cp1 compaction bin target (rows per bin; stands in for target bytes). */
  val CpTarget = 2500L
  private val WeekMs = 7L * 86400000L

  /** rp1 range-partition fan-out. */
  val RpK = 32

  /** cm1 probe size: the top-K true-frequency tokens get point estimates. */
  val CmProbes = 20

  /** hll3 incremental slice: rows with l_orderkey % Mod == Rem arrive as
    * the appended batch; the rest are the stable base. */
  val HllIncrMod = 5
  val HllIncrRem = 2

  /** ks1 quantile grid (percent). */
  val KsQ = Seq(1, 25, 50, 75, 90, 99)

  /** bf1 member rule: customers with c_custkey % Mod == 0 (at sf0.01 ~500
    * members → bit load ≈ 0.37 → fp ≈ 3%, a non-degenerate grid). */
  val BfMemberMod = 3

  /** bf2 runtime-filter dim predicate: suppliers in nations [0, Max). */
  val BfNationMax = 5

  /** st3 probe ranges as (pctLo, pctHi) of the key domain — full scan,
    * wide, bucket-interior, wide-tail, and sub-bucket-narrow. */
  val St3Ranges = Seq((0, 100), (5, 25), (40, 45), (50, 95), (90, 91))

  /** st5 column pairs probed for correlation / functional dependency. */
  val St5Pairs = Seq(("l_orderkey", "l_linenumber"),
    ("l_orderkey", "l_partkey"), ("l_partkey", "l_suppkey"),
    ("l_returnflag", "l_linestatus"), ("l_quantity", "l_tax"))

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** Shared by zo1/zo2: rows with min-max-normalized 16-bit dimension
    * positions, their z-file (top bits of the Morton value of the SCALED
    * coords — scaling is what spreads any key range across the full z
    * domain), and the insertion-order file for the zo2 comparison. Zone
    * maps keep ORIGINAL coordinates (that is what a scan predicate sees). */
  private def zRows(s: SparkSession, d: String): DataFrame = {
    val base = li(s, d).select(col("l_partkey").as("x"),
      col("l_suppkey").as("y"), col("l_orderkey"))
    val bounds = base.agg(
      min("x").as("x_min"), max("x").as("x_max"),
      min("y").as("y_min"), max("y").as("y_max"),
      min("l_orderkey").as("ok_lo"), max("l_orderkey").as("ok_hi"))
    base.crossJoin(broadcast(bounds))
      .withColumn("xs", expr("((x - x_min) * 65536) div (x_max - x_min + 1)"))
      .withColumn("ys", expr("((y - y_min) * 65536) div (y_max - y_min + 1)"))
      .withColumn("zfile",
        shiftright(Layout.zValue(col("xs"), col("ys")), ZoShift))
      .withColumn("lfile",
        expr(s"((l_orderkey - ok_lo) * $ZoFiles) div (ok_hi - ok_lo + 1)"))
      .withColumn("rxlo", expr(s"x_min + ((x_max - x_min) * $RectXLoPct) div 100"))
      .withColumn("rxhi", expr(s"x_min + ((x_max - x_min) * $RectXHiPct) div 100"))
      .withColumn("rylo", expr(s"y_min + ((y_max - y_min) * $RectYLoPct) div 100"))
      .withColumn("ryhi", expr(s"y_min + ((y_max - y_min) * $RectYHiPct) div 100"))
  }

  /** DuckDB mirror of [[zRows]]. */
  private val zRowsSql: String = {
    val xs = "(((x - x_min) * 65536) // (x_max - x_min + 1))"
    val ys = "(((y - y_min) * 65536) // (y_max - y_min + 1))"
    s"""base AS (SELECT l_partkey AS x, l_suppkey AS y, l_orderkey FROM lineitem),
       |b AS (SELECT MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min,
       |             MAX(y) AS y_max, MIN(l_orderkey) AS ok_lo,
       |             MAX(l_orderkey) AS ok_hi FROM base),
       |rows_ AS (SELECT x, y, l_orderkey,
       |    (${Layout.zValueSql(xs, ys)} >> $ZoShift) AS zfile,
       |    ((l_orderkey - ok_lo) * $ZoFiles) // (ok_hi - ok_lo + 1) AS lfile,
       |    x_min + ((x_max - x_min) * $RectXLoPct) // 100 AS rxlo,
       |    x_min + ((x_max - x_min) * $RectXHiPct) // 100 AS rxhi,
       |    y_min + ((y_max - y_min) * $RectYLoPct) // 100 AS rylo,
       |    y_min + ((y_max - y_min) * $RectYHiPct) // 100 AS ryhi
       |  FROM base, b)""".stripMargin
  }

  /** hll1 per-key precision: raw HLL is valid for n ≳ 2.5·16^p, so the
    * high-cardinality orderkey uses m=4096 while the ≤2k-distinct keys use
    * m=256 — the precision knob every HLL library exposes, shared between
    * the Spark pipeline and the oracle. */
  val Hll1P = Seq(("lineitem.l_orderkey", "lineitem", "l_orderkey", 3),
    ("lineitem.l_partkey", "lineitem", "l_partkey", 2),
    ("orders.o_custkey", "orders", "o_custkey", 2))

  // One sketch row: sketch + exact cardinality + error in basis points,
  // everything integer so the oracle compare is exact.
  private def hllRow(name: String, df: DataFrame,
      key: org.apache.spark.sql.Column, p: Int): DataFrame =
    df.agg(countDistinct(key).as("n_exact"))
      .crossJoin(Sketches.estimate(Sketches.registers(df, key, Nil, p), Nil, p))
      .select(lit(name).as("key_name"), col("n_exact"), col("hll_est"),
        expr("abs(hll_est - n_exact) * 10000 div n_exact").as("err_bp"))

  // One KMV sketch row (mirror of [[hllRow]]): the UDAF's map-side partial
  // means the shuffle carries one ≤k-long array per partition, never keys.
  private def kmvRow(name: String, df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val sk = df.select(Kmv.hash(key).as("h"))
      .agg(Kmv.agg()(col("h")).as("sk"))
      .select(col("sk.values").as("sk"))
    df.agg(countDistinct(key).as("n_exact"))
      .crossJoin(sk)
      .select(lit(name).as("key_name"), col("n_exact"),
        Kmv.estimate("sk").as("kmv_est"))
      .withColumn("err_bp", expr("abs(kmv_est - n_exact) * 10000 div n_exact"))
  }

  private def kmvBlockSql(name: String, tbl: String, key: String): String =
    s"""SELECT '$name' AS key_name, x.n_exact, e.kmv_est,
       |  abs(e.kmv_est - x.n_exact) * 10000 // x.n_exact AS err_bp
       |FROM (SELECT COUNT(DISTINCT $key) AS n_exact FROM $tbl) x,
       |     (WITH sk AS (${Kmv.sketchSql(tbl, key)}),
       |           s AS (SELECT COUNT(*) AS sz, MAX(h) AS hk FROM sk)
       |      SELECT ${Kmv.estimateSql()} AS kmv_est FROM s) e""".stripMargin

  /** st1 column grid: (name, kind) — the ANALYZE-style stats targets. */
  val St1Cols = Seq(
    "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
    "l_linenumber" -> "num", "l_quantity" -> "num", "l_extendedprice" -> "num",
    "l_discount" -> "num", "l_tax" -> "num",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  // One ANALYZE row per column; each is a single narrow scan (parquet
  // column pruning reads ONE column per pass — cheaper than a multi-
  // countDistinct EXPAND over the full width). min/max pass through as the
  // column's own domain (DOUBLE / VARCHAR / formatted timestamp) — no
  // cross-engine float formatting.
  private def statRow(df: DataFrame, c: String, kind: String): DataFrame = {
    val common = Seq(count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col(c)).as("n_distinct"))
    val nullS = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    val agged = kind match {
      case "num" => df.agg(common.head, common.tail ++ Seq(
        min(col(c)).cast("double").as("min_d"),
        max(col(c)).cast("double").as("max_d"),
        nullS.as("min_s"), nullS.as("max_s")): _*)
      case "str" => df.agg(common.head, common.tail ++ Seq(
        nullD.as("min_d"), nullD.as("max_d"),
        min(col(c)).as("min_s"), max(col(c)).as("max_s")): _*)
      case "ts" => df.agg(common.head, common.tail ++ Seq(
        nullD.as("min_d"), nullD.as("max_d"),
        date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as("min_s"),
        date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as("max_s")): _*)
    }
    agged.select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
      col("n_distinct"), col("min_d"), col("max_d"), col("min_s"), col("max_s"))
  }

  private def statBlockSql(c: String, kind: String): String = {
    val (minD, maxD, minS, maxS) = kind match {
      case "num" => (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)",
        "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      case "str" => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        s"MIN($c)", s"MAX($c)")
      case "ts" => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S')",
        s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S')")
    }
    s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  $minD AS min_d, $maxD AS max_d, $minS AS min_s, $maxS AS max_s
       |FROM lineitem""".stripMargin
  }

  /** st2 join grid: (join_name, left table, left key, right table, right
    * key) — the equi-joins whose output size the System-R containment
    * formula estimates from st1-style stats. */
  val St2Joins = Seq(
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"))

  private def tableOf(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "lineitem" => Tables.lineitem(s, d)
      case "orders"   => Tables.orders(s, d)
      case "part"     => Tables.part(s, d)
      case "supplier" => Tables.supplier(s, d)
      case "customer" => Tables.customer(s, d)
    }

  /** One estimate-vs-truth row per join: |A⋈B| ≈ |A|·|B| / max(ndv_A(k),
    * ndv_B(k)) — the Selinger containment-of-value-sets estimate every
    * cost-based optimizer starts from. Stats are two single-key aggregates
    * (what ANALYZE maintains); truth is the actual join count. All integer
    * arithmetic, so estimate AND error reproduce bit-for-bit in the
    * oracle. */
  private def st2Row(s: SparkSession, d: String, j: (String, String, String,
      String, String)): DataFrame = {
    val (name, lt, lk, rt, rk) = j
    val l = tableOf(s, d, lt)
    val r = tableOf(s, d, rt)
    val lStats = l.agg(count(lit(1)).as("n_left"),
      countDistinct(col(lk)).as("ndv_left"))
    val rStats = r.agg(count(lit(1)).as("n_right"),
      countDistinct(col(rk)).as("ndv_right"))
    val actual = l.select(col(lk)).join(r.select(col(rk)),
        col(lk) === col(rk))
      .agg(count(lit(1)).as("actual_rows"))
    lStats.crossJoin(rStats).crossJoin(actual)
      .select(lit(name).as("join_name"), col("n_left"), col("ndv_left"),
        col("n_right"), col("ndv_right"),
        expr("n_left * n_right div greatest(ndv_left, ndv_right)").as("est_rows"),
        col("actual_rows"),
        expr("abs(n_left * n_right div greatest(ndv_left, ndv_right) - actual_rows) * 10000 div actual_rows")
          .as("err_bp"))
  }

  private def st2BlockSql(j: (String, String, String, String, String)): String = {
    val (name, lt, lk, rt, rk) = j
    s"""SELECT '$name' AS join_name, ls.n_left, ls.ndv_left,
       |  rs.n_right, rs.ndv_right,
       |  ls.n_left * rs.n_right // greatest(ls.ndv_left, rs.ndv_right) AS est_rows,
       |  a.actual_rows,
       |  abs(ls.n_left * rs.n_right // greatest(ls.ndv_left, rs.ndv_right)
       |      - a.actual_rows) * 10000 // a.actual_rows AS err_bp
       |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_left,
       |             CAST(COUNT(DISTINCT $lk) AS BIGINT) AS ndv_left FROM $lt) ls,
       |     (SELECT CAST(COUNT(*) AS BIGINT) AS n_right,
       |             CAST(COUNT(DISTINCT $rk) AS BIGINT) AS ndv_right FROM $rt) rs,
       |     (SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
       |      FROM $lt JOIN $rt ON $lk = $rk) a""".stripMargin
  }

  /** am1 key grid: self-join size (F2) of these lineitem keys. */
  val Am1Keys = Seq(("lineitem.l_partkey", "l_partkey"),
    ("lineitem.l_suppkey", "l_suppkey"))

  private def amsRow(name: String, df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * c")).as("true_f2"))
      .crossJoin(Sketches.amsEstimate(Sketches.amsZ(df, key)))
      .select(lit(name).as("key_name"), col("true_f2"), col("est_f2"),
        expr("abs(est_f2 - true_f2) * 10000 div true_f2").as("err_bp"))

  private def amsBlockSql(name: String, tbl: String, key: String): String =
    s"""SELECT '$name' AS key_name, x.true_f2, e.est_f2,
       |  CAST(abs(e.est_f2 - x.true_f2) * 10000 // x.true_f2 AS BIGINT) AS err_bp
       |FROM (SELECT CAST(SUM(c * c) AS BIGINT) AS true_f2
       |      FROM (SELECT COUNT(*) AS c FROM $tbl GROUP BY $key)) x,
       |     (WITH z AS (${Sketches.amsZSql(tbl, key)})
       |      SELECT ${Sketches.amsEstimateSql} AS est_f2 FROM z) e""".stripMargin

  private def hllBlockSql(name: String, tbl: String, key: String, p: Int): String =
    s"""SELECT '$name' AS key_name, x.n_exact, e.hll_est,
       |  abs(e.hll_est - x.n_exact) * 10000 // x.n_exact AS err_bp
       |FROM (SELECT COUNT(DISTINCT $key) AS n_exact FROM $tbl) x,
       |     (WITH regs AS (SELECT bucket, MAX(rho) AS rho
       |                    FROM (${Sketches.rhoPairsSql(tbl, key, Nil, p)}) GROUP BY bucket),
       |           s AS (${Sketches.summarySql()})
       |      SELECT ${Sketches.estimateSql(p)} AS hll_est FROM s) e""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order clustering: per-z-file zone maps (count + per-dimension
    // bounding box in ORIGINAL coordinates). Map-side bit arithmetic + one
    // ≤256-key aggregation.
    "zo1_zorder_layout" -> { (s, d) =>
      zRows(s, d)
        .groupBy(col("zfile").as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("x_lo"), max("x").as("x_hi"),
          min("y").as("y_lo"), max("y").as("y_hi"))
        .orderBy("file_id")
    },

    // Zone-map pruning: how many files/rows a 2-D range predicate reads
    // under z-order layout vs. insertion-order (l_orderkey range) layout.
    // The whole point of z-ordering in one row: scan_z ≪ scan_lin for the
    // same matched rows.
    "zo2_zorder_prune" -> { (s, d) =>
      val rows = zRows(s, d)
      def scanStats(fileCol: String, tot: String, hit: String, scan: String) = {
        val zones = rows.groupBy(col(fileCol))
          .agg(count(lit(1)).as("n"), min("x").as("xl"), max("x").as("xh"),
            min("y").as("yl"), max("y").as("yh"),
            min("rxlo").as("rxlo"), min("rxhi").as("rxhi"),
            min("rylo").as("rylo"), min("ryhi").as("ryhi"))
        val isHit = col("xl") <= col("rxhi") && col("xh") >= col("rxlo") &&
          col("yl") <= col("ryhi") && col("yh") >= col("rylo")
        zones.agg(count(lit(1)).as(tot),
          sum(when(isHit, 1L).otherwise(0L)).as(hit),
          sum(when(isHit, col("n")).otherwise(0L)).as(scan))
      }
      val matched = rows.filter(col("x") >= col("rxlo") && col("x") <= col("rxhi") &&
        col("y") >= col("rylo") && col("y") <= col("ryhi"))
        .agg(count(lit(1)).as("n_match"))
      scanStats("zfile", "z_files", "z_files_hit", "z_rows_scan")
        .crossJoin(scanStats("lfile", "lin_files", "lin_files_hit", "lin_rows_scan"))
        .crossJoin(matched)
    },

    // Compaction planning: weekly order "files" packed into target-row bins
    // by one cumulative-sum pass over the size-descending file list — the
    // small-file compaction planner as a relational query (no driver loop).
    "cp1_compaction_plan" -> { (s, d) =>
      val files = Tables.orders(s, d)
        .select(expr(s"unix_millis(cast(o_orderdate as timestamp)) div $WeekMs")
          .as("file_week"))
        .groupBy("file_week").agg(count(lit(1)).as("size_rows"))
      // file-METADATA relation (≤ ~800k rows even at 100 TB), so the
      // single-partition cumsum window is bounded by catalog size, not data
      val w = Window.orderBy(col("size_rows").desc, col("file_week"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      files.withColumn("cum", sum("size_rows").over(w))
        .withColumn("bin_id", expr(s"(cum - size_rows) div $CpTarget"))
        .groupBy("bin_id")
        .agg(count(lit(1)).as("n_files"), sum("size_rows").as("bin_rows"),
          max("size_rows").as("largest_file"))
        .orderBy("bin_id")
    },

    // Compaction EXECUTION (cp1 is the plan, this is the rewrite): the
    // file→bin map broadcasts onto the row scan, one repartition(bin_id) +
    // partitionBy(bin_id) write IS the compaction — each bin lands as one
    // file written by one task. The gate reads the compacted table back
    // and reconciles per-bin files/rows against the plan (the cp1 oracle
    // aggregate), so the physical rewrite provably preserved the data.
    "cp2_compaction_apply" -> { (s, d) =>
      val rows = Tables.orders(s, d).withColumn("file_week",
        expr(s"unix_millis(cast(o_orderdate as timestamp)) div $WeekMs"))
      val files = rows.groupBy("file_week").agg(count(lit(1)).as("size_rows"))
      val w = Window.orderBy(col("size_rows").desc, col("file_week"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val plan = files.withColumn("cum", sum("size_rows").over(w))
        .withColumn("bin_id", expr(s"(cum - size_rows) div $CpTarget"))
        .select("file_week", "bin_id")
      // per-invocation scratch dir: concurrent runs of the same dataset
      // (or two users on a shared host) must never race on mode(overwrite)
      val path = java.nio.file.Files
        .createTempDirectory("graft-compact-").toString
      rows.join(broadcast(plan), "file_week")
        .repartition(col("bin_id"))
        .write.mode("overwrite").partitionBy("bin_id").parquet(path)
      s.read.parquet(path)
        .groupBy(col("bin_id").cast("long").as("bin_id"))
        .agg(countDistinct("file_week").as("n_files"),
          count(lit(1)).as("bin_rows"))
        .orderBy("bin_id")
    },

    // Range-partition planning: exact split points + per-range balance from
    // a key histogram. The gate pins the exact-histogram contract; at full
    // scale the identical boundary relation is fed from a sample (Spark
    // RangePartitioner-style) — the plan shape downstream is unchanged.
    "rp1_range_plan" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val hist = o.groupBy(col("o_totalprice").as("k")).agg(count(lit(1)).as("cnt"))
      val total = o.agg(count(lit(1)).as("n_total"))
      val w = Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.crossJoin(broadcast(total))
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("bucket", expr(s"((cum - cnt) * $RpK) div n_total"))
        .groupBy("bucket")
        .agg(sum("cnt").as("n_rows"), min("k").as("lo"), max("k").as("hi"))
        .orderBy("bucket")
    },

    // HyperLogLog distinct sketch over three key columns: engine-exact
    // integer estimate + true cardinality + error in basis points.
    "hll1_distinct_sketch" -> { (s, d) =>
      Hll1P.map { case (name, tbl, key, p) =>
        hllRow(name, Tables.read(s, d, tbl), col(key), p)
      }.reduce(_ unionByName _).orderBy("key_name")
    },

    // Maintained sketch: the register table built from the stable slice and
    // incrementally folded with the held-out batch (Store.hllRegsIncr; the
    // fold never rescans the base) must estimate EXACTLY like the direct
    // full-corpus sketch — which is what the oracle computes.
    "hll3_incremental" -> { (s, d) =>
      val regs = graft.Store.hllRegsIncr(s, d, HllIncrMod, HllIncrRem)
      li(s, d).agg(countDistinct(col("l_orderkey")).as("n_exact"))
        .crossJoin(Sketches.estimate(regs))
        .select(lit("lineitem.l_orderkey").as("key_name"),
          col("n_exact"), col("hll_est"))
    },

    // Count-Min frequency sketch over the corpus token stream: the d×w
    // counter matrix (one ≤d·w-cell shuffle, map-side partial sums), point
    // estimates for the top-true-frequency tokens — est_n ≥ true_n always,
    // within the e/w overestimate bound at sketch size 4×1024.
    "cm1_countmin" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("k"))
      val counters = Sketches.cmsCounters(toks, col("k"))
      val probes = toks.groupBy("k").agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("k")).limit(CmProbes)
      Sketches.cmsEstimate(probes, counters, Seq("true_n"))
        .select(col("k").as("word"), col("true_n"), col("est_n"))
        .orderBy("word")
    },

    // KMV bottom-k distinct sketch over the hll1 key grid: the typed
    // Aggregator keeps the k smallest distinct 60-bit hashes; estimate is
    // one big-integer division, exact-integer in both engines.
    "kmv1_bottomk_sketch" -> { (s, d) =>
      Hll1P.map { case (name, tbl, key, _) =>
        kmvRow(name, Tables.read(s, d, tbl), col(key))
      }.reduce(_ unionByName _).orderBy("key_name")
    },

    // KMV mergeability: bottom-k of a union of per-group bottom-ks IS the
    // union's bottom-k, so re-aggregating exploded sketch values is the
    // distributed merge — per-returnflag sketches merged must estimate
    // EXACTLY like a direct sketch of all rows.
    "kmv2_merge_sketch" -> { (s, d) =>
      val e = li(s, d).select(col("l_returnflag").as("grp"), col("l_orderkey"))
      val kmv = Kmv.agg()
      val skG = e.select(col("grp"), Kmv.hash(col("l_orderkey")).as("h"))
        .groupBy("grp").agg(kmv(col("h")).as("sk"))
        .select(col("grp"), col("sk.values").as("sk"))
      val perGrp = skG.select(col("grp"), Kmv.estimate("sk").as("kmv_est"))
        .join(e.groupBy("grp").agg(countDistinct("l_orderkey").as("n_exact")), "grp")
      val merged = skG.select(explode(col("sk")).as("h"))
        .agg(kmv(col("h")).as("sk")).select(col("sk.values").as("sk"))
        .select(lit("ALL").as("grp"), Kmv.estimate("sk").as("kmv_est"))
        .crossJoin(e.agg(countDistinct("l_orderkey").as("n_exact")))
      perGrp.select(col("grp"), col("n_exact"), col("kmv_est"))
        .unionByName(merged.select(col("grp"), col("n_exact"), col("kmv_est")))
        .orderBy("grp")
    },

    // Maintained KMV sketch: base-slice sketch folded with the appended
    // batch (Store.kmvIncr — the fold never rescans the base) must estimate
    // EXACTLY like the direct full-corpus sketch the oracle computes.
    "kmv3_incremental" -> { (s, d) =>
      val sk = graft.Store.kmvIncr(s, d, HllIncrMod, HllIncrRem)
      li(s, d).agg(countDistinct(col("l_orderkey")).as("n_exact"))
        .crossJoin(sk)
        .select(lit("lineitem.l_orderkey").as("key_name"),
          col("n_exact"), Kmv.estimate("sk").as("kmv_est"))
    },

    // Sample-quantile sketch: the KMV sketch of a UNIQUE key doubles as a
    // deterministic uniform row sample (the bottom-k hash threshold selects
    // the sample), so order statistics of the sample estimate the table's.
    // est/true are table VALUES passed through untouched (no float
    // arithmetic), so the compare is exact; truth is the gate's
    // verification artifact — production reads only the sample side.
    // KMV set-operation estimates (Beyer et al. 2007): the union sketch is
    // the bottom-k merge of the two side sketches, the Jaccard fraction is
    // counted INSIDE it, and intersection/difference cardinalities follow
    // by one integer multiply-divide — set arithmetic over 8 KB summaries
    // instead of a distinct-join of the full key sets. Exact counts ride
    // along for the basis-point error columns.
    "ks2_set_ops" -> { (s, d) =>
      val l = li(s, d)
      val kmv = Kmv.agg()
      def sideSketch(flag: String, as: String) =
        l.filter(col("l_returnflag") === flag)
          .select(Kmv.hash(col("l_orderkey")).as("h"))
          .agg(kmv(col("h")).as("sk")).select(col("sk.values").as(as))
      val exact = l.filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_orderkey").as("k"), col("l_returnflag").as("f"))
        .distinct()
        .groupBy("k").agg(count(lit(1)).as("nf"), min("f").as("mf"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("nf") === 2, 1L).otherwise(0L)).as("exact_inter"),
          sum(when(col("nf") === 1 && col("mf") === "R", 1L).otherwise(0L))
            .as("exact_onlya"))
      sideSketch("R", "ska").crossJoin(sideSketch("A", "skb"))
        .withColumn("sku",
          slice(array_sort(array_union(col("ska"), col("skb"))), 1, Kmv.K))
        .withColumn("n_u", size(col("sku")).cast("long"))
        .withColumn("n_both", size(filter(col("sku"), x =>
          array_contains(col("ska"), x) && array_contains(col("skb"), x)))
          .cast("long"))
        .withColumn("n_onlya", size(filter(col("sku"), x =>
          array_contains(col("ska"), x) && !array_contains(col("skb"), x)))
          .cast("long"))
        .withColumn("union_est", Kmv.estimate("sku"))
        .withColumn("inter_est", expr("n_both * union_est div n_u"))
        .withColumn("onlya_est", expr("n_onlya * union_est div n_u"))
        .crossJoin(exact)
        .select(col("union_est"), col("exact_union"),
          expr("abs(union_est - exact_union) * 10000 div exact_union").as("union_err_bp"),
          col("inter_est"), col("exact_inter"),
          expr("abs(inter_est - exact_inter) * 10000 div exact_inter").as("inter_err_bp"),
          col("onlya_est"), col("exact_onlya"),
          expr("abs(onlya_est - exact_onlya) * 10000 div exact_onlya").as("onlya_err_bp"))
    },

    "ks1_sample_quantiles" -> { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      val thr = o.select(Kmv.hash(col("o_orderkey")).as("h"))
        .agg(Kmv.agg()(col("h")).as("sk"))
        .select(element_at(col("sk.values"), -1).as("hk"))
      val samp = o.select(col("o_totalprice"), Kmv.hash(col("o_orderkey")).as("h"))
        .crossJoin(broadcast(thr)).filter(col("h") <= col("hk"))
      val sRank = samp
        .withColumn("rn", row_number().over(
          Window.orderBy(col("o_totalprice"), col("h"))))
        .crossJoin(broadcast(samp.agg(count(lit(1)).as("n_s"))))
      // truth-side global rank WITHOUT a single-partition sort (the sf10
      // finding): deterministic value-range buckets from min/max, parallel
      // per-bucket row_number, plus a ≤NB-row cumulative offset join —
      // two-phase exact selection, scale-safe
      val NB = 64
      val bounds = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      val bucketed = o.crossJoin(broadcast(bounds))
        .withColumn("pid", least(lit(NB - 1), greatest(lit(0),
          floor((col("o_totalprice") - col("lo")) * NB /
            (col("hi") - col("lo") + lit(1e-9))).cast("int"))))
      val offs = bucketed.groupBy("pid").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum("c").over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("pid"), col("off"))
      val tRank = bucketed
        .withColumn("prn", row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
        .join(broadcast(offs), "pid")
        .withColumn("rn", (col("off") + col("prn")).cast("int"))
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n_total"))))
      val qdf = s.sql(s"SELECT explode(array(${KsQ.mkString(",")})) AS q_pct")
      val est = sRank.crossJoin(broadcast(qdf))
        .filter(col("rn") === expr("(q_pct * (n_s - 1)) div 100 + 1"))
        .select(col("q_pct"), col("o_totalprice").as("est_price"))
      val tru = tRank.crossJoin(broadcast(qdf))
        .filter(col("rn") === expr("(q_pct * (n_total - 1)) div 100 + 1"))
        .select(col("q_pct"), col("o_totalprice").as("true_price"))
      est.join(tru, "q_pct").orderBy("q_pct")
    },

    // ANALYZE-style table stats: per-column rows/nulls/NDV/min/max — the
    // relation a cost-based planner reads before choosing join sides.
    // Eleven narrow single-column scans (column pruning), one output row
    // each; at 100 TB NDV swaps to the hll/kmv sketch, same shape.
    "st1_table_stats" -> { (s, d) =>
      St1Cols.map { case (c, kind) => statRow(li(s, d), c, kind) }
        .reduce(_ unionByName _).orderBy("col_name")
    },

    // Selinger containment-of-value-sets join-size estimation vs truth:
    // the st1 stats feeding the formula a cost-based planner uses to pick
    // join order/strategy. PK-FK joins estimate near-exactly (err_bp 0);
    // the estimate and its error are integer arithmetic end to end.
    "st2_join_card" -> { (s, d) =>
      St2Joins.map(st2Row(s, d, _)).reduce(_ unionByName _)
        .orderBy("join_name")
    },

    // AMS tug-of-war F2 sketch: self-join-size estimation from d signed
    // running sums — the planner input that decides whether a key is safe
    // to shuffle-join at scale. One narrow pass; sketches merge by adding.
    "am1_f2_selfjoin" -> { (s, d) =>
      Am1Keys.map { case (name, key) => amsRow(name, li(s, d), col(key)) }
        .reduce(_ unionByName _).orderBy("key_name")
    },

    // Maintained Count-Min matrix: base counters + cell-wise-summed batch
    // counters (Store.cmsIncr — the fold never rescans the base stream)
    // must point-estimate EXACTLY like the direct full-corpus matrix the
    // oracle computes. Completes the maintained-sketch triple
    // (hll3 max-merge, kmv3 bottom-k-merge, cm2 add-merge).
    "cm2_countmin_incr" -> { (s, d) =>
      val counters = graft.Store.cmsIncr(s, d, HllIncrMod, HllIncrRem)
      val toks = Tables.documents(s, d)
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("k"))
      val probes = toks.groupBy("k").agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("k")).limit(CmProbes)
      Sketches.cmsEstimate(probes, counters, Seq("true_n"))
        .select(col("k").as("word"), col("true_n"), col("est_n"))
        .orderBy("word")
    },

    // Sketch mergeability: per-returnflag register sets, merged by MAX(rho)
    // per bucket, must estimate the union EXACTLY as a direct sketch of the
    // union would — the property that makes HLL a distributed aggregate.
    "hll2_union_sketch" -> { (s, d) =>
      val e = li(s, d).select(col("l_returnflag").as("grp"), col("l_orderkey"))
      val regsG = Sketches.registers(e, col("l_orderkey"), Seq("grp"))
      val perGrp = Sketches.estimate(regsG, Seq("grp"))
        .join(e.groupBy("grp").agg(countDistinct("l_orderkey").as("n_exact")), "grp")
      val merged = Sketches.estimate(
          regsG.groupBy("bucket").agg(max("rho").as("rho")))
        .withColumn("grp", lit("ALL"))
        .crossJoin(e.agg(countDistinct("l_orderkey").as("n_exact")))
      perGrp.select(col("grp"), col("n_exact"), col("hll_est"))
        .unionByName(merged.select(col("grp"), col("n_exact"), col("hll_est")))
        .orderBy("grp")
    },

    // Bloom membership sketch: words built from the member set (one tiny
    // bit_or aggregation), probed by every customer — never a false
    // negative (n_pass ≥ n_member per segment, pinned by the exact counts),
    // false positives measured against ground truth. The per-segment grid
    // is the bf operating-point report a pipeline reads before trusting the
    // filter.
    "bf1_bloom_fp" -> { (s, d) =>
      val cust = Tables.customer(s, d)
      val words = Sketches.bloomBuild(
        cust.filter(col("c_custkey") % BfMemberMod === 0), col("c_custkey"))
      val probes = cust.select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"),
        (col("c_custkey") % BfMemberMod === 0).cast("int").as("is_member"))
      Sketches.bloomContains(probes, words, Seq("seg", "is_member"))
        .groupBy("seg").agg(
          count(lit(1)).as("n_probe"),
          count(when(col("is_member") === 1, 1)).as("n_member"),
          count(when(col("bf_pass"), 1)).as("n_pass"),
          count(when(col("bf_pass") && col("is_member") === 0, 1)).as("n_fp"))
        .orderBy("seg")
    },

    // Runtime-filter join pruning (the pattern behind Spark's own
    // spark.sql.optimizer.runtime.bloomFilter): the selective dim side's
    // key bloom collapses to a ≤m/32-long literal array, applied as a
    // codegen'd predicate on the fact scan BEFORE the shuffle join — at
    // 100 TB the shuffle carries only pass rows (true matches + the fp
    // tail) instead of the full fact table. Never-false-negative makes the
    // result EQUAL the plain join, which is exactly what the oracle runs.
    "bf2_bloom_join" -> { (s, d) =>
      val dim = Tables.supplier(s, d)
        .filter(col("s_nationkey") < BfNationMax)
        .select(col("s_suppkey"), col("s_nationkey"))
      val w = Sketches.bloomBuild(dim, col("s_suppkey"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      val arr = (0 until Sketches.bloomNWords)
        .map(i => w.getOrElse(i, 0L)).mkString("array(", "L, ", "L)")
      li(s, d)
        .filter(Sketches.bloomFilterCol(col("l_suppkey"), expr(arr)))
        .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), Tables.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("s_nationkey")
    },

    // Equi-width histogram → range-selectivity estimation: the third
    // planner stat beside st1 (rows/ndv/min-max) and st2 (join
    // cardinality). The ≤B-row histogram is built with map-side partial
    // counts (per-partition histograms MERGE BY ADDING, like cm); range
    // estimates interpolate within buckets in exact integer arithmetic.
    // The truth side (one broadcast-replicated conditional count) is the
    // gate's verification artifact — production reads only the estimate.
    "st3_histogram_sel" -> { (s, d) =>
      val base = li(s, d).select(col("l_partkey").as("x"))
      val bounds = base.agg(min("x").as("lo"), max("x").as("hi"))
        .select(col("lo"), (col("hi") - col("lo") + 1).as("dd"))
      val hist = base.crossJoin(broadcast(bounds))
        .groupBy(expr(Sketches.histBucketSql("x", "lo", "dd", "div")).as("k"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(bounds))
        .withColumn("bk_lo", expr(Sketches.histLoSql("k", "lo", "dd", "div")))
        .withColumn("bk_hi", expr(Sketches.histHiSql("k", "lo", "dd", "div")))
      val rdf = s.sql(St3Ranges.zipWithIndex.map { case ((p1, p2), i) =>
          s"SELECT $i AS r_id, $p1 AS p_lo, $p2 AS p_hi" }
          .mkString(" UNION ALL "))
        .crossJoin(broadcast(bounds))
        .withColumn("a", expr("lo + dd * p_lo div 100"))
        .withColumn("b", expr("lo + dd * p_hi div 100"))
        .select("r_id", "a", "b")
      val est = hist.crossJoin(broadcast(rdf))
        .groupBy("r_id", "a", "b")
        .agg(sum(expr(Sketches.histEstTermSql("a", "b", "div"))).as("est_rows"))
      val truth = base.crossJoin(broadcast(rdf))
        .filter(col("x").between(col("a"), col("b")))
        .groupBy("r_id").agg(count(lit(1)).as("true_rows"))
      est.join(truth, "r_id")
        .select(col("r_id"), col("a"), col("b"), col("est_rows"),
          col("true_rows"),
          expr("abs(est_rows - true_rows) * 10000 div greatest(true_rows, 1)")
            .as("err_bp"))
        .orderBy("r_id")
    },

    // Rolling-window quantile via sketch reuse — the quantile twin of
    // hll4: per-day KMV bottom-k sketches (of the unique event_id) merge
    // into every trailing 7-day window (bottom-k of a union of bottom-ks
    // IS the union's bottom-k), the merged threshold h_k selects a
    // deterministic uniform sample of the window's rows, and the sample
    // median estimates the window median. Exact per-window medians (the
    // 7×-amplified recount) are the verification artifact only. Values
    // pass through untouched — the compare is exact.
    "ks4_rolling_quantile" -> { (s, d) =>
      val ev = Tables.events(s, d).select(
        expr("ts div 86400000000000").as("day"), col("event_id"), col("value"))
      val days = ev.select("day").distinct()
      val fan = explode(array((0 until 7).map(k => col("day") + lit(k)): _*))
      val kmv = Kmv.agg()
      val skD = ev.select(col("day"), Kmv.hash(col("event_id")).as("h"))
        .groupBy("day").agg(kmv(col("h")).as("sk"))
        .select(col("day"), col("sk.values").as("sk"))
      val thr = skD.withColumn("out_day", fan)
        .join(days.select(col("day").as("out_day")), Seq("out_day"))
        .select(col("out_day"), explode(col("sk")).as("h"))
        .groupBy("out_day").agg(kmv(col("h")).as("sk"))
        .select(col("out_day"), element_at(col("sk.values"), -1).as("hk"))
      // the 7x fan-out is consumed four times (the sampled and exact
      // median passes each read their input twice through the rank +
      // count pair) — persist it once instead of re-exploding per branch
      val fanned = ev.withColumn("out_day", fan)
        .join(days.select(col("day").as("out_day")), Seq("out_day"))
        .withColumn("h", Kmv.hash(col("event_id")))
        .persist()
      graft.Caches.track(fanned)
      val sample = fanned.join(broadcast(thr), Seq("out_day"))
        .filter(col("h") <= col("hk"))
      def medianOf(df: DataFrame,
          ord: Seq[org.apache.spark.sql.Column], out: String) = {
        // rank and group count as two windows over the SAME partitioning
        // (one exchange, one pass) — the groupBy+self-join spelling this
        // replaces re-executed `df`'s whole lineage for the count side
        val w = Window.partitionBy(col("out_day")).orderBy(ord: _*)
        df.withColumn("rn", row_number().over(w))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy(col("out_day"))))
          .filter(col("rn") === expr("(cnt - 1) div 2 + 1"))
          .select(col("out_day"), col("value").as(out))
      }
      medianOf(sample, Seq(col("value"), col("h")), "est_median")
        .join(medianOf(fanned, Seq(col("value"), col("event_id")),
          "true_median"), "out_day")
        .select(col("out_day").as("day"), col("est_median"), col("true_median"))
        .orderBy("day")
    },

    // Column correlation / soft functional dependency — the planner stat
    // behind multi-predicate selectivity (independence assumption breaks
    // exactly when ndv(a,b) ≪ ndv(a)·ndv(b)) and behind groupBy-cardinality
    // estimates. Five narrow two-column scans; per pair: the three NDVs,
    // the correlation ratio in basis points of the independent case, and
    // the a→b functional-dependency verdict (ndv(a,b) = ndv(a)). At
    // 100 TB the NDVs swap to the hll/kmv sketches, same relation shape.
    "st5_column_corr" -> { (s, d) =>
      St5Pairs.map { case (a, b) =>
        li(s, d).agg(
          countDistinct(col(a)).as("ndv_a"),
          countDistinct(col(b)).as("ndv_b"),
          countDistinct(col(a), col(b)).as("ndv_ab"))
          .select(lit(s"$a,$b").as("pair"), col("ndv_a"), col("ndv_b"),
            col("ndv_ab"),
            // cap each factor BEFORE multiplying: 3e9 * 3e9 = 9e18 < 2^63-1,
            // so the product cannot wrap in the billion-NDV regime
            expr("ndv_ab * 10000 div (least(ndv_a, 3000000000) * least(ndv_b, 3000000000))")
              .as("corr_bp"),
            (col("ndv_ab") === col("ndv_a")).as("fd_a_to_b"))
      }.reduce(_ unionByName _).orderBy("pair")
    },

    // Rolling-window distinct via sketch reuse: ONE per-day register build
    // fans out to every trailing 7-day window by register MERGE (max ρ) —
    // the property that makes HLL the only way to answer "distinct users
    // per rolling window" at scale (exact distincts cannot subtract, so
    // the exact form recounts every window — which is precisely the
    // verification artifact here, never the production path). p=1 (m=16)
    // fits the sf0.01 window cardinality (~150 ≥ 2.5·m); hll1 pins the
    // accuracy contract in the tuned-p regime, this gate pins WINDOW
    // reuse.
    "hll4_rolling_distinct" -> { (s, d) =>
      val pp = 1
      val ev = Tables.events(s, d)
        .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      val days = ev.select("day").distinct()
      val regs = Sketches.registers(ev, col("user_id"), Seq("day"), pp)
      val fan = explode(array((0 until 7).map(k => col("day") + lit(k)): _*))
      val win = regs.withColumn("out_day", fan)
        .join(days.select(col("day").as("out_day")), Seq("out_day"))
        .groupBy("out_day", "bucket").agg(max("rho").as("rho"))
      val est = Sketches.estimate(win, Seq("out_day"), pp)
      val truth = ev.distinct()
        .withColumn("out_day", fan)
        .join(days.select(col("day").as("out_day")), Seq("out_day"))
        .groupBy("out_day").agg(countDistinct("user_id").as("n_exact"))
      est.join(truth, "out_day")
        .select(col("out_day").as("day"), col("n_exact"), col("hll_est"),
          expr("abs(hll_est - n_exact) * 10000 div n_exact").as("err_bp"))
        .orderBy("day")
    },

    // Maintained histogram: base-slice bucket counts + cell-wise-added
    // batch counts under FROZEN base-slice bounds (Store.histIncr — the
    // fold never rescans the base) ≡ the direct clamped build the oracle
    // computes. The add-merge rung for st3's planner stat.
    "st4_histogram_incr" -> { (s, d) =>
      graft.Store.histIncr(s, d, HllIncrMod, HllIncrRem).orderBy("k")
    },

    // Maintained Bloom words: the base slice's word relation is persisted
    // once; the appended batch's words fold in by cell-wise bit_or
    // (Store.bloomIncr — the fold never rescans the base) and must equal
    // the direct full-corpus build BIT FOR BIT, which is what the oracle
    // computes. The OR-merge rung of the maintained-sketch family
    // (hll3 max, kmv3 bottom-k, cm2 add).
    "bf3_bloom_incr" -> { (s, d) =>
      graft.Store.bloomIncr(s, d, HllIncrMod, HllIncrRem).orderBy("word_i")
    }
  )

  val oracles: Map[String, String] = Map(

    "bf1_bloom_fp" ->
      s"""WITH mem AS (SELECT c_custkey AS k FROM customer
         |             WHERE c_custkey % $BfMemberMod = 0),
         |bw AS (${Sketches.bloomBuildSql("mem", "k")}),
         |probes AS (SELECT c_custkey AS k, c_mktsegment AS seg,
         |                  CASE WHEN c_custkey % $BfMemberMod = 0
         |                       THEN 1 ELSE 0 END AS is_member
         |           FROM customer),
         |mres AS (${Sketches.bloomContainsSql("probes", "seg, is_member,")})
         |SELECT seg, COUNT(*) AS n_probe,
         |       COUNT(*) FILTER (WHERE is_member = 1) AS n_member,
         |       COUNT(*) FILTER (WHERE bf_pass) AS n_pass,
         |       COUNT(*) FILTER (WHERE bf_pass AND is_member = 0) AS n_fp
         |FROM mres GROUP BY seg ORDER BY seg""".stripMargin,

    // the bloom never drops a true match, so pruned join ≡ plain join
    "bf2_bloom_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_items,
         |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |WHERE s_nationkey < $BfNationMax
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the rewrite preserved the plan's per-bin shape exactly
    "cp2_compaction_apply" ->
      s"""WITH files AS (
         |  SELECT epoch_ms(o_orderdate) // $WeekMs AS file_week,
         |         COUNT(*) AS size_rows
         |  FROM orders GROUP BY 1),
         |b AS (SELECT *, CAST(SUM(size_rows) OVER (
         |        ORDER BY size_rows DESC, file_week
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM files)
         |SELECT CAST((cum - size_rows) // $CpTarget AS BIGINT) AS bin_id,
         |       COUNT(*) AS n_files,
         |       CAST(SUM(size_rows) AS BIGINT) AS bin_rows
         |FROM b GROUP BY 1 ORDER BY bin_id""".stripMargin,

    "st3_histogram_sel" -> {
      val vals = St3Ranges.zipWithIndex.map { case ((p1, p2), i) =>
        s"($i, $p1, $p2)" }.mkString(", ")
      s"""WITH base AS (SELECT l_partkey AS x FROM lineitem),
         |bd AS (SELECT MIN(x) AS lo, MAX(x) - MIN(x) + 1 AS dd FROM base),
         |hist AS (SELECT ${Sketches.histBucketSql("x", "lo", "dd", "//")} AS k,
         |                COUNT(*) AS cnt
         |         FROM base, bd GROUP BY 1),
         |hb AS (SELECT k, cnt,
         |              ${Sketches.histLoSql("k", "lo", "dd", "//")} AS bk_lo,
         |              ${Sketches.histHiSql("k", "lo", "dd", "//")} AS bk_hi
         |       FROM hist, bd),
         |r AS (SELECT * FROM (VALUES $vals) t(r_id, p_lo, p_hi)),
         |rr AS (SELECT r_id, lo + dd * p_lo // 100 AS a,
         |              lo + dd * p_hi // 100 AS b2 FROM r, bd),
         |est AS (SELECT r_id, a, b2,
         |               CAST(SUM(${Sketches.histEstTermSql("a", "b2", "//")})
         |                    AS BIGINT) AS est_rows
         |        FROM hb, rr GROUP BY 1, 2, 3),
         |tr AS (SELECT r_id, COUNT(*) AS true_rows
         |       FROM base, rr WHERE x BETWEEN a AND b2 GROUP BY 1)
         |SELECT r_id, a, b2 AS b, est_rows, true_rows,
         |       abs(est_rows - true_rows) * 10000 // GREATEST(true_rows, 1)
         |         AS err_bp
         |FROM est JOIN tr USING (r_id) ORDER BY r_id""".stripMargin
    },

    // the merge property (kmv2) makes per-day-sketch fan-out ≡ a direct
    // bottom-k over each window's distinct hashes — which is what SQL runs
    "ks4_rolling_quantile" ->
      s"""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, event_id,
         |                   value
         |            FROM events),
         |dsp AS (SELECT DISTINCT day FROM ev),
         |fanned AS (
         |  SELECT dsp.day AS out_day, ev.event_id, ev.value,
         |         ${Kmv.hashSql("ev.event_id")} AS h
         |  FROM ev JOIN dsp ON dsp.day BETWEEN ev.day AND ev.day + 6),
         |bk AS (SELECT out_day, h FROM (
         |         SELECT out_day, h,
         |                ROW_NUMBER() OVER (PARTITION BY out_day ORDER BY h) AS rn
         |         FROM (SELECT DISTINCT out_day, h FROM fanned) dd) r
         |       WHERE rn <= ${Kmv.K}),
         |thr AS (SELECT out_day, MAX(h) AS hk FROM bk GROUP BY 1),
         |samp AS (SELECT f.out_day, f.value, f.h
         |         FROM fanned f JOIN thr USING (out_day) WHERE f.h <= thr.hk),
         |med_s AS (SELECT out_day, value AS est_median FROM (
         |            SELECT out_day, value,
         |              ROW_NUMBER() OVER (PARTITION BY out_day
         |                                 ORDER BY value, h) AS rn,
         |              COUNT(*) OVER (PARTITION BY out_day) AS cnt
         |            FROM samp) m
         |          WHERE rn = (cnt - 1) // 2 + 1),
         |med_t AS (SELECT out_day, value AS true_median FROM (
         |            SELECT out_day, value,
         |              ROW_NUMBER() OVER (PARTITION BY out_day
         |                                 ORDER BY value, event_id) AS rn,
         |              COUNT(*) OVER (PARTITION BY out_day) AS cnt
         |            FROM fanned) m
         |          WHERE rn = (cnt - 1) // 2 + 1)
         |SELECT med_s.out_day AS day, est_median, true_median
         |FROM med_s JOIN med_t USING (out_day)
         |ORDER BY day""".stripMargin,

    "st5_column_corr" ->
      St5Pairs.map { case (a, b) =>
        s"""SELECT '$a,$b' AS pair,
           |  COUNT(DISTINCT $a) AS ndv_a, COUNT(DISTINCT $b) AS ndv_b,
           |  COUNT(DISTINCT ($a, $b)) AS ndv_ab,
           |  CAST(COUNT(DISTINCT ($a, $b)) * 10000
           |    // (LEAST(COUNT(DISTINCT $a), 3000000000)
           |        * LEAST(COUNT(DISTINCT $b), 3000000000)) AS BIGINT) AS corr_bp,
           |  COUNT(DISTINCT ($a, $b)) = COUNT(DISTINCT $a) AS fd_a_to_b
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY pair"),

    // same register fan-out in SQL: registers range-join the day spine
    "hll4_rolling_distinct" -> {
      val pp = 1
      s"""WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
         |            FROM events),
         |dsp AS (SELECT DISTINCT day FROM ev),
         |regs AS (SELECT day, bucket, MAX(rho) AS rho
         |         FROM (${Sketches.rhoPairsSql("ev", "user_id", Seq("day"), pp)})
         |         GROUP BY 1, 2),
         |win AS (SELECT dsp.day AS out_day, bucket, MAX(rho) AS rho
         |        FROM regs r JOIN dsp ON dsp.day BETWEEN r.day AND r.day + 6
         |        GROUP BY 1, 2),
         |s AS (SELECT out_day, COUNT(*) AS m_seen,
         |        SUM(CAST(1 AS BIGINT) << (${Sketches.RMax} - rho)) AS s_seen
         |      FROM win GROUP BY 1),
         |est AS (SELECT out_day, ${Sketches.estimateSql(pp)} AS hll_est FROM s),
         |tru AS (SELECT dsp.day AS out_day,
         |          COUNT(DISTINCT user_id) AS n_exact
         |        FROM (SELECT DISTINCT day, user_id FROM ev) u
         |        JOIN dsp ON dsp.day BETWEEN u.day AND u.day + 6
         |        GROUP BY 1)
         |SELECT est.out_day AS day, n_exact, hll_est,
         |       abs(hll_est - n_exact) * 10000 // n_exact AS err_bp
         |FROM est JOIN tru ON est.out_day = tru.out_day
         |ORDER BY day""".stripMargin
    },

    // maintained add-fold ≡ direct clamped build under frozen base bounds
    "st4_histogram_incr" ->
      s"""WITH e AS (SELECT l_partkey AS x, l_orderkey FROM lineitem),
         |bd AS (SELECT MIN(x) AS lo, MAX(x) - MIN(x) + 1 AS dd FROM e
         |       WHERE NOT (l_orderkey % $HllIncrMod = $HllIncrRem))
         |SELECT ${Sketches.histBucketClampedSql("x", "lo", "dd", "//")} AS k,
         |       COUNT(*) AS cnt
         |FROM e, bd GROUP BY 1 ORDER BY k""".stripMargin,

    // maintained OR-fold ≡ direct build, bit for bit
    "bf3_bloom_incr" ->
      s"""WITH bw AS (${Sketches.bloomBuildSql("lineitem", "l_orderkey")})
         |SELECT word_i, bits FROM bw ORDER BY word_i""".stripMargin,

    "zo1_zorder_layout" ->
      s"""WITH $zRowsSql
         |SELECT zfile AS file_id, COUNT(*) AS n_rows,
         |  MIN(x) AS x_lo, MAX(x) AS x_hi, MIN(y) AS y_lo, MAX(y) AS y_hi
         |FROM rows_ GROUP BY 1 ORDER BY 1""".stripMargin,

    "zo2_zorder_prune" ->
      s"""WITH $zRowsSql,
         |zz AS (SELECT zfile, COUNT(*) AS n, MIN(x) AS xl, MAX(x) AS xh,
         |              MIN(y) AS yl, MAX(y) AS yh, MIN(rxlo) AS rxlo,
         |              MIN(rxhi) AS rxhi, MIN(rylo) AS rylo, MIN(ryhi) AS ryhi
         |       FROM rows_ GROUP BY 1),
         |lz AS (SELECT lfile, COUNT(*) AS n, MIN(x) AS xl, MAX(x) AS xh,
         |              MIN(y) AS yl, MAX(y) AS yh, MIN(rxlo) AS rxlo,
         |              MIN(rxhi) AS rxhi, MIN(rylo) AS rylo, MIN(ryhi) AS ryhi
         |       FROM rows_ GROUP BY 1),
         |zs AS (SELECT COUNT(*) AS z_files,
         |  CAST(SUM(CASE WHEN xl <= rxhi AND xh >= rxlo AND yl <= ryhi AND yh >= rylo
         |      THEN 1 ELSE 0 END) AS BIGINT) AS z_files_hit,
         |  CAST(SUM(CASE WHEN xl <= rxhi AND xh >= rxlo AND yl <= ryhi AND yh >= rylo
         |      THEN n ELSE 0 END) AS BIGINT) AS z_rows_scan FROM zz),
         |ls AS (SELECT COUNT(*) AS lin_files,
         |  CAST(SUM(CASE WHEN xl <= rxhi AND xh >= rxlo AND yl <= ryhi AND yh >= rylo
         |      THEN 1 ELSE 0 END) AS BIGINT) AS lin_files_hit,
         |  CAST(SUM(CASE WHEN xl <= rxhi AND xh >= rxlo AND yl <= ryhi AND yh >= rylo
         |      THEN n ELSE 0 END) AS BIGINT) AS lin_rows_scan FROM lz),
         |m AS (SELECT COUNT(*) AS n_match FROM rows_
         |      WHERE x BETWEEN rxlo AND rxhi AND y BETWEEN rylo AND ryhi)
         |SELECT * FROM zs, ls, m""".stripMargin,

    "cp1_compaction_plan" ->
      s"""WITH files AS (
         |  SELECT epoch_ms(o_orderdate) // $WeekMs AS file_week,
         |         COUNT(*) AS size_rows
         |  FROM orders GROUP BY 1),
         |b AS (SELECT *, CAST(SUM(size_rows) OVER (
         |        ORDER BY size_rows DESC, file_week
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM files)
         |SELECT CAST((cum - size_rows) // $CpTarget AS BIGINT) AS bin_id,
         |       COUNT(*) AS n_files,
         |       CAST(SUM(size_rows) AS BIGINT) AS bin_rows,
         |       MAX(size_rows) AS largest_file
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "rp1_range_plan" ->
      s"""WITH h AS (SELECT o_totalprice AS k, COUNT(*) AS cnt FROM orders GROUP BY 1),
         |t AS (SELECT COUNT(*) AS n_total FROM orders),
         |b AS (SELECT k, cnt, n_total, CAST(SUM(cnt) OVER (
         |        ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM h, t)
         |SELECT CAST(((cum - cnt) * $RpK) // n_total AS BIGINT) AS bucket,
         |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |       MIN(k) AS lo, MAX(k) AS hi
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "hll1_distinct_sketch" ->
      Hll1P.map { case (name, tbl, key, p) => hllBlockSql(name, tbl, key, p) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_name"),

    // the maintained register table ≡ a direct sketch of the whole corpus
    // (exact merge property), so the oracle IS the direct formulation
    "hll3_incremental" ->
      s"""SELECT 'lineitem.l_orderkey' AS key_name, x.n_exact, e.hll_est
         |FROM (SELECT COUNT(DISTINCT l_orderkey) AS n_exact FROM lineitem) x,
         |     (WITH regs AS (SELECT bucket, MAX(rho) AS rho
         |                    FROM (${Sketches.rhoPairsSql("lineitem", "l_orderkey")})
         |                    GROUP BY bucket),
         |           s AS (${Sketches.summarySql()})
         |      SELECT ${Sketches.estimateSql()} AS hll_est FROM s) e""".stripMargin,

    "cm1_countmin" ->
      s"""WITH toks AS (
         |  SELECT UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                            t -> t <> '')) AS k
         |  FROM documents),
         |ds AS (SELECT UNNEST([${(0 until Sketches.CmsD).mkString(", ")}]) AS row_d),
         |ctr AS (SELECT row_d, ${Sketches.cmsIdxSql("row_d", "k")} AS idx,
         |               COUNT(*) AS cnt
         |        FROM toks, ds GROUP BY 1, 2),
         |probes AS (SELECT k, COUNT(*) AS true_n FROM toks GROUP BY 1
         |           ORDER BY true_n DESC, k LIMIT $CmProbes),
         |pi AS (SELECT k, true_n, row_d, ${Sketches.cmsIdxSql("row_d", "k")} AS idx
         |       FROM probes, ds)
         |SELECT pi.k AS word, pi.true_n, MIN(ctr.cnt) AS est_n
         |FROM pi JOIN ctr USING (row_d, idx)
         |GROUP BY 1, 2 ORDER BY word""".stripMargin,

    "kmv1_bottomk_sketch" ->
      Hll1P.map { case (name, tbl, key, _) => kmvBlockSql(name, tbl, key) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_name"),

    "kmv2_merge_sketch" ->
      s"""WITH pg AS (
         |  SELECT grp, h FROM (
         |    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
         |    FROM (SELECT DISTINCT l_returnflag AS grp,
         |                 ${Kmv.hashSql("l_orderkey")} AS h FROM lineitem))
         |  WHERE rn <= ${Kmv.K}),
         |pge AS (SELECT grp, ${Kmv.estimateSql()} AS kmv_est
         |        FROM (SELECT grp, COUNT(*) AS sz, MAX(h) AS hk FROM pg GROUP BY 1)),
         |xg AS (SELECT l_returnflag AS grp, COUNT(DISTINCT l_orderkey) AS n_exact
         |       FROM lineitem GROUP BY 1),
         |mrg AS (SELECT DISTINCT h FROM pg ORDER BY h LIMIT ${Kmv.K}),
         |ms AS (SELECT COUNT(*) AS sz, MAX(h) AS hk FROM mrg),
         |me AS (SELECT 'ALL' AS grp,
         |         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_exact,
         |         ${Kmv.estimateSql()} AS kmv_est FROM ms)
         |SELECT pge.grp, xg.n_exact, pge.kmv_est
         |FROM pge JOIN xg ON pge.grp = xg.grp
         |UNION ALL
         |SELECT grp, n_exact, kmv_est FROM me
         |ORDER BY grp""".stripMargin,

    // maintained fold ≡ direct sketch (exact bottom-k merge property)
    "kmv3_incremental" ->
      s"""SELECT 'lineitem.l_orderkey' AS key_name, x.n_exact, e.kmv_est
         |FROM (SELECT COUNT(DISTINCT l_orderkey) AS n_exact FROM lineitem) x,
         |     (WITH sk AS (${Kmv.sketchSql("lineitem", "l_orderkey")}),
         |           s AS (SELECT COUNT(*) AS sz, MAX(h) AS hk FROM sk)
         |      SELECT ${Kmv.estimateSql()} AS kmv_est FROM s) e""".stripMargin,

    "ks2_set_ops" -> {
      val k = Kmv.K
      s"""WITH ha AS (${Kmv.sketchSql("lineitem WHERE l_returnflag = 'R'", "l_orderkey")}),
         |hb AS (${Kmv.sketchSql("lineitem WHERE l_returnflag = 'A'", "l_orderkey")}),
         |hu AS (SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb) u
         |       ORDER BY h LIMIT $k),
         |st AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM hu) AS sz,
         |              (SELECT MAX(h) FROM hu) AS hk,
         |              (SELECT CAST(COUNT(*) AS BIGINT) FROM hu
         |               WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)) AS n_both,
         |              (SELECT CAST(COUNT(*) AS BIGINT) FROM hu
         |               WHERE h IN (SELECT h FROM ha) AND h NOT IN (SELECT h FROM hb)) AS n_onlya),
         |est AS (SELECT sz AS n_u, n_both, n_onlya, ${Kmv.estimateSql()} AS union_est FROM st),
         |ex AS (SELECT k, COUNT(*) AS nf, MIN(f) AS mf
         |       FROM (SELECT DISTINCT l_orderkey AS k, l_returnflag AS f
         |             FROM lineitem WHERE l_returnflag IN ('R', 'A')) d GROUP BY k),
         |exs AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         |               CAST(SUM(CASE WHEN nf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter,
         |               CAST(SUM(CASE WHEN nf = 1 AND mf = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS exact_onlya
         |        FROM ex)
         |SELECT e.union_est, x.exact_union,
         |  abs(e.union_est - x.exact_union) * 10000 // x.exact_union AS union_err_bp,
         |  e.n_both * e.union_est // e.n_u AS inter_est, x.exact_inter,
         |  abs(e.n_both * e.union_est // e.n_u - x.exact_inter) * 10000 // x.exact_inter AS inter_err_bp,
         |  e.n_onlya * e.union_est // e.n_u AS onlya_est, x.exact_onlya,
         |  abs(e.n_onlya * e.union_est // e.n_u - x.exact_onlya) * 10000 // x.exact_onlya AS onlya_err_bp
         |FROM est e, exs x""".stripMargin
    },

    "ks1_sample_quantiles" ->
      s"""WITH oh AS (SELECT o_orderkey, o_totalprice,
         |                   ${Kmv.hashSql("o_orderkey")} AS h FROM orders),
         |sk AS (SELECT DISTINCT h FROM oh ORDER BY h LIMIT ${Kmv.K}),
         |t AS (SELECT MAX(h) AS hk FROM sk),
         |samp AS (SELECT o_totalprice, h FROM oh, t WHERE h <= hk),
         |ns AS (SELECT COUNT(*) AS n_s FROM samp),
         |sr AS (SELECT o_totalprice,
         |              ROW_NUMBER() OVER (ORDER BY o_totalprice, h) AS rn FROM samp),
         |tr AS (SELECT o_totalprice,
         |              ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
         |       FROM orders),
         |nt AS (SELECT COUNT(*) AS n_total FROM orders),
         |qs AS (SELECT UNNEST([${KsQ.mkString(",")}]) AS q_pct),
         |e AS (SELECT q_pct, sr.o_totalprice AS est_price
         |      FROM qs, ns, sr WHERE sr.rn = (q_pct * (n_s - 1)) // 100 + 1),
         |x AS (SELECT q_pct, tr.o_totalprice AS true_price
         |      FROM qs, nt, tr WHERE tr.rn = (q_pct * (n_total - 1)) // 100 + 1)
         |SELECT e.q_pct, est_price, true_price
         |FROM e JOIN x USING (q_pct) ORDER BY q_pct""".stripMargin,

    "am1_f2_selfjoin" ->
      Am1Keys.map { case (name, key) => amsBlockSql(name, "lineitem", key) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_name"),

    "st1_table_stats" ->
      St1Cols.map { case (c, kind) => statBlockSql(c, kind) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "st2_join_card" ->
      St2Joins.map(st2BlockSql)
        .mkString("", "\nUNION ALL\n", "\nORDER BY join_name"),

    // additive merge is exact, so the maintained matrix ≡ the direct one
    "cm2_countmin_incr" ->
      s"""WITH toks AS (
         |  SELECT UNNEST(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                            t -> t <> '')) AS k
         |  FROM documents),
         |ds AS (SELECT UNNEST([${(0 until Sketches.CmsD).mkString(", ")}]) AS row_d),
         |ctr AS (SELECT row_d, ${Sketches.cmsIdxSql("row_d", "k")} AS idx,
         |               COUNT(*) AS cnt
         |        FROM toks, ds GROUP BY 1, 2),
         |probes AS (SELECT k, COUNT(*) AS true_n FROM toks GROUP BY 1
         |           ORDER BY true_n DESC, k LIMIT $CmProbes),
         |pi AS (SELECT k, true_n, row_d, ${Sketches.cmsIdxSql("row_d", "k")} AS idx
         |       FROM probes, ds)
         |SELECT pi.k AS word, pi.true_n, MIN(ctr.cnt) AS est_n
         |FROM pi JOIN ctr USING (row_d, idx)
         |GROUP BY 1, 2 ORDER BY word""".stripMargin,

    "hll2_union_sketch" ->
      s"""WITH pairs AS (
         |  ${Sketches.rhoPairsSql(
               "(SELECT l_returnflag AS grp, l_orderkey FROM lineitem)",
               "l_orderkey", Seq("grp"))}),
         |regsg AS (SELECT grp, bucket, MAX(rho) AS rho FROM pairs GROUP BY 1, 2),
         |pg AS (SELECT grp, COUNT(*) AS m_seen,
         |         SUM(CAST(1 AS BIGINT) << (${Sketches.RMax} - rho)) AS s_seen
         |       FROM regsg GROUP BY 1),
         |pge AS (SELECT grp, ${Sketches.estimateSql()} AS hll_est FROM pg),
         |xg AS (SELECT l_returnflag AS grp, COUNT(DISTINCT l_orderkey) AS n_exact
         |       FROM lineitem GROUP BY 1),
         |mr AS (SELECT bucket, MAX(rho) AS rho FROM regsg GROUP BY 1),
         |ms AS (SELECT COUNT(*) AS m_seen,
         |         SUM(CAST(1 AS BIGINT) << (${Sketches.RMax} - rho)) AS s_seen
         |       FROM mr),
         |me AS (SELECT 'ALL' AS grp,
         |         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_exact,
         |         ${Sketches.estimateSql()} AS hll_est FROM ms)
         |SELECT pge.grp, xg.n_exact, pge.hll_est FROM pge JOIN xg ON pge.grp = xg.grp
         |UNION ALL
         |SELECT grp, n_exact, hll_est FROM me
         |ORDER BY grp""".stripMargin
  )
}
