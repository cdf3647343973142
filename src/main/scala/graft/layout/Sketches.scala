package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches — the approximate-count machinery a
  * 100 TB pipeline uses where exact `COUNT(DISTINCT)` would shuffle every
  * key (per-source vocabulary sizes, distinct-URL counts, join-cardinality
  * estimation feeding broadcast decisions).
  *
  * HyperLogLog (Flajolet et al. 2007), made *engine-exact* so it can carry a
  * full DuckDB oracle:
  *
  *  - randomness = `md5(key)` hex, identical in both engines;
  *  - register index = first `p` hex digits (m = 16^p registers; p is the
  *    precision knob — raw-HLL is valid for n ≳ 2.5·m, so callers pick p to
  *    their expected cardinality range, the same contract as every HLL
  *    library's precision parameter);
  *  - ρ = leading-zero count of the remaining nibble stream, derived with
  *    string/CASE arithmetic (no floats, no platform `clz`);
  *  - the harmonic mean Σ2^-ρ is kept as the exact integer Σ2^(RMax-ρ), and
  *    the raw estimate α·m²/Σ2^-ρ is one big-integer division with α as an
  *    exact rational — every intermediate is integer, so Spark and DuckDB
  *    agree bit-for-bit (no last-ulp float flap).
  *
  * The register relation is the sketch: tiny (≤ m rows), mergeable by
  * `MAX(ρ)` per bucket — the distributed-aggregation property the hll2 gate
  * pins (union-of-sketches ≡ sketch-of-union, exactly). Spark's partial
  * aggregation gives the map-side combine for free: the shuffle carries at
  * most m rows per partition, never the keys.
  *
  * The small-range linear-counting correction (HLL++) needs `ln`, which is
  * not correctly-rounded across libm implementations — it lives in
  * [[Sketches.linearCounting]] for API users and is spec-tested, but gates
  * pin only the integer raw estimate.
  */
object Sketches {

  /** Default bucket-index hex digits: m = 16^3 = 4096 registers. */
  val P = 3

  def m(p: Int): Int = 1 << (4 * p)

  /** ρ clamp: register values above RMax collapse (Σ2^(RMax-ρ) stays integer;
    * P(ρ>40) ≈ 2^-40 per key — unreachable at any realistic scale). */
  val RMax = 40

  /** α_m = 0.7213/(1 + 1.079/m) as an exact rational (standard constant for
    * m ≥ 128): denominator, and numerator times m²·2^RMax (the full
    * numerator of the raw estimate α·m²·2^RMax / Σ2^(RMax-ρ)). */
  def alphaDen(p: Int): BigInt = BigInt(10000) * (BigInt(1000) * m(p) + 1079)
  def estNum(p: Int): BigInt =
    BigInt(7213) * m(p) * 1000 * BigInt(m(p)) * BigInt(m(p)) * (BigInt(1) << RMax)

  /** Per-row (bucket, ρ) pairs for a key column — all map-side. `carry`
    * columns (e.g. a group key for per-group sketches) pass through. */
  def rhoPairs(df: DataFrame, key: Column, carry: Seq[String] = Nil,
      p: Int = P): DataFrame =
    // native digest kernel ≡ the old substring/regexp_extract/instr/CASE
    // ladder over the md5 hex string (a regex pass per KEY — the hot cost
    // of every register build; fuzz-pinned in Md5SlicesSpec). The DuckDB
    // oracle side ([[rhoPairsSql]]) keeps the hex derivation.
    df.select(carry.map(col) :+
        graft.functions.Md5Rho(key.cast("string"), p, RMax).as("br"): _*)
      .select(carry.map(col) ++ Seq(col("br.bucket").as("bucket"),
        col("br.rho").as("rho")): _*)

  /** The sketch itself: ≤ m rows of (bucket, max ρ) per carry group. One
    * shuffle on ≤ m×groups keys with map-side partial max. */
  def registers(df: DataFrame, key: Column, carry: Seq[String] = Nil,
      p: Int = P): DataFrame =
    rhoPairs(df, key, carry, p).groupBy((carry :+ "bucket").map(col): _*)
      .agg(max("rho").as("rho"))

  /** Collapse a register relation (optionally pre-grouped) to the integer
    * raw-HLL estimate. Input columns: `rho` (+ grouping cols). */
  def estimate(regs: DataFrame, groupCols: Seq[String] = Nil,
      p: Int = P): DataFrame = {
    val base = if (groupCols.isEmpty) regs.groupBy()
    else regs.groupBy(groupCols.map(col): _*)
    base
      .agg(count(lit(1)).as("m_seen"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RMax - rho)")).as("s_seen"))
      .withColumn("s_total",
        expr(s"s_seen + CAST(${m(p)} - m_seen AS BIGINT) * ${1L << RMax}"))
      .withColumn("hll_est",
        expr(s"CAST(CAST('${estNum(p)}' AS DECIMAL(38,0)) div " +
          s"(CAST(${alphaDen(p)} AS DECIMAL(38,0)) * CAST(s_total AS DECIMAL(38,0))) AS BIGINT)"))
      .drop("m_seen", "s_seen", "s_total")
  }

  /** HLL++ small-range path (API-only; see class Scaladoc for why gates
    * exclude it): linear counting m·ln(m/V) when empty registers remain. */
  def linearCounting(mSeen: Long, p: Int = P): Double =
    if (mSeen >= m(p)) Double.NaN
    else m(p) * math.log(m(p).toDouble / (m(p) - mSeen))

  // ------------------------------------------------------------------
  // Count-Min frequency sketch (Cormode & Muthukrishnan 2005)
  // ------------------------------------------------------------------

  /** Count-Min width (counters per hash row) and depth (hash rows). The
    * sketch is a d×w integer matrix: ε ≈ e/w overestimate bound with
    * probability 1−(1/e)^d. Like the HLL registers it is deterministic
    * (md5-derived row hashes), mergeable (counter matrices ADD), and tiny —
    * the shuffle carries ≤ d·w counter keys with map-side partial sums,
    * never the token stream. */
  val CmsW = 1024
  val CmsD = 4

  /** Row-`d`'s counter index = bits of the d-th disjoint 8-hex-digit chunk
    * of ONE md5 per key (one digest feeds all d rows — the md5 is the hot
    * cost at corpus scale, and disjoint chunks of a 128-bit digest are the
    * standard way to derive the d "independent" CMS hashes). Spark text over
    * a precomputed hex column `h`: */
  def cmsChunkExpr(d: Int, hCol: String): String =
    s"CAST(conv(substring($hCol, ${1 + d * 8}, 8), 16, 10) AS BIGINT) % $CmsW"

  /** DuckDB text of the same index with `d` as a column reference. */
  def cmsIdxSql(dCol: String, kCol: String): String =
    s"CAST(('0x' || substr(md5($kCol), 1 + $dCol * 8, 8)) AS BIGINT) % $CmsW"

  /** The d chunk values of one md5, via the native digest-slice kernel
    * ([[graft.functions.Md5HexLongs]] ≡ [[cmsChunkExpr]]'s composed
    * `conv(substring(md5(k), 1+d*8, 8), 16, 10)` before the `% w`,
    * fuzz-pinned in Md5SlicesSpec — no hex string, no d conv parses). */
  private def cmsChunks(key: Column): Column =
    graft.functions.Md5HexLongs(key.cast("string"),
      (0 until CmsD).map(d => (1 + d * 8, 8)))

  /** The sketch: (row_d, idx) → count over a key column. One md5 + map-side
    * integer chunking per key, one shuffle on ≤ d·w counter cells. */
  def cmsCounters(df: DataFrame, key: Column): DataFrame =
    df.select(cmsChunks(key).as("hs"))
      .select(posexplode(array((0 until CmsD).map(d =>
        col("hs").getItem(d) % CmsW): _*)).as(Seq("row_d", "idx")))
      .groupBy("row_d", "idx").agg(count(lit(1)).as("cnt"))

  /** Point estimates for probe keys: min over the d counters each key maps
    * to. `probes` needs columns (k, …carry); counters are sketch-sized so
    * the join broadcasts. */
  def cmsEstimate(probes: DataFrame, counters: DataFrame,
      carry: Seq[String]): DataFrame =
    probes
      .withColumn("hs", cmsChunks(col("k")))
      .select((probes.columns.map(col) :+
        posexplode(array((0 until CmsD).map(d =>
          col("hs").getItem(d) % CmsW): _*)).as(Seq("row_d", "idx"))): _*)
      .join(broadcast(counters), Seq("row_d", "idx"))
      .groupBy(("k" +: carry).map(col): _*)
      .agg(min("cnt").as("est_n"))

  // ------------------------------------------------------------------
  // AMS tug-of-war F2 sketch (Alon, Matias & Szegedy 1996)
  // ------------------------------------------------------------------

  /** Estimator count: est = mean of d independent Z_d², relative stderr
    * ≈ √(2/d). One md5 per key yields all d signs (one hex digit's low bit
    * each), so d ≤ 32. */
  val AmsD = 16

  /** The sketch: d running signed sums Z_d = Σ_rows sign_d(key) — ONE
    * map-side pass, the shuffle carries d numbers per partition, and
    * sketches of disjoint streams MERGE BY ADDING their Z vectors. Z_d² is
    * an unbiased estimator of F2 = Σ_k cnt(k)² — the self-join size, the
    * quantity a planner needs before it risks a skewed shuffle join. */
  def amsZ(df: DataFrame, key: Column): DataFrame =
    // one pass, d running sums as d agg columns — NO d× row blowup; the
    // (row_d, z) shape unpivots after the agg for the merge API. The d
    // signs come from ONE native parity-mask kernel per row
    // ([[graft.functions.Md5ParityMask]], ≡ the composed
    // `1 - 2 * (conv(substring(md5(k), d+1, 1), 16, 10) % 2)` the oracle
    // replicates, fuzz-pinned in Md5SlicesSpec) — the hex-string encode +
    // 16 substring/conv parses per row were am1's dominant CPU (r13
    // optimization, guide §1.2 step 2).
    df.select(graft.functions.Md5ParityMask(key.cast("string")).as("m"))
      .agg(
        sum(expr(s"CAST(1 - 2 * ((m >> 0) & 1) AS BIGINT)")).as("z0"),
        (1 until AmsD).map(d =>
          sum(expr(s"CAST(1 - 2 * ((m >> $d) & 1) AS BIGINT)")).as(s"z$d")): _*)
      .select(expr(s"stack($AmsD, ${(0 until AmsD).map(d =>
        s"$d, z$d").mkString(", ")}) AS (row_d, z)"))

  /** Collapse a Z relation to the integer F2 estimate (mean of Z², floor
    * div in BOTH engines — Spark's double-cast truncates while DuckDB's
    * rounds, so the division must stay integral). */
  def amsEstimate(z: DataFrame): DataFrame =
    z.agg(expr(s"sum(z * z) div $AmsD").as("est_f2"))

  /** DuckDB mirrors. */
  def amsZSql(rel: String, keyExpr: String): String =
    s"""SELECT row_d, SUM(1 - 2 * (CAST(('0x' || substr(h, row_d + 1, 1)) AS BIGINT) % 2)) AS z
       |FROM (SELECT md5(CAST($keyExpr AS VARCHAR)) AS h FROM $rel),
       |     (SELECT UNNEST(range(0, $AmsD)) AS row_d)
       |GROUP BY 1""".stripMargin

  def amsEstimateSql: String = s"CAST(SUM(z * z) // $AmsD AS BIGINT)"

  // ------------------------------------------------------------------
  // DuckDB oracle fragments (same arithmetic, HUGEINT for the division)
  // ------------------------------------------------------------------

  /** CTE body: (carry…, bucket, rho) pairs for `keyExpr` over `rel`. */
  def rhoPairsSql(rel: String, keyExpr: String, carry: Seq[String] = Nil,
      p: Int = P): String = {
    val c = carry.map(_ + ", ").mkString
    s"""SELECT $c bucket,
       |  CASE WHEN dv = 0 THEN $RMax
       |       ELSE LEAST(4*lead0 + CASE WHEN dv >= 8 THEN 0 WHEN dv >= 4 THEN 1
       |                                 WHEN dv >= 2 THEN 2 ELSE 3 END + 1, $RMax)
       |  END AS rho
       |FROM (SELECT $c bucket, length(regexp_extract(tail, '^(0*)', 1)) AS lead0,
       |             strpos('123456789abcdef',
       |                    substr(tail, length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)) AS dv
       |      FROM (SELECT $c substr(h, 1, $p) AS bucket, substr(h, ${p + 1}, ${32 - p}) AS tail
       |            FROM (SELECT $c md5(CAST($keyExpr AS VARCHAR)) AS h FROM $rel)))""".stripMargin
  }

  /** SELECT-list fragment: integer raw estimate from (m_seen, s_seen). */
  def estimateSql(p: Int = P): String =
    s"""CAST(CAST('${estNum(p)}' AS HUGEINT) //
       |  (CAST(${alphaDen(p)} AS HUGEINT) *
       |   CAST(s_seen + (${m(p)} - m_seen) * CAST(${1L << RMax} AS BIGINT) AS HUGEINT))
       | AS BIGINT)""".stripMargin

  /** Aggregation over a register CTE named `regs(bucket, rho)` (plus
    * optional grouping columns carried through). */
  def summarySql(groupSel: String = "", groupBy: String = ""): String =
    s"""SELECT $groupSel COUNT(*) AS m_seen,
       |  SUM(CAST(1 AS BIGINT) << ($RMax - rho)) AS s_seen
       |FROM regs $groupBy""".stripMargin

  // ------------------------------------------------------------------
  // Bloom filter (Bloom 1970) — the membership sketch
  // ------------------------------------------------------------------

  /** Bloom geometry: m bits packed 32 to a BIGINT word (32-bit lanes keep
    * every mask positive — DuckDB's `<<` guards the BIGINT sign bit, so
    * 64-bit lanes could not be oracle'd), k probe positions per key. Like
    * the HLL precision p, m is the caller's sizing knob (bits ≈ 10·n for
    * ~1% fp); the gates pin the arithmetic at 4096/3 so the bf1
    * false-positive grid is non-degenerate at sf0.01 (~500 members → ~3%
    * fp). The sketch is the ≤ m/32-row (word_i, bits) relation:
    * deterministic (md5-chunk positions, the [[cmsChunkExpr]] derivation
    * family), mergeable (words OR cell-wise — the distributed-build AND the
    * incremental-maintenance property), never-false-negative by
    * construction. At 100 TB this is the runtime-filter sketch: built from
    * the selective side of a join in one tiny aggregation, shipped as a
    * literal array, applied as a codegen'd predicate on the fact scan
    * BEFORE the shuffle (the bf2 gate). */
  val BloomM = 4096
  val BloomK = 3
  val BloomLane = 32
  def bloomNWords: Int = BloomM / BloomLane

  /** Probe position i ∈ [0,k): bits of the i-th disjoint 8-hex-digit chunk
    * of ONE md5 per key, mod m (one digest feeds all k probes). */
  def bloomPosExpr(i: Int, hCol: String): String =
    s"CAST(conv(substring($hCol, ${1 + i * 8}, 8), 16, 10) AS BIGINT) % $BloomM"

  /** DuckDB text of the same position with `i` as a column reference. */
  def bloomPosSql(iCol: String, kCol: String): String =
    s"CAST(('0x' || substr(md5(CAST($kCol AS VARCHAR)), 1 + $iCol * 8, 8)) AS BIGINT) % $BloomM"

  /** Per-key probe positions (k rows per input row); `carry` passes through.
    * One native digest-slice kernel per key ([[graft.functions.Md5HexLongs]]
    * ≡ [[bloomPosExpr]]'s composed form, fuzz-pinned in Md5SlicesSpec). */
  def bloomPositions(df: DataFrame, key: Column,
      carry: Seq[String] = Nil): DataFrame =
    df.select(carry.map(col) :+ graft.functions.Md5HexLongs(key.cast("string"),
        (0 until BloomK).map(i => (1 + i * 8, 8))).as("hs"): _*)
      .select(carry.map(col) :+ explode(array((0 until BloomK).map(i =>
        col("hs").getItem(i) % BloomM): _*)).as("pos"): _*)

  /** The sketch: packed (word_i, bits) words — ≤ m/32 rows, one map-side
    * md5+chunk pass, one ≤ m/32-key shuffle with map-side partial bit_or. */
  def bloomBuild(df: DataFrame, key: Column): DataFrame =
    bloomPositions(df, key)
      .groupBy(expr(s"pos div $BloomLane").as("word_i"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % $BloomLane AS INT)))")
        .as("bits"))

  /** DuckDB mirror of [[bloomBuild]] as a CTE body over `rel(kCol)`. */
  def bloomBuildSql(rel: String, kCol: String): String =
    s"""SELECT pos // $BloomLane AS word_i,
       |       BIT_OR(CAST(1 AS BIGINT) << CAST(pos % $BloomLane AS INT)) AS bits
       |FROM (SELECT ${bloomPosSql("i", kCol)} AS pos
       |      FROM $rel, (SELECT UNNEST(range(0, $BloomK)) AS i))
       |GROUP BY 1""".stripMargin

  /** Membership: probes (column `k` + carry) gain boolean `bf_pass` — true
    * iff ALL k probe bits are set. The word relation is sketch-sized so it
    * broadcasts; a missing word row means no bit of that word is set. */
  def bloomContains(probes: DataFrame, words: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    bloomPositions(probes, col("k"), "k" +: carry)
      .withColumn("word_i", expr(s"pos div $BloomLane"))
      .join(broadcast(words), Seq("word_i"), "left")
      .withColumn("hit", expr(
        s"""CAST((coalesce(bits, CAST(0 AS BIGINT)) &
           | shiftleft(CAST(1 AS BIGINT), CAST(pos % $BloomLane AS INT))) <> 0
           | AS INT)""".stripMargin))
      .groupBy(("k" +: carry).map(col): _*)
      .agg((min("hit") === 1).as("bf_pass"))

  /** DuckDB mirror of [[bloomContains]]: SELECT body over `probes(k, …)`
    * and a words CTE named `bw(word_i, bits)`. */
  def bloomContainsSql(probesRel: String, carrySel: String): String =
    s"""SELECT k, $carrySel
       |       (MIN(CASE WHEN (COALESCE(bw.bits, 0) &
       |                       (CAST(1 AS BIGINT) << CAST(pos % $BloomLane AS INT))) <> 0
       |                 THEN 1 ELSE 0 END) = 1) AS bf_pass
       |FROM (SELECT p.*, ${bloomPosSql("i", "p.k")} AS pos
       |      FROM $probesRel p, (SELECT UNNEST(range(0, $BloomK)) AS i) ii) px
       |LEFT JOIN bw ON bw.word_i = px.pos // $BloomLane
       |GROUP BY ALL""".stripMargin

  // ------------------------------------------------------------------
  // Equi-width histogram → range-selectivity estimation
  // ------------------------------------------------------------------

  /** Histogram buckets. Like the other sketches the relation is bounded
    * (≤ B rows), built with map-side partial counts, and MERGES BY ADDING
    * counts — per-partition histograms fold into the table's. */
  val HistB = 64

  /** Bucket id for integer value `xSql` in domain [lo, lo+D): engine-exact
    * integer arithmetic, `div`/`//` spelled per engine via `idiv`. */
  def histBucketSql(xSql: String, loSql: String, dSql: String,
      idiv: String): String =
    s"((($xSql) - ($loSql)) * $HistB $idiv ($dSql))"

  /** Inclusive integer value bounds of bucket `k` (0-based): bucket k
    * covers offsets [ceil(kD/B), ceil((k+1)D/B) − 1] from lo. */
  def histLoSql(kSql: String, loSql: String, dSql: String,
      idiv: String): String =
    s"(($loSql) + ((($kSql) * ($dSql) + ${HistB - 1}) $idiv $HistB))"
  def histHiSql(kSql: String, loSql: String, dSql: String,
      idiv: String): String =
    s"(($loSql) + (((($kSql) + 1) * ($dSql) + ${HistB - 1}) $idiv $HistB) - 1)"

  /** Bucket id under FROZEN bounds (the maintained-histogram path): values
    * outside the frozen [lo, lo+D) domain clamp to the edge buckets. */
  def histBucketClampedSql(xSql: String, loSql: String, dSql: String,
      idiv: String): String =
    s"LEAST(${HistB - 1}, GREATEST(0, ${histBucketSql(xSql, loSql, dSql, idiv)}))"

  /** Estimated rows of [a, b] from one bucket row (cnt, bk_lo, bk_hi):
    * within-bucket uniformity, exact-integer interpolation — cnt·overlap
    * div width. The planner's range-predicate estimator. */
  def histEstTermSql(aSql: String, bSql: String, idiv: String): String =
    s"""(CASE WHEN LEAST($bSql, bk_hi) < GREATEST($aSql, bk_lo) THEN 0
       |      ELSE cnt * (LEAST($bSql, bk_hi) - GREATEST($aSql, bk_lo) + 1)
       |           $idiv (bk_hi - bk_lo + 1) END)""".stripMargin

  /** The k probe tests of one key (md5-hex column `hCol` — ONE digest per
    * row feeds all k probes) against a words LITERAL ARRAY — the
    * runtime-filter predicate: narrow, codegen'd, no join, applied on the
    * fact scan before any shuffle. `wordsArrSql` is a 1-indexed array (slot
    * w+1 = word w, 0 where absent); a key passes iff every chunk's bit is
    * set. */
  def bloomFilterExpr(hCol: String, wordsArrSql: String): String =
    (0 until BloomK).map { i =>
      val pos = s"(${bloomPosExpr(i, hCol)})"
      s"""(element_at($wordsArrSql, CAST($pos div $BloomLane AS INT) + 1) &
         | shiftleft(CAST(1 AS BIGINT), CAST($pos % $BloomLane AS INT))) <> 0""".stripMargin
    }.mkString("(", " AND ", ")")

  /** [[bloomFilterExpr]] on the native digest-slice kernel: ONE
    * [[graft.functions.Md5HexLongs]] per key (no hex string, no generic
    * base-16 conv parse ×k) — ≡ the composed form via the Md5SlicesSpec
    * pin, measured bf2 1.57→? (r13). `words` is the packed-word literal
    * array column. */
  def bloomFilterCol(key: org.apache.spark.sql.Column,
      words: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{element_at, lit, shiftleft}
    val hs = graft.functions.Md5HexLongs(key.cast("string"),
      (0 until BloomK).map(i => (1 + i * 8, 8)))
    (0 until BloomK).map { i =>
      val pos = hs.getItem(i) % BloomM
      // pos ∈ [0, BloomM): the double division is exact enough that the
      // int cast floors to `pos div BloomLane`
      val wordIdx = (pos / BloomLane).cast("int") + 1
      import org.apache.spark.sql.graftnative.Native
      val bit = Native.column(org.apache.spark.sql.catalyst.expressions
        .ShiftLeft(Native.expression(lit(1L)),
          Native.expression((pos % BloomLane).cast("int"))))
      (element_at(words, wordIdx).bitwiseAND(bit) =!= 0L)
    }.reduce(_ && _)
  }
}
