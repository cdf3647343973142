package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - Brute-force top-k (cosine or dot) — the exactness baseline. Dot/norms
  *    use 1e3 integer quantization so results are bit-identical across
  *    engines (integer arithmetic + one correctly-rounded sqrt/division).
  *  - LSH-bucketed variant (random-hyperplane signatures): the scale path —
  *    candidates only within matching sign-buckets, then exact re-rank.
  *    Hyperplanes are derived deterministically from md5 parities, so the
  *    index is reproducible with no stored model AND replicable in DuckDB —
  *    the ann2 gate hash-compares the whole bucketed top-k against SQL.
  *  - IVF variant (inverted-file coarse quantization): vectors assigned to
  *    their nearest codebook centroid by exact integer L2; a probe
  *    exact-re-ranks only the nprobe nearest cells. The deterministic flat
  *    codebook keeps the whole operator integer arithmetic — the ann3 gate
  *    hash-compares assignment + probe against SQL.
  *
  * Scale: brute force is a broadcast of the query vector over a columnar
  * scan (no shuffle, TakeOrdered(k)); LSH adds one groupBy on the signature
  * to prune the scan to matching buckets — at 100 TB the signature becomes
  * a partition key so a probe touches only its bucket's files.
  */
object Ann {

  /** quantized vector + squared norm columns */
  private def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("v"))
      .withColumn("n2", graft.functions.DotI64.normSq(col("v")))

  // native codegen'd kernel — the HOF form (aggregate∘zip_with) is
  // CodegenFallback and allocates a product array per row
  private def dotCol(a: Column, b: Column): Column =
    graft.functions.DotI64(a, b)

  /** Salt width for the IVF candidate join. A pinned small codebook (the
    * oracle gates run nCells = 16) makes `cell` a 16-value join key that
    * hashes to at most 16 of the shuffle partitions — half a 32-way stage
    * idles and colliding cells double the critical path (sf10 profile,
    * round 13). Salting fans the key to cells×S ≈ 2× the configured
    * shuffle partitions: the corpus side keeps ONE deterministic salt
    * (vec_id mod S) while the query side replicates across all S, so every
    * (corpus, query) pair still meets exactly once and results are
    * unchanged. Collapses to 1 — identical plan — once the codebook alone
    * is wide enough (the adaptive √n path at scale). */
  private def cellSalt(df: DataFrame, effCells: Int): Int = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    math.max(1, math.min(32, (2 * parts + effCells - 1) / effCells))
  }

  /** The salted candidate join (see [[cellSalt]]); `cand` must carry
    * `vec_id`, `q` is the exploded (cell, query) side. */
  private def saltedCellJoin(cand: DataFrame, q: DataFrame,
      saltN: Int): DataFrame =
    if (saltN == 1) cand.join(q, Seq("cell"))
    else cand.withColumn("s", pmod(col("vec_id"), lit(saltN)).cast("int"))
      .join(q.withColumn("s",
        explode(array((0 until saltN).map(lit): _*))), Seq("cell", "s"))
      .drop("s")

  /** Exact top-k by dot product against the embedding of `queryId`
    * (excluding itself): (vec_id, label, dot) ordered desc, vec_id asc. */
  def topKDot(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = quantized(embeddings.filter(col("vec_id") === queryId))
      .select(col("v").as("qv"))
    quantized(embeddings).filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .select(col("vec_id"), col("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)
  }

  /** Exact top-k by cosine: integer dot / sqrt(na*nb). Zero-norm vectors
    * (all |x| < 0.0005 quantize to zero) have no defined cosine and are
    * excluded; norms multiply in double (Long product overflows at high
    * dims under ANSI mode). */
  def topKCosine(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = quantized(embeddings.filter(col("vec_id") === queryId))
      .filter(col("n2") > 0)
      .select(col("v").as("qv"), col("n2").as("qn2"))
    quantized(embeddings).filter(col("vec_id") =!= queryId && col("n2") > 0)
      .crossJoin(broadcast(q))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch k-NN JOIN: for EVERY vector in `queries`, its `k` nearest
    * neighbors from `embeddings` by exact cosine (self excluded, zero-norm
    * vectors on either side excluded): (q_id, vec_id, cosine, rk). The
    * single-query top-k operators answer one probe; this is the operator a
    * pipeline runs to attach neighbor lists to a whole query table
    * (retrieval eval sets, hard-negative mining, kNN-classification).
    *
    * Scale: the query block BROADCASTS (explicit `broadcast` — a query
    * batch is thousands of vectors, the corpus is the big side), so the
    * corpus scans ONCE with no shuffle of the candidate side; per-query
    * ranking is a rank-limit window on (q_id), which Spark 4 plans as
    * WindowGroupLimit — map-side top-k per query below the single (q_id)
    * shuffle, never a global sort. Bigger query sets chunk into broadcast
    * batches; at that point prefer the IVF/LSH index variants per chunk. */
  def knnJoin(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val cand = quantized(embeddings).filter(col("n2") > 0)
    val q = quantized(queries).filter(col("n2") > 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    cand.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rk"))
  }

  /** Contrastive hard-negative mining: for every anchor, the `k` MOST
    * similar candidates whose label differs (the informative negatives a
    * contrastive/triplet trainer wants), after dropping candidates at or
    * above `dupCeiling` cosine — near-identical vectors across labels are
    * presumed mislabeled duplicates / unlabeled positives, the standard
    * false-negative filter in hard-negative pipelines.
    *
    * Same plan shape as [[knnJoin]] (anchors broadcast, corpus scans once,
    * per-anchor rank-limit window → WindowGroupLimit): the label filter and
    * the ceiling run BEFORE ranking, so the k slots go to valid negatives
    * only. For corpus-scale anchor sets, chunk anchors or mine within
    * [[knnJoinIvf]] cells exactly like the kNN scale path. */
  def hardNegatives(embeddings: DataFrame, anchors: DataFrame, k: Int,
      dupCeiling: Double): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val cand = quantized(embeddings.select(col("vec_id"), col("embedding")))
      .join(embeddings.select(col("vec_id"), col("label")), Seq("vec_id"))
      .filter(col("n2") > 0)
    val q = quantized(anchors.select(col("vec_id"), col("embedding")))
      .join(anchors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .filter(col("n2") > 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("n2").as("qn2"), col("label").as("q_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    cand.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .filter(col("cosine") < dupCeiling)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("label"), col("cosine"), col("rk"))
  }

  /** IVF-bucketed hard-negative mining — the scale path for
    * [[hardNegatives]], which is Θ(|anchors| · |corpus|) by contract (the
    * round-9 sf10 probe measured 132 s at 100×: anchors AND corpus both
    * grow, so exact mining is quadratic exactly like [[knnJoin]]). Each
    * anchor probes only its `nprobe` nearest cells, the label filter and
    * dup ceiling run before ranking, and the candidate join shuffles on
    * the cell key — at 100 TB it rides the same cell-partitioned index as
    * [[knnJoinIvf]] with partition pruning on the probed cells. */
  def hardNegativesIvf(embeddings: DataFrame, anchors: DataFrame, k: Int,
      dupCeiling: Double, nCells: Int = 0, nprobe: Int = 4): DataFrame = {
    val effCells =
      if (nCells > 0) nCells
      else adaptiveCells(math.max(1L, embeddings.count()))
    require(k >= 1 && nprobe >= 1 && nprobe <= effCells,
      s"bad hardNegativesIvf params: k=$k nprobe=$nprobe nCells=$effCells")
    val cents = codebook(embeddings, effCells)
    val cand = ivfAssignments(embeddings.select(col("vec_id"),
        col("embedding")), cents)
      .join(embeddings.select(col("vec_id"), col("label")), Seq("vec_id"))
      .filter(col("n2") > 0)
    val dists = array_sort(array(cents.map { case (id, cv, cn2) =>
      struct((lit(cn2) - lit(2L) * dotCol(col("v"), typedlit(cv))).as("score"),
        lit(id).as("cell"))
    }: _*))
    val q = quantized(anchors.select(col("vec_id"), col("embedding")))
      .join(anchors.select(col("vec_id"), col("label")), Seq("vec_id"))
      .filter(col("n2") > 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("n2").as("qn2"), col("label").as("q_label"),
        explode(slice(dists, 1, nprobe).getField("cell")).as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    saltedCellJoin(cand, q, cellSalt(embeddings, effCells))
      .filter(col("vec_id") =!= col("q_id") &&
        col("label") =!= col("q_label"))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .filter(col("cosine") < dupCeiling)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("label"), col("cosine"),
        col("rk"))
  }

  /** IVF-bucketed kNN JOIN — the scale path for [[knnJoin]]. Exact kNN
    * join is Θ(|queries| · |corpus|) dot products by contract (the
    * round-5 sf1 probe measured exactly that growth); here every query
    * probes only its `nprobe` nearest cells and ranks those cells'
    * members: work drops to ~|queries| · nprobe/nCells of the exact cost,
    * and the candidate join shuffles on the cell key, so at 100 TB it
    * rides a cell-partitioned index ([[writeIvfIndex]]) with partition
    * pruning. Approximate exactly like [[topKCosineIvf]] (a true neighbor
    * outside every probed cell is missed); fully deterministic — flat
    * codebook, integer assignment metric, (cosine desc, vec_id) ranking —
    * so the gate hash-compares against a DuckDB replica.
    *
    * A FIXED cell count does not survive corpus growth: per-cell occupancy
    * — and the candidate join, which is |queries| · nprobe · occupancy —
    * scales linearly with n (the sf10 probe measured the pinned
    * nCells = 16 gate at 6.8× wall on 10× data). Pass `nCells = 0` (the
    * default) to size the codebook from the corpus: the next power of two
    * of √n (the classic IVF nlist guidance, clamped to [16, 1024]) keeps
    * the two stages balanced — assignment costs n·nCells (so n^1.5, never
    * the n²/c of a fixed-occupancy target) while per-query candidates are
    * nprobe·√n. The sf10 probe measured 40 s (pinned 16) → 10 s (√n cells)
    * on 210k vectors × 2.1k queries. Explicit nCells remains for
    * oracle-pinned callers. */
  def knnJoinIvf(embeddings: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 0, nprobe: Int = 4): DataFrame = {
    val effCells =
      if (nCells > 0) nCells
      else adaptiveCells(math.max(1L, embeddings.count())) // one cheap count job
    require(k >= 1 && nprobe >= 1 && nprobe <= effCells,
      s"bad knnJoinIvf params: k=$k nprobe=$nprobe nCells=$effCells")
    val cents = codebook(embeddings, effCells)
    val cand = ivfAssignments(embeddings, cents).filter(col("n2") > 0)
    // per-query probe cells: rank literal-codebook distances in one narrow
    // projection, keep nprobe, explode to (q_id, cell) — no driver work
    val dists = array_sort(array(cents.map { case (id, cv, cn2) =>
      struct((lit(cn2) - lit(2L) * dotCol(col("v"), typedlit(cv))).as("score"),
        lit(id).as("cell"))
    }: _*))
    val q = quantized(queries).filter(col("n2") > 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"),
        explode(slice(dists, 1, nprobe).getField("cell")).as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    saltedCellJoin(cand, q, cellSalt(embeddings, effCells))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rk"))
  }

  /** Vector width the precomputed hyperplanes cover. Vectors may be
    * narrower (each plane dot runs over the row's own length); wider ones
    * raise a per-row error inside [[graft.functions.SigBitsKernel]]. */
  val MaxLshDims = graft.functions.SigBitsKernel.MaxDims

  /** nBits-bit random-hyperplane signature of each embedding
    * (dims ≤ [[MaxLshDims]] — wider vectors raise a per-row error rather
    * than silently zip_with-ing against nulls, which would collapse every
    * wide vector into signature 0 and degenerate the band join to n²).
    * The bit derivation (md5-parity hyperplanes, one primitive dot loop
    * per plane) lives in the codegen'd [[graft.functions.SigBits]]
    * expression — see its Scaladoc for the spelling history
    * (per-plane expression tree → boxed UDF → native kernel). */
  def lshSignatures(embeddings: DataFrame, nBits: Int): DataFrame =
    quantized(embeddings)
      .withColumn("sig", graft.functions.SigBits(col("v"), nBits))

  /** Materialize a sig-partitioned ANN index: one parquet directory per
    * signature bucket, so a probe's partition filter touches only its
    * candidate buckets' files — the 100 TB layout the LSH variant assumes. */
  def writeIndex(embeddings: DataFrame, path: String, nBits: Int = 12): Unit =
    lshSignatures(embeddings, nBits)
      .write.mode("overwrite").partitionBy("sig").parquet(path)

  /** All signatures within hamming distance `probeDist` of `sig` —
    * C(nBits,0..probeDist) values, the probe's partition IN-list. */
  def probeSignatures(sig: Long, nBits: Int, probeDist: Int): Seq[Long] = {
    def flips(start: Int, left: Int, acc: Long): Seq[Long] =
      if (left == 0) Seq(acc)
      else (start until nBits).flatMap(b => flips(b + 1, left - 1, acc ^ (1L << b)))
    (0 to probeDist).flatMap(d => flips(0, d, sig)).distinct
  }

  /** Probe a [[writeIndex]] layout: the partition column's IN-list prunes
    * to the candidate buckets at planning time; only those files are read
    * and exact-re-ranked. The query row lookup is a single-row collect. */
  def topKCosineLshIndexed(index: DataFrame, queryId: Long, k: Int,
      nBits: Int = 12, probeDist: Int = 2): DataFrame = {
    val qRow = index.filter(col("vec_id") === queryId && col("n2") > 0)
      .select(col("v"), col("n2"), col("sig").cast("long")).head()
    val qsig = qRow.getLong(2)
    val probes = probeSignatures(qsig, nBits, probeDist)
    // partition-directory type inference narrows sig to int: the IN-list
    // literals must match the raw column type or the cast defeats pruning
    val probeVals: Seq[Any] = index.schema("sig").dataType match {
      case org.apache.spark.sql.types.IntegerType => probes.map(_.toInt)
      case _ => probes
    }
    val spark = index.sparkSession
    import spark.implicits._
    val q = Seq((qRow.getSeq[Long](0), qRow.getLong(1))).toDF("qv", "qn2")
    index.filter(col("sig").isin(probeVals: _*))
      .filter(col("vec_id") =!= queryId && col("n2") > 0)
      .crossJoin(broadcast(q))
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Domain-affinity scoring against a seed-set centroid — the embedding-
    * space data-selection filter (score every corpus vector by cosine to
    * the mean of a curated seed set; keep the high-affinity tail). The
    * score is computed against the UNNORMALIZED per-dimension integer SUM
    * of the quantized seed vectors: cos(v, mean) == cos(v, sum) by scale
    * invariance, which keeps every intermediate an exact integer — no mean
    * division, doubles only in the final cosine, so the DuckDB oracle is
    * bit-exact (the ann-gate discipline).
    *
    * Scale shape: the seed aggregation reduces to ONE dim-sized row set
    * (collected and shipped as a literal array — the broadcast-codebook
    * pattern, bounded by the embedding dim); scoring is then a single
    * narrow scan of the corpus with a codegen'd [[graft.functions.DotI64]]
    * dot per row — no join, no shuffle, at any corpus size. Zero-norm
    * vectors carry no defined cosine and are excluded. */
  def centroidAffinity(embeddings: DataFrame, seedFilter: Column): DataFrame = {
    val q = quantized(embeddings)
    val agg = q.filter(seedFilter && col("n2") > 0)
      .select(posexplode(col("v")))
      .groupBy(col("pos")).agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .orderBy(col("pos")).collect()
    require(agg.nonEmpty, "empty or all-zero seed set")
    // seed sets are curated and structurally small; the cap keeps the
    // integer algebra exact: |s_d| <= nSeeds * maxq, and cn2 = Σ s_d² must
    // fit a long — with |quantized| <= ~2e3 that bounds nSeeds at ~1.9e5,
    // so 1e5 leaves 4x headroom (and the per-row dot stays < 2^45)
    require(agg.head.getLong(2) <= 100000L,
      s"seed set too large for exact integer centroid algebra " +
        s"(${agg.head.getLong(2)} > 100000); sample the seeds first")
    val sums = agg.map(_.getLong(1))
    val cn2 = sums.map(x => x * x).sum
    require(cn2 > 0, "seed centroid is the zero vector")
    q.filter(col("n2") > 0)
      .withColumn("dot", dotCol(col("v"), typedlit(sums.toSeq)))
      .withColumn("affinity", col("dot").cast("double") /
        sqrt(col("n2").cast("double") * lit(cn2.toDouble)))
      .select(col("vec_id"), col("affinity"))
  }

  // ---------------------------------------------------------------------
  // IVF (inverted-file) coarse quantization — codebook-partitioned layout
  // ---------------------------------------------------------------------

  /** √n-adaptive cell count (power of 2, clamped [16, 1024]): balances the
    * two IVF cost terms — assignment is n·nCells, candidate volume is
    * Σ cell² ≈ n²/nCells — so neither dominates as the corpus grows. The
    * production default wherever a caller does not pin nCells for a static
    * oracle (knnJoinIvf, the SemDeDup pair family). */
  private[graft] def adaptiveCells(n: Long): Int = {
    val target = java.lang.Long.highestOneBit(
      math.max(1L, math.sqrt(n.toDouble).toLong)) * 2
    math.max(16L, math.min(1024L, target)).toInt
  }

  /** Deterministic flat-IVF codebook: the quantized vectors of the nCells
    * lowest vec_ids, collected once on the driver. Codebooks are small by
    * design — production IVF broadcasts them exactly like this; k-means
    * refinement would change the centroid VALUES, not the assignment or
    * probe plans (and would break cross-engine determinism, which is what
    * the ann3 oracle buys). Returns (cell, centroid, ||c||²) by cell id. */
  private[graft] def codebook(embeddings: DataFrame, nCells: Int): Array[(Int, Seq[Long], Long)] =
    quantized(embeddings).filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("v"), col("n2")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)

  /** Cell assignment: nearest centroid by exact integer L2 — argmin over
    * `cn2 - 2·dot` (the ||v||² term is constant per row), ties to the
    * lowest cell id via struct ordering. One narrow projection against the
    * literal codebook: no join, no shuffle — at 100 TB this is the map-side
    * stage that feeds a `partitionBy("cell")` index write. */
  def ivfAssignments(embeddings: DataFrame, nCells: Int = 16): DataFrame =
    ivfAssignments(embeddings, codebook(embeddings, nCells))

  /** Assignment against an already-collected codebook (probe paths collect
    * it once for cell selection — don't run the collect job twice). */
  private[graft] def ivfAssignments(embeddings: DataFrame,
      cents: Array[(Int, Seq[Long], Long)]): DataFrame = {
    require(cents.nonEmpty, "empty IVF codebook")
    val best = array_min(array(cents.map { case (id, cv, cn2) =>
      struct((lit(cn2) - lit(2L) * dotCol(col("v"), typedlit(cv))).as("score"),
        lit(id).as("cell"))
    }: _*))
    quantized(embeddings).withColumn("cell", best.getField("cell"))
  }

  /** IVF codebook retraining — one Lloyd update step: every vector is
    * assigned to its nearest centroid (the exact integer metric the probe
    * path uses), then each cell's new centroid is the dimension-wise mean
    * of its members. Emitted per (cell, dim) so the aggregation is a plain
    * key-partitioned groupBy: the posexplode multiplies rows by the
    * dimension count, but each output group is (sum, count) of BIGINTs —
    * exact at any partitioning — and the shuffle key (cell, dim) spreads
    * uniformly across executors (no giant-cell hotspot, unlike grouping
    * whole vectors by cell). The mean is one IEEE double division of exact
    * integers — bit-identical in any engine. */
  def ivfRetrain(embeddings: DataFrame, nCells: Int = 16): DataFrame =
    ivfAssignments(embeddings, nCells)
      .select(col("cell").cast("long").as("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("dim", col("dim").cast("long"))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("x")).as("sum_q"))
      .withColumn("mean_q",
        col("sum_q").cast("double") / col("n_vecs").cast("double"))

  /** IVF probe: exact cosine top-k restricted to the `nprobe` cells whose
    * centroids are nearest the query under the same integer metric the
    * assignment used. The cell IN-list prunes at planning time — against a
    * cell-partitioned index it is partition pruning, the same layout story
    * as [[topKCosineLshIndexed]]. */
  def topKCosineIvf(embeddings: DataFrame, queryId: Long, k: Int,
      nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = codebook(embeddings, nCells)
    val qRow = quantized(embeddings.filter(col("vec_id") === queryId))
      .filter(col("n2") > 0).select(col("v"), col("n2")).head()
    val qv = qRow.getSeq[Long](0)
    val qn2 = qRow.getLong(1)
    def dotLocal(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val probeCells: Seq[Any] = cents
      .map { case (id, cv, cn2) => (cn2 - 2L * dotLocal(qv, cv), id) }
      .sorted.take(nprobe).map(_._2).toSeq
    ivfAssignments(embeddings, cents)
      .filter(col("cell").isin(probeCells: _*) &&
        col("vec_id") =!= queryId && col("n2") > 0)
      .withColumn("dot", dotCol(col("v"), typedlit(qv)))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * lit(qn2.toDouble)))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Materialize a cell-partitioned IVF index: one parquet directory per
    * codebook cell, so a probe's IN-list touches only its cells' files —
    * the same partition-pruning layout as [[writeIndex]]. */
  def writeIvfIndex(embeddings: DataFrame, path: String, nCells: Int = 16): Unit =
    ivfAssignments(embeddings, nCells)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Incremental maintenance of a [[writeIvfIndex]] layout: the batch is
    * assigned under the index's FROZEN codebook (recovered exactly as the
    * probe recovers it — the flat-codebook invariant) and appended
    * cell-partitioned. Ingest touches ONLY the cell directories the batch
    * lands in; existing cells are never rewritten; and because assignment
    * is a pure per-row function of (vector, codebook), the maintained
    * index is bit-identical to a full rebuild over the union at the same
    * codebook. The 100 TB ingest path: assignment is map-side against the
    * literal codebook (no shuffle), the write is a partitionBy append —
    * the vector rung of the incrementally-maintained index family
    * (postings ev15, backlinks ev16). */
  def appendIvfIndex(index: DataFrame, batch: DataFrame, path: String,
      nCells: Int = 16): Unit = {
    val cents = index.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("v"), col("n2")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    ivfAssignments(batch, cents)
      .write.mode("append").partitionBy("cell").parquet(path)
  }

  /** Probe a [[writeIvfIndex]] layout: the codebook is recovered from the
    * index itself (vec_id < nCells — the flat-codebook invariant), the
    * nprobe nearest cells become a partition IN-list, and only those files
    * are read and exact-re-ranked. */
  def topKCosineIvfIndexed(index: DataFrame, queryId: Long, k: Int,
      nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = index.filter(col("vec_id") < nCells)
      .select(col("vec_id"), col("v"), col("n2")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    val qRow = index.filter(col("vec_id") === queryId && col("n2") > 0)
      .select(col("v"), col("n2")).head()
    val qv = qRow.getSeq[Long](0)
    val qn2 = qRow.getLong(1)
    def dotLocal(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val probes = cents
      .map { case (id, cv, cn2) => (cn2 - 2L * dotLocal(qv, cv), id) }
      .sorted.take(nprobe).map(_._2)
    // partition-directory type inference may widen/narrow cell: match the
    // raw column type or the cast defeats pruning (same trap as writeIndex)
    val probeVals: Seq[Any] = index.schema("cell").dataType match {
      case org.apache.spark.sql.types.LongType => probes.map(_.toLong).toSeq
      case _ => probes.toSeq
    }
    index.filter(col("cell").isin(probeVals: _*))
      .filter(col("vec_id") =!= queryId && col("n2") > 0)
      .withColumn("dot", dotCol(col("v"), typedlit(qv)))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * lit(qn2.toDouble)))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ) — subspace codebooks + ADC search
  // ---------------------------------------------------------------------

  /** Deterministic PQ codebook: the vector is split into `m` equal
    * subspaces; subspace `j`'s `kCodes` centroids are the j-th sub-vectors
    * of the `kCodes` lowest vec_ids (the same training-free convention as
    * the IVF [[codebook]] — refinement would change centroid VALUES but not
    * the operator shape, and the fixed codebook is what makes the gate
    * engine-exact). Returns cents(subspace)(code) = quantized sub-vector. */
  private def pqCodebook(embeddings: DataFrame, m: Int,
      kCodes: Int): Array[Array[(Int, Seq[Long])]] = {
    val rows = quantized(embeddings).filter(col("vec_id") < kCodes)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Long](1))).sortBy(_._1)
    // pqEncode packs codes positionally (acc*kCodes + code) and topKAdc
    // resolves distances via element_at(lut, code+1): both assume the
    // training ids are EXACTLY the dense set 0..kCodes-1. A sparse or
    // offset id space would silently produce wrong codes/distances, so
    // reject it here rather than downstream.
    require(rows.length == kCodes && rows.map(_._1).toSeq == (0 until kCodes),
      s"PQ codebook needs dense vec_ids 0..${kCodes - 1}; " +
        s"got ${rows.length} rows [${rows.take(5).map(_._1).mkString(",")}…]")
    val dim = rows.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val ds = dim / m
    Array.tabulate(m) { j =>
      rows.map { case (id, v) => (id, v.slice(j * ds, (j + 1) * ds)) }
    }
  }

  /** PQ encoding: every vector compresses to `m` code bytes — subspace j's
    * code is the centroid nearest its j-th sub-vector by exact integer L2,
    * ties to the lowest code. 64 f32 dims become 4 bytes (64× smaller), the
    * compression that lets a 100 TB embedding corpus fit hot storage.
    * One narrow projection against the literal codebook — no join, no
    * shuffle, whole corpus encoded in a single map-side pass. Codes also
    * pack into one BIGINT (`pq_code`) for storage/grouping. */
  def pqEncode(embeddings: DataFrame, m: Int = 4, kCodes: Int = 16): DataFrame = {
    val cents = pqCodebook(embeddings, m, kCodes)
    val ds = cents(0)(0)._2.length
    val enc = quantized(embeddings)
    val codeCols = (0 until m).map { j =>
      val sub = slice(col("v"), j * ds + 1, ds)
      // ||sub - c||² = cn2 - 2·dot + ||sub||²; the last term is constant
      // per (row, subspace) so the argmin only needs cn2 - 2·dot
      array_min(array(cents(j).map { case (code, cv) =>
        val cn2 = cv.map(x => x * x).sum
        struct((lit(cn2) - lit(2L) * dotCol(sub, typedlit(cv))).as("score"),
          lit(code).as("code"))
      }: _*)).getField("code").cast("long").as(s"code_$j")
    }
    val packed = (0 until m).reverse
      .foldLeft(lit(0L)) { (acc, j) => acc * kCodes + col(s"code_$j") }
    enc.select(col("vec_id") +: col("v") +: col("n2") +: codeCols: _*)
      .withColumn("pq_code", packed)
  }

  /** ADC (asymmetric distance computation) top-k: the query stays exact;
    * every corpus vector contributes only its `m` codes, and its distance
    * is the sum of per-subspace ||q_sub − centroid(code)||² looked up from
    * a driver-built m×kCodes table (integer-exact, so fully oracle-able).
    * The lookup tables ship as array LITERALS inside one projection —
    * at scale this reads ONLY the code columns (4 bytes/vector, not the
    * 256-byte vector), which is the entire point of PQ search. */
  /** ADC distance column over `code_0..code_{m-1}`: lut(j)(code) = exact
    * ||q_sub_j - cent||², shipped as literal arrays — the scan resolves
    * each row's distance with m array lookups and never touches a vector. */
  private def adcDistCol(cents: Array[Array[(Int, Seq[Long])]],
      qv: Seq[Long], m: Int, ds: Int): Column = {
    val lut: Array[Seq[Long]] = Array.tabulate(m) { j =>
      val qsub = qv.slice(j * ds, (j + 1) * ds)
      cents(j).map { case (_, cv) =>
        qsub.iterator.zip(cv.iterator).map { case (a, b) => (a - b) * (a - b) }.sum
      }.toSeq
    }
    (0 until m).map { j =>
      element_at(typedlit(lut(j)), col(s"code_$j").cast("int") + 1)
    }.reduce(_ + _)
  }

  def topKAdc(embeddings: DataFrame, queryId: Long, k: Int,
      m: Int = 4, kCodes: Int = 16): DataFrame = {
    val cents = pqCodebook(embeddings, m, kCodes)
    val ds = cents(0)(0)._2.length
    val qv = quantized(embeddings.filter(col("vec_id") === queryId))
      .select(col("v")).head().getSeq[Long](0)
    pqEncode(embeddings, m, kCodes)
      .filter(col("vec_id") =!= queryId)
      .withColumn("adc_dist", adcDistCol(cents, qv, m, ds))
      .select(col("vec_id"), col("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
      .limit(k)
  }

  /** ADC probe against a MATERIALIZED code table ([[graft.Store.pqIndex]]):
    * identical distances to [[topKAdc]], but the per-query scan reads ONLY
    * the m small code columns of the index — the corpus's vectors are
    * never read at query time. The codebook rows and the query vector
    * resolve as kCodes+1 point reads on the embeddings table (driver-side,
    * pushed down). At 100 TB this is the PQ serving path: codes are ~2
    * orders of magnitude smaller than the vectors, so the whole index fits
    * where the corpus cannot, and top-k plans as TakeOrderedAndProject. */
  def topKAdcIndexed(index: DataFrame, embeddings: DataFrame, queryId: Long,
      k: Int, m: Int = 4, kCodes: Int = 16): DataFrame = {
    val cents = pqCodebook(embeddings, m, kCodes)
    val ds = cents(0)(0)._2.length
    val qv = quantized(embeddings.filter(col("vec_id") === queryId))
      .select(col("v")).head().getSeq[Long](0)
    index.filter(col("vec_id") =!= queryId)
      .withColumn("adc_dist", adcDistCol(cents, qv, m, ds))
      .select(col("vec_id"), col("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id"))
      .limit(k)
  }

  /** Symmetric int8 quantization of every embedding — the storage-compression
    * pass that shrinks a 100 TB f32 embedding corpus 4× before indexing:
    * per-vector scale = max |component| (in the repo's 1/1000 quantized
    * units), code_i = round(v_i · 127 / scale) ∈ [−127, 127]. The rounding
    * is PURE INTEGER (`sign · ((2·|v|·127 + scale) div (2·scale))`), so the
    * codes are engine-exact with no float-rounding-mode hazard. Emits one
    * summary row per vector (dims, scale, code checksum + md5 — enough for
    * the oracle to pin every code without hashing an array column).
    * Zero-norm vectors are skipped (nothing to scale). Narrow projection,
    * no shuffle. */
  def int8Quantize(embeddings: DataFrame): DataFrame = {
    // floor-of-double IS the integer division here: numerator/denominator
    // are < 2^22, so a non-integer quotient sits ≥ 1/denominator ≈ 5e-5
    // from any integer while the division error is ~1e-14 — floor cannot
    // misround (the oracle uses BIGINT `//` directly)
    val codes = transform(col("v"), x => {
      val a = abs(x)
      val q = floor((a * 254 + col("vmax")) / (col("vmax") * 2)).cast("long")
      when(x < 0, -q).otherwise(q)
    })
    quantized(embeddings)
      .withColumn("vmax", array_max(transform(col("v"), x => abs(x))))
      .filter(col("vmax") > 0)
      .withColumn("codes", codes)
      .select(col("vec_id"),
        size(col("v")).cast("long").as("n_dims"),
        col("vmax").as("scale_q"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
        md5(array_join(col("codes"), ",")).as("code_hash"))
  }

  /** ANN top-k: exact re-rank restricted to vectors whose signature is
    * within `probeDist` hamming bits of the query's signature. */
  def topKCosineLsh(embeddings: DataFrame, queryId: Long, k: Int,
      nBits: Int = 12, probeDist: Int = 2): DataFrame = {
    val sigs = lshSignatures(embeddings, nBits)
    val q = sigs.filter(col("vec_id") === queryId)
      .filter(col("n2") > 0)
      .select(col("v").as("qv"), col("n2").as("qn2"), col("sig").as("qsig"))
    sigs.filter(col("vec_id") =!= queryId && col("n2") > 0)
      .crossJoin(broadcast(q))
      .filter(bit_count(col("sig").bitwiseXOR(col("qsig"))) <= probeDist)
      .withColumn("dot", dotCol(col("v"), col("qv")))
      .withColumn("cosine",
        col("dot").cast("double") / sqrt(col("n2").cast("double") * col("qn2").cast("double")))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
