package graft.pipeline

import graft.SparkSpec
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Ann
import graft.text.TextAnalysis
import graft.Tables
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = PipelineQueries.corpus(spark, sf0001)

  test("exact dedup finds every planted copy and nothing where text is unique") {
    val groups = Dedup.exactDuplicates(planted).collect()
    val nPlanted = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 25 === 0).count()
    assert(groups.length == nPlanted)
    assert(groups.forall(_.getAs[Long]("n_copies") == 2L))
  }

  test("minhash LSH finds all planted exact copies (sim 1.0) and near-copies") {
    val pairs = Dedup.minhashLshPairs(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val docs = Tables.documents(spark, sf0001)
    val exactIds = docs.filter(col("doc_id") % 25 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    exactIds.foreach { id =>
      assert(pairs.get((id, id + 200000)).contains(1.0),
        s"exact copy pair ($id, ${id + 200000}) missing or sim != 1.0")
    }
    // near-copies share almost all shingles → high estimated sim
    val nearIds = docs.filter(col("doc_id") % 50 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    val found = nearIds.count(id => pairs.contains((id, id + 400000)))
    assert(found >= nearIds.length * 8 / 10,
      s"LSH missed too many near-copies: $found of ${nearIds.length}")
  }

  test("simhash: identical docs distance 0; near-copies within distance 3") {
    val pairs = Dedup.simhashPairs(planted, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sf0001)
    val exactIds = docs.filter(col("doc_id") % 25 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    exactIds.foreach { id =>
      assert(pairs.get((id, id + 200000)).contains(0L),
        s"identical pair ($id,+200000) should have distance 0")
    }
  }

  test("LSH ANN: identical vector always found as top-1; ranking is cosine-desc") {
    val e = Tables.embeddings(spark, sf0001)
    // plant an exact copy of the query vector — same signature bucket by
    // construction, so LSH must return it first with cosine ~1.0
    val withCopy = e.select(col("vec_id"), col("embedding")).unionByName(
      e.filter(col("vec_id") === 0)
        .select(lit(99999L).as("vec_id"), col("embedding")))
    val lsh = Ann.topKCosineLsh(withCopy, 0, 10).collect()
    assert(lsh.nonEmpty && lsh.head.getLong(0) == 99999L)
    assert(lsh.head.getDouble(1) > 0.9999)
    val cosines = lsh.map(_.getDouble(1)).toSeq
    assert(cosines == cosines.sorted.reverse, "LSH results must rank by cosine desc")
    // and LSH candidates are a subset re-ranked identically to brute force
    val brute = Ann.topKCosine(withCopy, 0, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    lsh.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
  }

  test("sig-partitioned ANN index: probe prunes partitions, results match unindexed LSH") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    val e = Tables.embeddings(spark, sf0001)
    Ann.writeIndex(e, dir)
    val index = spark.read.parquet(dir)
    val got = Ann.topKCosineLshIndexed(index, 3, 10)
    val want = Ann.topKCosineLsh(e, 3, 10).collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want)
    // physical proof: the probe IN-list reached the scan as a partition filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sig#"),
      s"expected partition filter on sig in:\n$plan")
    // probe-set arithmetic: C(12,0)+C(12,1)+C(12,2) distinct signatures
    assert(Ann.probeSignatures(0L, 12, 2).length == 1 + 12 + 66)
  }

  test("jaccard pairs: planted near-copies pass threshold with correct arithmetic") {
    val rows = Dedup.ngramJaccardPairs(planted, 3, 0.6).collect()
    rows.foreach { r =>
      val (inter, un, j) = (r.getAs[Long]("inter"), r.getAs[Long]("un"), r.getAs[Double]("jaccard"))
      assert(j == inter.toDouble / un.toDouble && j >= 0.6 && j <= 1.0)
    }
    // exact copies must appear with jaccard 1.0
    assert(rows.exists(r => r.getAs[Double]("jaccard") == 1.0))
  }

  test("embed cosine: distributed kernel stays on the cluster (no driver collect)") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val df = Dedup.embeddingCosinePairs(e, 0.99)
    // a collect()-based kernel shows a LocalTableScan/LocalRelation leaf;
    // the distributed one keeps the parquet scan in the plan
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("LocalTableScan"), s"driver-side materialization leaked:\n$p")
    assert(p.contains("Scan parquet"), s"expected parquet scan leaf:\n$p")
  }

  test("embed cosine: LSH output equals exact output on the planted corpus") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val planted = e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val exact = Dedup.embeddingCosinePairs(planted, 0.99)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lsh = Dedup.embeddingCosinePairsLsh(planted, 0.99, nBits = 24)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.nonEmpty && exact.toSeq == lsh.toSeq)
    // and the blocked kernel agrees with itself under a different blocking
    val small = Dedup.embeddingCosinePairs(planted, 0.99, blockSize = 7)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(small.toSeq == exact.toSeq)
  }

  test("ivf knn join: per-query rows equal the single-query IVF probe") {
    val e = Tables.embeddings(spark, sf0001)
    val joined = Ann.knnJoinIvf(e, e.filter(col("vec_id") === 7), k = 10)
      .orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val single = Ann.topKCosineIvf(e, 7, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(joined.toSeq == single.toSeq,
      s"batch IVF join diverged from the single-query probe:\n$joined\n$single")
  }

  test("lsh-verified jaccard is a subset of exact jaccard with identical arithmetic") {
    val exact = Dedup.ngramJaccardPairs(planted, 3, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val verified = Dedup.lshVerifiedJaccardPairs(planted, 3, 8, 4, 0.6).collect()
    assert(verified.nonEmpty)
    verified.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key), s"pair $key not in exact output")
      assert(exact(key) == ((r.getLong(2), r.getLong(3), r.getDouble(4))),
        s"arithmetic mismatch for $key")
    }
    // planted exact copies (jaccard 1.0) always collide — must all be present
    val exactIds = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 25 === 0).select("doc_id").collect().map(_.getLong(0))
    val keys = verified.map(r => (r.getLong(0), r.getLong(1))).toSet
    exactIds.foreach(id => assert(keys.contains((id, id + 200000)),
      s"planted exact pair ($id,+200000) missed by LSH bands"))
  }

  test("image codec: ImageIO round-trip matches the closed-form pixel pattern") {
    val bytes = Multimodal.ImageCodec.syntheticBmp(7, 5, 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 5 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val v = (7 * 31 + x * 7 + y * 13) % 256
      val rgb = img.getRGB(x, y)
      assert((rgb & 0xff) == v && ((rgb >> 8) & 0xff) == v && ((rgb >> 16) & 0xff) == v,
        s"pixel ($x,$y) decoded ${rgb.toHexString}, expected gray $v")
    }
    val s = Multimodal.ImageCodec.decode(bytes)
    val expectedSum = (for (y <- 0 until 3; x <- 0 until 5)
      yield (7 * 31 + x * 7 + y * 13) % 256).sum.toLong
    assert(s.pxSum == expectedSum && s.width == 5 && s.height == 3)
    // image-kind payloads with the BMP magic route through the real decoder
    val f = Multimodal.FakeCodec.decode("image", bytes)
    assert(f.checksum == expectedSum)
    // row padding exercised: widths not divisible by 4 must still round-trip
    (1 to 8).foreach { w =>
      val st = Multimodal.ImageCodec.decode(Multimodal.ImageCodec.syntheticBmp(3, w, 2))
      assert(st.width == w && st.height == 2, s"width $w")
    }
  }

  test("dHash: independently-derived reference values, equal images hash equal, Hamming from halves") {
    import Multimodal.ImageCodec
    def h(seed: Long) = ImageCodec.dHash(
      ImageCodec.syntheticBmp(seed, (seed % 16).toInt + 1, (seed % 12).toInt + 1))
    // references computed OUTSIDE the JVM from the closed-form pixels
    assert(h(1L) == ((134744072L, 134744072L, 8L)), s"seed 1: ${h(1L)}")
    assert(h(2L) == ((606348324L, 606348324L, 16L)), s"seed 2: ${h(2L)}")
    assert(h(387L) == ((707406378L, 572664362L, 22L)), s"seed 387: ${h(387L)}")
    // byte-identical images always hash equal (the dedup contract)
    assert(h(42L) == h(42L))
    // Hamming distance composes from the halves with no sign traps
    val (h1, l1, _) = h(1L); val (h2, l2, _) = h(2L)
    val d = java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    assert(d > 0 && d <= 64, s"degenerate distance $d")
  }

  test("audio fingerprint: hand-computed frame energies, partial tail frame, identical clips equal") {
    import Multimodal.AudioCodec
    // seed 3, 10 samples: abs amplitude 32675-7i strictly falls, so both
    // frame-pair bits are 0 (frames of 4,4,2 samples)
    assert(AudioCodec.fingerprint(AudioCodec.syntheticWav(3, 10), 4) ==
      ((3L, 0L, 0L)))
    // seed 1056 wraps the 16-bit midpoint at i=5: energies 86, 34, 138 ->
    // bits (0,1) MSB-first = fp 1
    assert(AudioCodec.fingerprint(AudioCodec.syntheticWav(1056, 12), 4) ==
      ((3L, 1L, 1L)))
    // byte-identical clips always fingerprint equal (the dedup contract)
    val a = AudioCodec.fingerprint(AudioCodec.syntheticWav(42, 37), 4)
    assert(a == AudioCodec.fingerprint(AudioCodec.syntheticWav(42, 37), 4))
    assert(a._1 == 10L, s"37 samples at frame 4 -> 10 frames: $a")
  }

  test("image resize: nearest-neighbor floor mapping, exact through BMP re-encode") {
    import Multimodal.ImageCodec
    // 10x6 -> 5x3: src = dst*srcDim/outDim, every output pixel from the
    // closed form at the sampled coordinate
    val resized = ImageCodec.decode(ImageCodec.resize(
      ImageCodec.syntheticBmp(7, 10, 6), 5, 3))
    val expected = (for (y <- 0 until 3; x <- 0 until 5)
      yield (7 * 31 + (x * 10 / 5) * 7 + (y * 6 / 3) * 13) % 256).sum.toLong
    assert(resized.width == 5 && resized.height == 3 && resized.pxSum == expected,
      s"got $resized, expected pxSum $expected")
    // identity resize preserves the image bit-for-bit (floor mapping is
    // exact when dims match)
    val same = ImageCodec.decode(ImageCodec.resize(ImageCodec.syntheticBmp(9, 5, 3), 5, 3))
    assert(same == ImageCodec.decode(ImageCodec.syntheticBmp(9, 5, 3)))
    // upscale replicates source pixels (4 copies each at 2x)
    val up = ImageCodec.decode(ImageCodec.resize(ImageCodec.syntheticBmp(3, 2, 2), 4, 4))
    val srcSum = ImageCodec.decode(ImageCodec.syntheticBmp(3, 2, 2)).pxSum
    assert(up.pxSum == srcSum * 4, s"2x upscale should quadruple pxSum: $up vs $srcSum")
    intercept[IllegalArgumentException](ImageCodec.resize(Array[Byte](1, 2, 3), 2, 2))
  }

  test("deterministic split: stable fractions, repartition-invariant, salt-sensitive") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"))
    val s1 = TextAnalysis.deterministicSplit(docs, "doc_id", "graft", 100, 50)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    // md5 is uniform: 10% val / 5% test within sampling noise at n=500
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.10) < 0.05, counts.toString)
    assert(math.abs(counts.getOrElse("test", 0L) / n - 0.05) < 0.04, counts.toString)
    // invariant under physical layout — the property rand() does not have
    val a = s1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.deterministicSplit(docs.repartition(7), "doc_id", "graft", 100, 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // a different salt draws a different split
    val c = TextAnalysis.deterministicSplit(docs, "doc_id", "other", 100, 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
  }

  test("sequence packing: offsets stay under budget, packs monotone per source") {
    val packed = TextAnalysis.packForTraining(Tables.documents(spark, sf0001), budget = 512)
      .collect()
    assert(packed.nonEmpty)
    packed.foreach { r =>
      val off = r.getAs[Long]("token_offset")
      assert(off >= 0 && off < 512, s"offset $off out of [0, 512)")
    }
    // within a source, later docs never start in an earlier pack
    packed.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val byDoc = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("pack_id"))
      assert(byDoc.zip(byDoc.tail).forall { case (a, b) => a <= b })
    }
    // full-result determinism across independent evaluations and input
    // partitionings: the running sum is windowed over (source, doc_id),
    // which is a total order — any value or ordering flake here would
    // reproduce the driver-gate hash mismatch recorded in round 3 (never
    // reproduced locally across 7 runs x 3 scales; pinned to stay that way)
    def snap(): Seq[(Long, String, Long, Long, Long)] =
      TextAnalysis.packForTraining(
          Tables.documents(spark, sf0001).repartition(11), budget = 512)
        .orderBy(col("doc_id")).collect().toSeq
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id"),
          r.getAs[Long]("token_offset")))
    val s1 = snap()
    assert(s1 == snap(), "packForTraining output is not deterministic")
  }

  test("lm surprisal: common-token docs score lower; exact integer keys are partition-invariant") {
    // corpus: 'the' appears in every doc (common), 'xylophone' once (rare)
    val docs = Seq(
      (1L, "the the the the"),          // all common tokens -> low surprisal
      (2L, "the xylophone"),            // one rare token -> higher mean
      (3L, ""),                         // empty -> absent from output
      (4L, "the quark")).toDF("doc_id", "text")
    val got = TextAnalysis.lmSurprisal(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!got.contains(3L), "empty doc must have no surprisal row")
    assert(got(1L)._1 == 4L && got(2L)._1 == 2L)
    assert(got(1L)._3 < got(2L)._3, s"common-only doc must score lower: $got")
    // the mean key is exact integer division of exact integer sums
    got.values.foreach { case (n, sumK, meanK) => assert(meanK == sumK / n) }
    // partition-invariance: per-token quantization before the sum means NO
    // double summation order can leak into the result
    val re = TextAnalysis.lmSurprisal(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(re == got)
  }

  test("stratified sample: rates respected exactly, deterministic, subset of corpus") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("source"))
    val rates = Map("src0" -> 1000, "src1" -> 0)
    val got = TextAnalysis.stratifiedSample(docs, "doc_id", "source", rates, 500, "graft")
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == totals("src0"), "rate 1000 must keep every doc")
    assert(!bySrc.contains("src1"), "rate 0 must keep nothing")
    // default-rate strata keep roughly half (md5 slots are uniform)
    val defSrcs = totals.keySet -- rates.keySet
    val kept = defSrcs.toSeq.map(s => bySrc.getOrElse(s, 0L)).sum.toDouble
    val all = defSrcs.toSeq.map(totals).sum.toDouble
    assert(kept / all > 0.35 && kept / all < 0.65, s"default rate off: ${kept / all}")
    // reshuffled input draws the identical sample (md5 slots, not rand())
    val re = TextAnalysis.stratifiedSample(docs.repartition(13), "doc_id",
      "source", rates, 500, "graft")
    assert(re.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("pii scrub: counts planted identifiers, redaction is idempotent on clean docs") {
    val docs = Seq(
      (1L, "reach me at jane.doe@corp.example.com or bob+spam@x.io today"),
      (2L, "server 192.168.0.1 talked to 10.0.0.255 overnight"),
      (3L, "no identifiers in this perfectly clean sentence")).toDF("doc_id", "text")
    val got = TextAnalysis.piiReport(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == 0L)
    assert(got(2L)._1 == 0L && got(2L)._2 == 2L)
    assert(got(3L)._1 == 0L && got(3L)._2 == 0L)
    // a clean doc's redacted hash is the hash of its unmodified text
    val cleanHash = docs.filter(col("doc_id") === 3)
      .select(md5(col("text"))).head().getString(0)
    assert(got(3L)._3 == cleanHash)
    // redacted text of a PII doc no longer matches the PII patterns
    val redacted = docs.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), lit(TextAnalysis.EmailRe),
        lit("<EMAIL>")), lit(TextAnalysis.Ipv4Re), lit("<IP>")).as("text"))
    val rescrub = TextAnalysis.piiReport(redacted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rescrub.values.forall(c => c._1 == 0L && c._2 == 0L),
      s"redaction left live PII behind: $rescrub")
  }

  test("incremental bloom dedup: exact regardless of filter saturation") {
    val ref = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")).toDF("doc_id", "text")
    val incoming = Seq((10L, "alpha beta gamma"), (11L, "totally new content"),
      (12L, "eta theta iota"), (13L, "also never seen")).toDF("doc_id", "text")
    val got = Dedup.incrementalDuplicates(incoming, ref, expectedRefDocs = 100)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 12L), s"expected dups {10,12}, got $got")
    // a deliberately under-sized (saturated, high-fp) bloom filter changes
    // NOTHING: every false positive dies in the exact confirm join (sized
    // for ONE key at fpp 0.5 = 2 bits total, then 3 keys inserted)
    val saturated = Dedup.incrementalDuplicates(incoming, ref,
      expectedRefDocs = 1, fpp = 0.5).collect().map(_.getLong(0)).sorted.toSeq
    assert(saturated == got, "bloom sizing leaked into results")
    // parity with the plain semi-join on the sf corpus slice
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val inc = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 600000).as("doc_id"), col("text"))
    val viaBloom = Dedup.incrementalDuplicates(inc, docs, 100000)
      .collect().map(_.getLong(0)).sorted.toSeq
    val plain = inc.withColumn("text_hash", md5(col("text")))
      .join(docs.select(md5(col("text")).as("text_hash")).distinct(),
        Seq("text_hash"), "left_semi")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(viaBloom == plain)
  }

  test("boilerplate strip: repeated window removed, unique prose and short tails survive") {
    // both docs share the same 8-token licence header; prose differs
    val header = "this work is licensed under creative commons attribution"
    val df = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta theta unique one"),
      (2L, s"$header different prose follows here with its own words kept two"),
      (3L, s"$header")).toDF("doc_id", "text") // doc 3 is ALL boilerplate
    val got = Dedup.stripRepeatedPassages(df, w = 8, minDocs = 2, minTail = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: header chunk dropped; its own two chunks (8 + 2 tokens) kept
    val doc1Clean = "alpha beta gamma delta epsilon zeta eta theta unique one"
    assert(got(1L)._2 == 2L && got(1L)._3 == 1L, s"doc1 counts: ${got(1L)}")
    assert(got(1L)._1 == md5Hex(doc1Clean), "doc1 rebuilt text wrong")
    // doc 3: everything boilerplate -> empty rebuild, all chunks dropped
    assert(got(3L) == (md5Hex(""), 0L, 1L), s"doc3: ${got(3L)}")
    // tail rule: a sub-minTail tail shared across docs is NOT boilerplate
    val tails = Seq(
      (1L, "first document body text goes right here padding the window the"),
      (2L, "second body also completely distinct tokens inside this very window the"))
      .toDF("doc_id", "text")
    val kept = Dedup.stripRepeatedPassages(tails, w = 10, minDocs = 2, minTail = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(kept.values.forall(_ == 0L), s"short shared tail wrongly stripped: $kept")
  }

  test("pl1 composition reads the corpus exactly once (fused metric columns)") {
    val df = PipelineQueries.queries("pl1_filter_dedup_split")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected ONE corpus scan, plan has $scans:\n$plan")
    val bySplit = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L),
      s"train split should dominate: $bySplit")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("dedup components: transitive clusters resolve to the smallest doc_id") {
    import spark.implicits._
    // hand-built graph: chain 1-2-3, pair 10-11, triangle 20-21-22 + bridge 22-23
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (20L, 22L), (22L, 23L)).toDF("a", "b")
    val got = Dedup.dedupComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    // planted exact copies cluster with their source as canonical
    val comps = Dedup.dedupComponents(Dedup.minhashLshPairs(planted)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactIds = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 25 === 0).select("doc_id").collect().map(_.getLong(0))
    exactIds.foreach { id =>
      assert(comps.get(id + 200000).contains(comps.getOrElse(id, id)),
        s"copy ${id + 200000} not clustered with $id")
    }
  }

  test("IVF ANN: assignment covers every vector; probe scores match brute force") {
    val e = Tables.embeddings(spark, sf0001)
    val assigned = Ann.ivfAssignments(e, nCells = 16)
    assert(assigned.count() == e.count(), "every vector gets a cell")
    val cells = assigned.select("cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 16), s"cell out of codebook range: ${cells.mkString(",")}")
    // a planted exact copy of the query vector lands in the query's own
    // cell (identical metric) and must surface as top-1 with cosine ~1.0
    val withCopy = e.select(col("vec_id"), col("embedding")).unionByName(
      e.filter(col("vec_id") === 7)
        .select(lit(99999L).as("vec_id"), col("embedding")))
    val ivf = Ann.topKCosineIvf(withCopy, 7, 10).collect()
    assert(ivf.nonEmpty && ivf.head.getLong(0) == 99999L && ivf.head.getDouble(1) > 0.9999)
    // IVF candidates re-rank with the SAME exact arithmetic as brute force
    val brute = Ann.topKCosine(withCopy, 7, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
  }

  test("cell-partitioned IVF index: probe prunes partitions, results match unindexed IVF") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val e = Tables.embeddings(spark, sf0001)
    Ann.writeIvfIndex(e, dir)
    val index = spark.read.parquet(dir)
    val got = Ann.topKCosineIvfIndexed(index, 7, 10)
    val want = Ann.topKCosineIvf(e, 7, 10).collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want)
    // physical proof: the probe IN-list reached the scan as a partition filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell IN-list did not prune partitions:\n$plan")
  }

  test("ann9 gate: materialized Store.ivfIndex probe prunes partitions, matches direct IVF") {
    val got = PipelineQueries.queries("ann9_ivf_indexed")(spark, sf0001)
    // the gate's result must be bit-identical to the un-indexed probe (the
    // index write/read roundtrip and the oracle both pin this)
    val want = Ann.topKCosineIvf(Tables.embeddings(spark, sf0001), 13, 10)
      .collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"materialized-index probe did not prune cell partitions:\n$plan")
  }

  test("repetition stats: looped text scores high, distinct text scores zero") {
    val df = Seq(
      (1L, "a b c a b c a b c"), // 9 tokens, 7 grams, 3 distinct rotations
      (2L, "one two three four five six"), // all 3-grams distinct
      (3L, "hi there"), // < n tokens → no grams
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((7L, 3L, 1.0 - 3.0 / 7.0)))
    assert(got(2L) == ((4L, 4L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("per-source cap keeps exactly min(cap, group size), stable across partitionings") {
    val docs = Tables.documents(spark, sf0001)
    val capped = TextAnalysis.capPerSource(docs, cap = 7, salt = "graft")
    val perSource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val groupSizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    groupSizes.foreach { case (src, n) =>
      assert(perSource(src) == math.min(7L, n), s"source $src kept ${perSource.get(src)}")
    }
    // md5 priority is row-order independent: a shuffled input keeps the same set
    val shuffled = TextAnalysis.capPerSource(docs.repartition(13), cap = 7, salt = "graft")
    assert(shuffled.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // Spark 4 plans the rank-limit window as a map-side WindowGroupLimit —
    // the whole corpus is never globally sorted
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"rank filter not pushed:\n$plan")
  }

  test("repeated passages: byte-identical docs share every passage, reported once each") {
    val df = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (30L, "totally different words with no shared window at all here")).toDF("doc_id", "text")
    val got = Dedup.repeatedPassages(df, w = 8).collect()
    // 10 tokens → chunks [1..8], [9..10]: two shared passages, docs {10, 20}
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_occurrences") == 2L &&
        r.getAs[Long]("canonical_doc") == 10L)
    }
    // a passage repeated INSIDE one doc does not cross the n_docs > 1 bar
    val solo = Seq((1L, ("w1 w2 w3 w4 w5 w6 w7 w8 " * 2).trim)).toDF("doc_id", "text")
    assert(Dedup.repeatedPassages(solo, w = 8).count() == 0)
    // minTail drops the short final chunk: the 2-token tail [9..10] is a
    // near-certain cross-doc collision source (e.g. a trailing "the") —
    // with minTail = 4 only the full 8-token window survives
    val trimmed = Dedup.repeatedPassages(df, w = 8, minTail = 4).collect()
    assert(trimmed.length == 1, s"expected only the full window: ${trimmed.toSeq}")
    // a shared SHORT tail alone is not reported once minTail exceeds it
    val shortTail = Seq(
      (1L, "unique first doc words here padding out the window then the"),
      (2L, "second doc distinct tokens filling its own full window so the"))
      .toDF("doc_id", "text")
    assert(Dedup.repeatedPassages(shortTail, w = 10, minTail = 5).count() == 0)
  }

  test("decontamination flags a train doc that copies a test doc's text") {
    // find one id in each split bucket, then plant identical text on them
    val ids = spark.range(0, 200).toDF("doc_id")
    val bySplit = TextAnalysis.deterministicSplit(ids, "doc_id", "graft", 100, 50)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val trainId = bySplit.collectFirst { case (id, "train") => id }.get
    val testId = bySplit.collectFirst { case (id, "test") => id }.get
    val leak = "the quick brown fox jumps over the lazy dog tonight"
    val docs = bySplit.map { case (id, _) =>
      (id, if (id == trainId || id == testId) leak else s"filler text number $id nothing shared")
    }.toSeq.toDF("doc_id", "text")
    val report = TextAnalysis.contaminationReport(docs, n = 5, "graft", 100, 50)
    val flagged = report.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(trainId), s"leaked train doc $trainId not flagged: $flagged")
    assert(flagged(trainId) == 6L, "10-token doc has 6 distinct 5-grams, all leaked")
    // the eval gram set rides a broadcast — the corpus side never shuffles
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams not broadcast:\n$plan")
  }

  test("fuzzy decontamination flags a lightly-edited cross-split near-copy") {
    val ids = spark.range(0, 200).toDF("doc_id")
    val bySplit = TextAnalysis.deterministicSplit(ids, "doc_id", "graft", 100, 50)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val trainId = bySplit.collectFirst { case (id, "train") => id }.get
    val testId = bySplit.collectFirst { case (id, "test") => id }.get
    // a light edit (one appended clause) that breaks dc2's fixed head
    // snippet and erodes only a few of dc1's grams — the fuzzy leg's case
    val base = "machine translation benchmarks measure quality with automatic " +
      "metrics computed against reference translations provided by humans " +
      "for every sentence in the held out evaluation corpus"
    val docs = bySplit.map { case (id, _) =>
      (id, if (id == trainId) base + " as usual"
           else if (id == testId) base
           else s"alpha$id beta$id gamma$id delta$id epsilon$id zeta$id")
    }.toSeq.toDF("doc_id", "text")
    val report = TextAnalysis.fuzzyContamination(docs, n = 3, k = 16, bands = 4,
      simThreshold = 0.5, salt = "graft", valPermille = 100, testPermille = 50)
    val pairs = report.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((trainId, testId)),
      s"expected exactly the planted near-copy pair, got $pairs")
    // the eval band relation rides a broadcast — the train side of the
    // candidate join never shuffles, at any corpus size
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval bands not broadcast:\n$plan")
  }

  test("mixture resampling: binding source keeps everything, others scale to the target mix") {
    // counts a:100 b:50 c:10, equal weights -> c binds (scarcest per unit
    // weight): rate_c = 1000, rate_a = 1000*10/100 = 100, rate_b = 200;
    // unweighted source d must vanish from both rates and the sample
    val docs = (Seq.tabulate(100)(i => (i.toLong, "a")) ++
      Seq.tabulate(50)(i => (1000L + i, "b")) ++
      Seq.tabulate(10)(i => (2000L + i, "c")) ++
      Seq.tabulate(30)(i => (3000L + i, "d"))).toDF("doc_id", "source")
    val w = Map("a" -> 1, "b" -> 1, "c" -> 1)
    val rates = TextAnalysis.mixtureRates(docs, "source", w)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rates == Map("a" -> 100L, "b" -> 200L, "c" -> 1000L),
      s"closed-form rates wrong: $rates")
    val kept = TextAnalysis.mixtureResample(docs, "source", "doc_id", w, "graft")
    assert(kept.filter(col("source") === "d").count() == 0,
      "unweighted source leaked into the sample")
    // binding source is never downsampled
    assert(kept.filter(col("source") === "c").count() == 10)
    // the rate relation rides a broadcast onto the corpus scan
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates not broadcast:\n$plan")
  }

  test("temperature mixture (α=1/2): shares ∝ isqrt(n), smallest source binds at 1000‰") {
    // counts a:400 b:100 c:25 -> w = 20/10/5; binding = max w/n = c;
    // rate_a = 1000*25*20/(5*400) = 250, rate_b = 1000*25*10/(5*100) = 500
    val docs = (Seq.tabulate(400)(i => (i.toLong, "a")) ++
      Seq.tabulate(100)(i => (1000L + i, "b")) ++
      Seq.tabulate(25)(i => (2000L + i, "c"))).toDF("doc_id", "source")
    val rates = TextAnalysis.temperatureRates(docs, "source")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rates == Map("a" -> (20L, 250L), "b" -> (10L, 500L), "c" -> (5L, 1000L)),
      s"closed-form temperature rates wrong: $rates")
    // binding source is never downsampled; bigger sources thin toward √n
    val kept = TextAnalysis.temperatureResample(docs, "source", "doc_id", "graft")
    assert(kept.filter(col("source") === "c").count() == 25)
    val keptA = kept.filter(col("source") === "a").count()
    assert(keptA < 400, s"source a must downsample, kept $keptA")
  }

  test("epoch plan: exact water-filling — caps bind, surplus redistributes, budget respected") {
    // tokens a:10000 b:10000 c:100; budget = 3/2 * 20100 = 30150;
    // cap = 2n. c caps (2·100 = 200 token ask << its weight share);
    // a and b split the remaining 29950 by equal weight w=100:
    // floor(100·29950/200) = 14975 each, under their 20000 cap.
    val tok = Seq(("a", 10000L), ("b", 10000L), ("c", 100L))
      .toDF("source", "n_tokens")
    val plan = TextAnalysis.epochPlan(tok, "source", budgetNum = 3,
        budgetDen = 2, maxEpochs = 2)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(4), r.getLong(5), r.getLong(6))).toMap
    assert(plan("c") == (true, 200L, 2000L), s"small source must cap: $plan")
    assert(plan("a") == (false, 14975L, 1497L) && plan("b") == plan("a"),
      s"uncapped split wrong: $plan")
    // allocation never exceeds the budget, never exceeds any cap
    val total = plan.values.map(_._2).sum
    assert(total <= 30150L, s"over budget: $total")
    // all-capped degenerate case: a huge budget caps everyone at maxEpochs
    val all = TextAnalysis.epochPlan(tok, "source", budgetNum = 100,
        budgetDen = 1, maxEpochs = 2)
      .collect().map(r => (r.getBoolean(4), r.getLong(6))).toSeq
    assert(all.forall(_ == (true, 2000L)), s"huge budget must cap all: $all")
  }

  test("chat flatten: same-role merge, reply-first drop, truncation, ChatML render") {
    val turns = Seq(
      // c1: user,user (merge) -> assistant -> user; survives with 3 runs
      (1L, 1L, "user", "hi"), (1L, 2L, "user", "there"),
      (1L, 3L, "assistant", "hello"), (1L, 4L, "user", "bye"),
      // c2: starts with assistant -> dropped entirely
      (2L, 1L, "assistant", "unprompted"), (2L, 2L, "user", "what"),
      // c3: single merged run (user,user) -> under minTurns, dropped
      (3L, 1L, "user", "a"), (3L, 2L, "user", "b"),
      // c4: 4 runs, truncated to maxTurns=3
      (4L, 1L, "user", "q1"), (4L, 2L, "assistant", "a1"),
      (4L, 3L, "user", "q2"), (4L, 4L, "assistant", "a2")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val out = TextAnalysis.chatFlatten(turns, minTurns = 2, maxTurns = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
      .toMap
    assert(out.keySet == Set(1L, 4L), s"survivor set wrong: ${out.keySet}")
    // c1: merged first turn "hi\nthere", 3 turns, 2 user / 1 assistant
    val c1Text = "<|im_start|>user\nhi\nthere<|im_end|>\n" +
      "<|im_start|>assistant\nhello<|im_end|>\n" +
      "<|im_start|>user\nbye<|im_end|>"
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L) == (3L, 2L, 1L, c1Text.length.toLong, md5Hex(c1Text)),
      s"c1 render wrong: ${out(1L)}")
    // c4: truncated after run 3 -> 2 user, 1 assistant, a2 gone
    val c4Text = "<|im_start|>user\nq1<|im_end|>\n" +
      "<|im_start|>assistant\na1<|im_end|>\n" +
      "<|im_start|>user\nq2<|im_end|>"
    assert(out(4L) == (3L, 2L, 1L, c4Text.length.toLong, md5Hex(c4Text)),
      s"c4 truncation wrong: ${out(4L)}")
  }

  test("interval merge: overlap and touch collapse, gaps split, duplicates count") {
    val iv = Seq(
      (1L, 0L, 3L), (1L, 2L, 5L), // overlap -> [0,5)
      (1L, 5L, 7L), // touching (start == prior end) -> merges into [0,7)
      (1L, 9L, 11L), // gap -> own island
      (2L, 4L, 6L), (2L, 4L, 6L) // exact duplicates -> one island, n_src 2
    ).toDF("key", "start", "end")
    val out = graft.relational.Intervals.merge(iv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 0L, 7L, 3L), (1L, 9L, 11L, 1L), (2L, 4L, 6L, 2L)),
      s"islands wrong: $out")
  }

  test("canonical pick: best quality wins, smaller doc_id on ties, singletons pass silently") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), // cluster 1
      (10L, 10L), (11L, 10L), // cluster 10: quality tie
      (20L, 20L) // singleton
    ).toDF("doc_id", "canonical_id")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), // 2 and 3 tie at 9
      (10L, 7L), (11L, 7L), (20L, 1L)).toDF("doc_id", "logit_u")
    val out = Dedup.canonicalPick(labels, quality).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (3L, 2L, 9L), s"best-quality tie must keep doc 2: $out")
    assert(out(10L) == (2L, 10L, 7L), s"tie-break must keep the smaller id: $out")
    assert(!out.contains(20L), "singleton clusters carry no pick")
  }

  test("centroid affinity: single-seed scores its own vector 1.0, scoring scan is shuffle-free") {
    val e = Tables.embeddings(spark, sf0001)
    val scored = Ann.centroidAffinity(e, col("vec_id") === 3)
    val self = scored.filter(col("vec_id") === 3).head().getDouble(1)
    assert(math.abs(self - 1.0) < 1e-12, s"cos(v, v-centroid) must be 1, got $self")
    // cosine is bounded
    assert(scored.filter(abs(col("affinity")) > 1.0 + 1e-9).count() == 0)
    // the centroid ships as a literal — the corpus scoring pass is one
    // narrow scan: no exchange anywhere in the scoring plan
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring scan shuffled:\n$plan")
  }

  test("bpe encode: learned merges tokenize a doc exactly like hand-applied merges") {
    // vocab: "abab" x3, "abc" x2 -> merges learned then applied to a NEW doc
    val train = Seq((1L, "abab abab abab abc abc")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(train, nMerges = 2)
      .orderBy(col("rank")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // round 1: (a,b) count 8; round 2: (ab,ab) count 3 beats (ab,c) 2
    assert(merges == Seq(("a", "b"), ("ab", "ab")), s"unexpected merges: $merges")
    val docs = Seq((10L, "abab abc ababab"), (11L, "")).toDF("doc_id", "text")
    val enc = TextAnalysis.bpeEncode(docs, merges)
    val byDoc = enc.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // "abab"->[abab](1)  "abc"->[ab,c](2)  "ababab"->[abab,ab](2, left-to-right)
    assert(byDoc(10L)._1 == 5L, s"token count wrong: ${byDoc(10L)}")
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("abab ab c abab ab".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(byDoc(10L)._2 == want, "token stream hash diverged from hand merge")
    assert(byDoc(11L)._1 == 0L, "empty doc must encode to zero tokens")
    // encoding is one narrow pass: merge table broadcast, no shuffle
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode pass shuffled:\n$plan")
  }

  test("semdedup: full recall on planted copies, subset of exact all-pairs, cell-blocked join") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val planted = e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val sem = Dedup.semanticDupPairs(planted, threshold = 0.99, nCells = 16)
    val semPairs = sem.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical vectors share a cell by construction -> every planted copy found
    val nPlanted = e.filter(col("vec_id") % 20 === 0).count()
    val copies = semPairs.filter { case (a, b) => b == a + 10000 }
    assert(copies.size == nPlanted, s"missed planted copies: ${copies.size}/$nPlanted")
    // cell blocking only PRUNES: output must be a subset of the exact operator's
    val exact = Dedup.embeddingCosinePairs(planted, threshold = 0.99)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semPairs.subsetOf(exact), s"non-pairs leaked: ${semPairs.diff(exact)}")
    // the pair search is an equi-join on the cell key — never all-pairs
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semdedup fell back to all-pairs:\n$plan")
  }

  test("char repetition: top-gram fraction and duplicated-window coverage match hand values") {
    val docs = Seq(
      (1L, "a b a b a b c"),               // top "a b" x3; no dup 5-gram
      (2L, "x y z w v x y z w v u"),       // 5-gram repeats at offset 5
      (3L, "q"),                           // sub-topN doc
      (4L, ""))                            // empty doc
      .toDF("doc_id", "text")
    val res = TextAnalysis.repetitionCharStats(docs, topN = 2, dupN = 5)
    val got = res.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getDouble(6)))).toMap
    assert(got(1L) == ((7L, "a b", 3L, 6.0 / 7, 0L, 0.0)), s"doc1: ${got(1L)}")
    // count-2 tie among "w v"/"x y"/"y z"/"z w" -> lexicographic min "w v";
    // the duplicated "x y z w v" covers positions 1-10 of 11
    assert(got(2L) == ((11L, "w v", 2L, 4.0 / 11, 10L, 10.0 / 11)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((1L, "", 0L, 0.0, 0L, 0.0)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((0L, "", 0L, 0.0, 0L, 0.0)), s"doc4: ${got(4L)}")
    // the top-1 window must plan as a group-limit, not a full per-doc sort
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"rank-1 not group-limited:\n$plan")
  }

  test("preference pairs: best-vs-rest, margin floor, id tie-break, singleton prompts silent") {
    val r = Seq(
      (1L, 10L, 3000L), (1L, 11L, 3000L), // tie: smaller id is champion
      (1L, 12L, 2500L), // margin 500 < 800 -> too ambiguous, dropped
      (1L, 13L, 1000L), // margin 2000 -> pair
      (2L, 20L, 5000L)) // singleton prompt -> nothing
      .toDF("prompt_id", "response_id", "reward_u")
    val out = TextAnalysis.preferencePairs(r, minMarginU = 800L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    // the reward-tied runner-up is a 0-margin pair: dropped by the floor
    assert(out == Set((1L, 10L, 13L, 2000L)), s"got $out")
  }

  test("hard negatives: same-label skipped, near-dup ceiling excluded, rank over valid negatives only") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f), 0), // anchor
      (2L, Seq(0.999f, 0.01f), 1), // other label but cosine≈1 -> dup-ceiling
      (3L, Seq(0.9f, 0.1f), 0), // nearest overall but SAME label
      (4L, Seq(0.8f, 0.6f), 1), // rank 1
      (5L, Seq(0.5f, 0.86f), 2)) // rank 2
      .toDF("vec_id", "embedding", "label")
    val out = Ann.hardNegatives(e, e.filter(col("vec_id") === 1), k = 5,
        dupCeiling = 0.95)
      .orderBy(col("rk")).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 5L),
      s"got ${out.map(_.getLong(1)).toSeq}")
    assert(out.forall(_.getInt(2) != 0), "a same-label row leaked through")
  }

  test("IVF hard negatives with an all-cells probe reproduce the exact " +
    "miner bit-for-bit (the ann8 equivalence contract, applied to ann14)") {
    val rnd = new scala.util.Random(5)
    val e = (0L until 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1), (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
    val anchors = e.filter(col("vec_id") % 7 === 0)
    val exact = Ann.hardNegatives(e, anchors, k = 5, dupCeiling = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val ivfAll = Ann.hardNegativesIvf(e, anchors, k = 5, dupCeiling = 0.95,
        nCells = 4, nprobe = 4) // probe EVERY cell -> candidates = corpus
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(ivfAll == exact)
  }

  test("C4 rules: punct/word-count/javascript line gates, policy markers drop the doc") {
    val good = "alpha beta gamma delta epsilon."
    val lines = (
      (1 to 5).map(i => (1L, s"line $i alpha beta gamma delta.")) ++ Seq(
        // d2: five keepable lines but a curly brace anywhere -> drop_policy
        (2L, "int main() { return 0; }") ,
        (2L, good), (2L, good), (2L, good), (2L, good), (2L, good),
        // d3: every line fails a different line rule -> drop_short
        (3L, "no terminal punctuation here at all"), // punct
        (3L, "too short."), // < 5 words
        (3L, "javascript is required to view this page."), // marker
        (3L, good), // one survivor is not enough
        // d4: lorem ipsum -> drop_policy even with enough good lines
        (4L, "lorem ipsum dolor sit amet consetetur."),
        (4L, good), (4L, good), (4L, good), (4L, good), (4L, good))
      ).toDF("doc_id", "line_text")
    val out = TextAnalysis.c4Rules(lines).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(out(1L) == ((5L, "keep")))
    assert(out(2L)._2 == "drop_policy")
    assert(out(3L) == ((1L, "drop_short")))
    assert(out(4L)._2 == "drop_policy")
  }

  test("gopher rules: each rule fails on its designed violation, clean doc keeps") {
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val clean = "the quick brown fox jumps over that lazy sleeping dog " +
      "while every other animal waits behind with great patience today"
    val docs = Seq(
      (1L, clean),                                    // passes all five
      (2L, "too few words here"),                     // r1: under min words
      (3L, ("a " * 40).trim),                         // r2: mean word length 1
      (4L, clean + " " + ("@#$% " * 40).trim),        // r3: symbol flood
      (5L, clean.replaceAll("[a-z]", "7")),           // r4+r5: no alpha words
      (6L, "quick brown foxes jump over lazy dogs " +
        "while many other animals wait behind patiently today again"))
      .toDF("doc_id", "text")                         // r5 only: no stop words
    val got = TextAnalysis.gopherRules(docs, stop, minWords = 10L, maxWords = 100000L)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8), r.getBoolean(9),
          r.getBoolean(10), r.getBoolean(11))).toMap
    assert(got(1L) == ((true, true, true, true, true, true)), s"clean doc: ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._6)
    assert(!got(3L)._2 && !got(3L)._6)
    assert(!got(4L)._3 && !got(4L)._6)
    assert(!got(5L)._4 && !got(5L)._6)
    assert(got(6L)._1 && got(6L)._2 && got(6L)._3 && got(6L)._4 &&
      !got(6L)._5 && !got(6L)._6, s"stopword-free doc: ${got(6L)}")
  }

  test("ann11: materialized PQ code probe matches direct ADC, scans only code columns") {
    val got = PipelineQueries.queries("ann11_pq_indexed")(spark, sf0001)
    val want = Ann.topKAdc(Tables.embeddings(spark, sf0001), queryId = 29L, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want,
      "indexed ADC diverged from the direct probe")
    val plan = got.queryExecution.executedPlan.toString
    // the serving scan must read codes, never a vector, and plan top-k
    assert(plan.contains("code_0") && !plan.contains("embedding"),
      s"PQ probe read vectors:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"PQ top-k not TakeOrdered:\n$plan")
  }

  test("ann10: incrementally-appended IVF index serves probes bit-identically to a rebuild") {
    val got = PipelineQueries.queries("ann10_ivf_append")(spark, sf0001)
    // append under the frozen codebook ≡ full rebuild: same probe against
    // the batch-built full index must match row for row
    val want = Ann.topKCosineIvf(Tables.embeddings(spark, sf0001), 22L, 10)
      .collect().map(_.toSeq).toSeq
    assert(got.collect().map(_.toSeq).toSeq == want,
      "maintained index diverged from the rebuild")
    // the query vector itself arrived via the append path — the probe
    // head() for it would throw if the batch were not served
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"incremental-index probe did not prune cell partitions:\n$plan")
  }

  test("dd15: maintained LSH band index equals a rebuild and serves the dd2 pair set") {
    val got = PipelineQueries.queries("dd15_lsh_maintained")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    // the probe over the incrementally-built index must equal the direct
    // full-corpus operator bit for bit (same signature family, same bands)
    val want = Dedup.minhashLshPairs(PipelineQueries.corpus(spark, sf0001))
      .orderBy(col("a"), col("b")).collect().map(_.toSeq).toSeq
    assert(got == want, "maintained-index pairs diverged from the direct operator")
    // the maintained table itself ≡ a rebuild over the union (row set)
    val idx = PipelineQueries.dd15Index(spark, sf0001)
    val rebuilt = Dedup.bandedSignatures(PipelineQueries.corpus(spark, sf0001))
    assert(idx.count() == rebuilt.count(),
      "maintained index row count diverged from a rebuild")
    assert(idx.select("doc_id", "band_idx", "band_hash")
      .exceptAll(rebuilt.select("doc_id", "band_idx", "band_hash")).isEmpty,
      "maintained index rows diverged from a rebuild")
  }

  test("dd15: index probe plan self-joins the stored scan without re-shingling") {
    val idx = PipelineQueries.dd15Index(spark, sf0001)
    val plan = Dedup.lshIndexPairs(idx).queryExecution.executedPlan.toString
    // served from parquet: no md5/shingle derivation in the probe plan, no
    // cartesian fallback — the only joins are the band-key equi-join
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs fallback:\n$plan")
    assert(!plan.toLowerCase.contains("md5"), s"probe re-derived signatures:\n$plan")
  }

  test("tx25: KN surprisal — nonnegative keys, held-out half scores higher than train") {
    val rows = PipelineQueries.queries("tx25_kn_surprisal")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // p ∈ (0,1] always (discounted mass never exceeds 1) → −ln(p) ≥ 0
    assert(rows.forall(_._3 >= 0L), "negative surprisal key: some p > 1")
    // the model trained on the even half: held-out odd docs carry unseen
    // bigrams → strictly higher mean surprisal on average
    val (train, held) = rows.partition(_._1 % 2 == 0)
    def meanOf(xs: Seq[(Long, Long, Long, Long)]) =
      xs.map(_._4.toDouble).sum / xs.size
    assert(meanOf(held.toSeq) > meanOf(train.toSeq),
      s"held-out mean ${meanOf(held.toSeq)} not above train ${meanOf(train.toSeq)}")
  }

  test("pl2: composed chain agrees with its standalone stages, no all-pairs fallback") {
    val df = PipelineQueries.queries("pl2_filter_spandedup_shard")(spark, sf0001)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // shard totals must reconcile with running the stages independently
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val stop = Seq("the", "a", "query", "row", "join", "data", "scan", "key")
    val kept = docs.join(
      TextAnalysis.gopherRules(docs, stop, 10L, 100000L)
        .filter(col("keep")).select(col("doc_id")), Seq("doc_id"), "left_semi")
    val nKept = kept.count()
    assert(rows.map(_._2).sum == nKept, s"doc count mismatch: ${rows.map(_._2).sum} vs $nKept")
    val spanTotals = Dedup.duplicatedSpans(kept, k = 6)
      .agg(sum(col("n_tokens") - col("n_covered")), sum(col("n_covered")))
      .head()
    assert(rows.map(_._3).sum == spanTotals.getLong(0), "clean-token total mismatch")
    assert(rows.map(_._4).sum == spanTotals.getLong(1), "cut-token total mismatch")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pl2 fell back to all-pairs:\n$plan")
    // the chain consumes only the shard id — Catalyst must prune the
    // shard shuffle's unused within-shard rank (and its per-shard sort)
    assert(!plan.contains("Window"), s"unused window survived pruning:\n$plan")
  }

  test("shard shuffle: repartition-invariant, contiguous positions per shard, one shard-key shuffle") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"))
    val res = TextAnalysis.shardShuffle(docs, nShards = 8, salt = "s5")
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // deterministic: identical assignment regardless of input partitioning
    val rows2 = TextAnalysis.shardShuffle(docs.repartition(7), nShards = 8, salt = "s5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.sameElements(rows2.sorted), "shuffle not repartition-invariant")
    // every shard's positions are exactly 1..count (a writable dense order)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length),
        s"shard $shard positions not contiguous")
    }
    // all 8 shards populated, none holds a majority (md5-uniform)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0L until 8L).toSet, s"missing shards: $sizes")
    assert(sizes.values.max < rows.length / 2, s"skewed shards: $sizes")
    // plan: one hash shuffle on the shard key, no global sort
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), s"no shard-key exchange:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"unexpected global sort:\n$plan")
  }

  test("adaptive IVF cell count: power-of-2 near 2*sqrt(n), clamped [16, 1024]") {
    assert(Ann.adaptiveCells(1L) == 16)
    assert(Ann.adaptiveCells(1000L) == 32)       // sqrt 31 -> 16 -> x2
    assert(Ann.adaptiveCells(210000L) == 512)    // sqrt 458 -> 256 -> x2
    assert(Ann.adaptiveCells(100000000L) == 1024) // clamped
    // the adaptive default must agree across the family sharing it:
    // semanticDupPairs(nCells = 0) at n vectors blocks on the same
    // codebook size as an explicit call at adaptiveCells(n)
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val n = e.count()
    val auto = Dedup.semanticDupPairs(e, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pinned = Dedup.semanticDupPairs(e, threshold = 0.99,
        nCells = Ann.adaptiveCells(n))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == pinned, "adaptive default diverged from explicit adaptiveCells(n)")
  }

  test("semantic decontamination: planted eval leaks fully recalled, eval side broadcast") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val evalSet = e.filter(col("vec_id") % 50 === 7)
    val leaked = evalSet.filter(col("vec_id") % 3 === 0)
    val train = e.filter(col("vec_id") % 50 =!= 7)
      .unionByName(leaked.select((col("vec_id") + 900000).as("vec_id"), col("embedding")))
    val res = Dedup.semanticCrossPairs(train, evalSet, threshold = 0.99, nCells = 16)
    val pairs = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a verbatim leak is the same vector -> same cell under the train
    // codebook, cosine 1.0: every planted pair must be reported
    val leakedIds = leaked.collect().map(_.getLong(0)).toSet
    val missed = leakedIds.filter(id => !pairs.contains((id + 900000, id)))
    assert(missed.isEmpty, s"missed planted leaks: $missed")
    // every reported cosine clears the threshold
    assert(res.collect().forall(_.getDouble(2) >= 0.99))
    // the benchmark side must broadcast: the train corpus never shuffles
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination fell back to all-pairs:\n$plan")
  }

  test("duplicated spans: planted exact copies fully covered, repartition-invariant") {
    val docs = PipelineQueries.corpus(spark, sf0001)
    val res = Dedup.duplicatedSpans(docs, k = 6)
    val byId = res.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    // every planted exact copy (doc_id + 200000) shares ALL its windows
    // with its source: both rebuild empty whenever the doc has >= k tokens
    val planted = byId.keys.filter(_ >= 200000L).filter(_ < 400000L)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val (n, cov, hash) = byId(id)
      if (n >= 6) {
        assert(cov == n, s"copy $id not fully covered: $cov/$n")
        assert(byId(id - 200000L)._2 == n, s"source ${id - 200000L} not fully covered")
        assert(hash == md5Hex(""), s"copy $id rebuild not empty")
      }
    }
    // determinism: identical output under a different input partitioning
    val re = Dedup.duplicatedSpans(docs.repartition(13), k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val base = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(base.sorted.sameElements(re.sorted), "span dedup not repartition-invariant")
  }

  test("semantic decontamination is a pruning of the exact cross pairs (nCells=1 degenerate)") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val evalSet = e.filter(col("vec_id") % 50 === 7)
    val train = e.filter(col("vec_id") % 50 =!= 7)
    val blocked = Dedup.semanticCrossPairs(train, evalSet, threshold = 0.9, nCells = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nCells = 1 assigns everything to one cell -> the same operator IS the
    // exact cross all-pairs; cell blocking may only PRUNE, never invent
    val exact = Dedup.semanticCrossPairs(train, evalSet, threshold = 0.9, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact), s"non-pairs leaked: ${blocked.diff(exact)}")
  }

  test("duplicated spans: cross-doc span cut at any offset, self-repeat cut, clean doc intact") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta unique one tail here now"),
      (2L, "start words differ alpha beta gamma delta epsilon zeta eta theta other ending"),
      (3L, "totally different words with no overlap whatsoever anywhere present"),
      (4L, "short doc"),
      (5L, "loop one two three four five six loop one two three four five six"))
      .toDF("doc_id", "text")
    val res = Dedup.duplicatedSpans(docs, k = 6)
    val got = res.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // docs 1/2 share an 8-token run at DIFFERENT offsets (grid dedup misses
    // this): windows at starts 1..3 / 4..6 are duplicated, covering 8
    // positions as ONE maximal span; the rest of each doc survives
    assert(got(1L) == ((13L, 8L, 1L, md5Hex("unique one tail here now"))), s"doc1: ${got(1L)}")
    assert(got(2L) == ((13L, 8L, 1L, md5Hex("start words differ other ending"))), s"doc2: ${got(2L)}")
    // clean doc: untouched, hash of its own full token stream
    assert(got(3L) == ((9L, 0L, 0L,
      md5Hex("totally different words with no overlap whatsoever anywhere present"))))
    // sub-k doc: no windows, survives whole
    assert(got(4L) == ((2L, 0L, 0L, md5Hex("short doc"))))
    // within-doc repeat: both halves' windows collide -> everything covered,
    // adjacent runs merge into one span, rebuild is empty
    assert(got(5L) == ((14L, 14L, 1L, md5Hex(""))), s"doc5: ${got(5L)}")
    // linear relational shape: hash joins only, never an all-pairs fallback
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup fell back to all-pairs:\n$plan")
  }

  test("knn join matches single-query top-k and emits exactly k ranked rows per query") {
    val e = Tables.embeddings(spark, sf0001)
    val knn = Ann.knnJoin(e, e.filter(col("vec_id") % 50 === 0), k = 5)
    val rows = knn.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to 5L), s"ranks wrong for query $q")
      assert(!rs.exists(_.getLong(1) == q), s"query $q returned itself")
    }
    // per-query parity with the single-probe operator (same arithmetic)
    val single = Ann.topKCosine(e, 0, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val batch = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(3))
      .map(r => r.getLong(1) -> r.getDouble(2)).toSeq
    assert(batch == single, s"knn join diverges from topKCosine:\n$batch\n$single")
    // the rank-limit window must plan as WindowGroupLimit (map-side top-k
    // per query below the shuffle), never a global sort — same guard as
    // capPerSource, so a regression to a full window sort cannot slip in
    val plan = knn.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"knn rank window not group-limited:\n$plan")
  }

  test("ivf retrain: every vector counted once; hand-built cell means exact") {
    // 2 cells at vec_id 0/1, two extra members each — means are closed-form
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),   // centroid cell 0
      (1L, Array(0.0f, 1.0f)),   // centroid cell 1
      (2L, Array(0.9f, 0.1f)),   // -> cell 0
      (3L, Array(0.1f, 0.9f)),   // -> cell 1
      (4L, Array(0.8f, 0.0f)))   // -> cell 0
      .toDF("vec_id", "embedding")
    val got = Ann.ivfRetrain(vecs, nCells = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // cell 0 dim 0: members {1000, 900, 800} -> sum 2700, mean 900.0
    assert(got((0L, 0L)) == ((3L, 2700L, 900.0)), s"got ${got((0L, 0L))}")
    assert(got((1L, 1L)) == ((2L, 1900L, 950.0)), s"got ${got((1L, 1L))}")
    // every vector lands in exactly one cell: per-dim counts sum to corpus
    val e = Tables.embeddings(spark, sf0001)
    val counts = Ann.ivfRetrain(e, nCells = 16)
      .groupBy(col("dim")).agg(sum(col("n_vecs")).as("n")).collect()
      .map(_.getAs[Long]("n")).distinct.toSeq
    assert(counts == Seq(e.count()), s"per-dim totals wrong: $counts")
  }

  test("audio codec: AudioSystem round-trip matches the closed-form sample pattern") {
    val bytes = Multimodal.AudioCodec.syntheticWav(7, 5)
    val s = Multimodal.AudioCodec.decode(bytes)
    val expected = (0 until 5).map(i => (7L * 31 + i * 7) % 65536 - 32768).sum
    assert(s.sampleRate == 8000 && s.nSamples == 5L && s.ampSum == expected,
      s"decoded $s, expected ampSum $expected")
    // the JDK parses the RIFF header we wrote — format fields must round-trip
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(in.getFormat.getSampleSizeInBits == 16 && in.getFormat.getChannels == 1 &&
      !in.getFormat.isBigEndian && in.getFrameLength == 5L)
    // audio-kind payloads with the RIFF magic route through the real decoder
    val f = Multimodal.FakeCodec.decode("audio", bytes)
    assert(f.checksum == expected)
    // sample values straddling the sign boundary round-trip (negative sums)
    val neg = Multimodal.AudioCodec.decode(Multimodal.AudioCodec.syntheticWav(0, 3))
    assert(neg.ampSum < 0, s"seed-0 samples start at -32768; got ${neg.ampSum}")
  }

  test("video codec: ISO-BMFF round-trip, largesize mdat, v1 mvhd, malformed boxes fail loudly") {
    import Multimodal.VideoCodec
    // 32-bit mdat (odd seed) and 64-bit largesize mdat (even seed)
    for (seed <- Seq(7L, 8L)) {
      val m = VideoCodec.parseMp4(VideoCodec.syntheticMp4(seed, 320, 240, 5500, 33))
      assert(m == VideoCodec.VideoMeta(320, 240, 5500, "vide", 33),
        s"seed $seed round-trip: $m")
    }
    // mvhd version 1 (64-bit times): patch a v0 movie into the v1 layout —
    // duration in units of a 90 kHz timescale must rescale to ms
    val v1 = {
      val b = java.nio.ByteBuffer.allocate(8 + 112)
      b.putInt(8 + 112); b.put("mvhd".getBytes("US-ASCII"))
      b.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1, flags
      b.putLong(0).putLong(0) // 64-bit creation/modification
      b.putInt(90000) // timescale
      b.putLong(90000L * 7) // 64-bit duration = 7 s
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.putLong(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      (1 to 6).foreach(_ => b.putInt(0))
      b.putInt(2)
      b.array()
    }
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length); b.put(typ.getBytes("US-ASCII")); b.put(body)
      b.array()
    }
    val mv1 = VideoCodec.parseMp4(box("moov", v1))
    assert(mv1.durationMs == 7000L, s"v1 mvhd rescale: $mv1")
    // malformed: a box whose declared size overruns its container
    val bad = box("moov", v1).clone()
    java.nio.ByteBuffer.wrap(bad).putInt(8, Int.MaxValue)
    intercept[IllegalArgumentException](VideoCodec.parseMp4(bad))
    // garbage without an mvhd is rejected, not silently defaulted
    intercept[IllegalArgumentException](
      VideoCodec.parseMp4(box("free", Array.fill(16)(0.toByte))))
  }

  test("codec dispatch: magic-byte lookalikes fall back to byte stats, not a crash") {
    // a text payload that merely STARTS with the BMP/RIFF magic is not
    // decodable media; dispatch must degrade to byte statistics
    val bmText = "BM25 scoring notes for the index".getBytes("UTF-8")
    val f1 = Multimodal.FakeCodec.decode("image", bmText)
    assert(f1.checksum == bmText.map(_ & 0xff).map(_.toLong).sum)
    val riffText = "RIFF through the archives".getBytes("UTF-8")
    val f2 = Multimodal.FakeCodec.decode("audio", riffText)
    assert(f2.checksum == riffText.map(_ & 0xff).map(_.toLong).sum)
  }

  test("multimodal: stub decode is deterministic, frames slice the payload") {
    val media = Multimodal.media(spark, sf0001)
    val feats = Multimodal.extractFeatures(media)
    val row = feats.filter(col("doc_id") === 0).collect().head
    // checksum = sum of UTF-8 bytes of the text — recompute independently
    val text = Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    val expected = text.getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum
    assert(row.getAs[Long]("checksum") == expected)
    assert(row.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
    val frames = Multimodal.sampleFrames(media, stride = 4)
    assert(frames.count() > 0)
    assert(frames.select(max(length(col("frame_bytes")))).head.getInt(0) <= 16)
  }

  test("vocab top-k: df counts documents once, deterministic tie cut") {
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "alpha gamma"),
      (3L, "beta gamma delta")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopK(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // df ties (all 2) break lexicographically: alpha, beta, gamma
    assert(got.toSeq == Seq(("alpha", 2L, 3L), ("beta", 2L, 2L), ("gamma", 2L, 2L)),
      s"vocab order wrong: ${got.toSeq}")
  }

  test("tfidf keywords: corpus-wide term ranks below rare term, plan is group-limited") {
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val q = TextAnalysis.tfidfKeywords(docs, k = 2)
    val top = q.filter(col("doc_id") === 1 && col("rank") === 1)
      .select("token").collect().head.getString(0)
    assert(top == "rare", s"idf must demote the everywhere-term: got $top")
    // in-every-doc term: idf = ln(4/4) = 0 -> score_key exactly 0
    val commonKey = q.filter(col("doc_id") === 2 && col("token") === "common")
      .select("score_key").collect().headOption.map(_.getLong(0))
    assert(commonKey.contains(0L), s"smoothed idf of an everywhere-term: $commonKey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"keyword rank not group-limited:\n$plan")
  }

  test("chunking: overlap repeats tokens, tails kept, token-free docs dropped") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val docs = Seq((1L, text), (2L, "solo"), (3L, "... !!!")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWithOverlap(docs, window = 4, stride = 3)
      .orderBy(col("doc_id"), col("chunk_id")).collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // starts 0,3,6,9 -> sizes 4,4,4,1; chunk 1 starts at token 4 (w4)
    assert(d1.map(_.getAs[Long]("start_tok")).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(d1.map(_.getAs[Long]("n_toks")).toSeq == Seq(4L, 4L, 4L, 1L))
    // overlapping chunks share tokens: hash of [w4..w7] differs from [w1..w4]
    assert(d1.map(_.getAs[String]("chunk_hash")).distinct.length == 4)
    assert(got.count(_.getLong(0) == 2L) == 1, "single-token doc = one chunk")
    assert(!got.exists(_.getLong(0) == 3L), "punctuation-only doc must vanish")
  }

  test("bigram LM: closed-form counts, conditionals sum to 1 per w1") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(docs, topN = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // pairs: d1 = (a,b),(b,a),(a,b),(b,c); d2 = (a,b)
    assert(got(("a", "b")) == (3L, 3L, 1.0), s"C(a,b): ${got(("a", "b"))}")
    assert(got(("b", "a")) == (1L, 2L, 0.5) && got(("b", "c")) == (1L, 2L, 0.5), got)
    val perW1 = got.toSeq.groupBy(_._1._1).map { case (w1, xs) => w1 -> xs.map(_._2._3).sum }
    perW1.foreach { case (w1, p) =>
      assert(math.abs(p - 1.0) < 1e-12, s"P(·|$w1) must sum to 1, got $p") }
  }

  test("bpe merges: greedy frequency order, lexicographic ties, repeat runs merge left-first") {
    // corpus: "abab" x3, "aaa" x2 -> pair counts round 1:
    //   (a,b)=6, (b,a)=3, (a,a)=4  => merge 1 = (a,b)->ab (count 6)
    // round 2 state: "ab ab" x3, "a a a" x2 -> (ab,ab)=3, (a,a)=4
    //   => merge 2 = (a,a)->aa (count 4; "a a a" pairs left-first)
    // round 3 state: "ab ab" x3, "aa a" x2 -> (ab,ab)=3, (aa,a)=2
    //   => merge 3 = (ab,ab)->abab (count 3)
    val docs = Seq((1L, "abab abab abab aaa aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, nMerges = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "b", "ab", 6L),
      (2L, "a", "a", "aa", 4L),
      (3L, "ab", "ab", "abab", 3L)), s"merge table wrong: ${got.toSeq}")
  }

  test("bpe merges: incremental trainer ≡ naive recount greedy, 300 merges in seconds") {
    // the fast path maintains pair counts incrementally (touched words
    // only) with a lazily invalidated heap; this pins it against the
    // obviously-correct full-recount greedy on a vocabulary rich enough
    // that 300 merges don't saturate
    val rnd = new scala.util.Random(7)
    val vocab = Seq.fill(400)(
      (0 until (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    val text = Seq.fill(3000)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = TextAnalysis.bpeMerges(docs, nMerges = 300)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val secs = (System.nanoTime() - t0) / 1e9

    def mergeSeq(s: List[String], l: String, r: String): List[String] = s match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeSeq(rest, l, r)
      case a :: rest => a :: mergeSeq(rest, l, r)
      case Nil => Nil
    }
    var state = text.split(" ").groupBy(identity).toSeq
      .map { case (w, a) => (w.split("").toList, a.length.toLong) }
    val ref = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to 300) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      state.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) += f)
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        ref += ((l, r, c))
        state = state.map { case (s, f) => (mergeSeq(s, l, r), f) }
      }
    }
    assert(got == ref.result(), s"incremental diverged from recount greedy")
    assert(got.length == 300, s"vocabulary saturated early: ${got.length}")
    assert(secs < 30, s"300 merges took $secs s — incremental path regressed")
  }

  test("winnowing: shared long substring guarantees a shared fingerprint; short doc = 1 fp") {
    val k = 8; val w = 4
    val shared = "XXCOMMONSEQUENCEXX" // length 18 >= k + w - 1 = 11
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"totally different lead $shared and tail"),
      (3L, "tiny text")) // 9 chars: 2 grams < w -> global-min single fp
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k, w).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty,
      "winnowing guarantee violated: shared >=k+w-1 substring, no shared fp")
    assert(fps(3L).size == 1, s"short doc must keep exactly its global min: ${fps(3L)}")
  }

  test("pq: centroid-exact vectors round-trip, ADC = exact L2 on codebook points") {
    // 4 codebook vectors (ids 0..3) in dim 4, m=2 subspaces of 2 dims; ids
    // 4/5 duplicate centroids 2/1 so their codes and ADC are closed-form
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 1f)),
      (2L, Array(0f, 1f, 1f, 0f)),
      (3L, Array(1f, 1f, 1f, 1f)),
      (4L, Array(0f, 1f, 1f, 0f)),  // = centroid 2
      (5L, Array(1f, 0f, 0f, 1f)))  // = centroid 1
      .toDF("vec_id", "embedding")
    val enc = Ann.pqEncode(vecs, m = 2, kCodes = 4)
      .select("vec_id", "code_0", "code_1", "pq_code").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(enc(4L) == (2L, 2L, 2L + 4L * 2L), s"dup-of-centroid-2: ${enc(4L)}")
    assert(enc(5L) == (1L, 1L, 1L + 4L * 1L), s"dup-of-centroid-1: ${enc(5L)}")
    assert(enc.values.forall { case (c0, c1, _) =>
      c0 >= 0 && c0 < 4 && c1 >= 0 && c1 < 4 }, s"code out of range: $enc")
    // ADC from query 3 (=[1,1,1,1]): all points sit ON centroids, so ADC
    // distance IS the exact quantized L2 (scale 1000 per dim => 1e6/unit)
    val adc = Ann.topKAdc(vecs, queryId = 3L, k = 5, m = 2, kCodes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(adc(1L) == 2000000L && adc(2L) == 2000000L, s"two-bit-away dists: $adc")
    assert(adc(0L) == 4000000L, s"all-zeros dist: $adc")
    assert(adc(4L) == adc(2L) && adc(5L) == adc(1L), "duplicates must tie their centroid")
  }

  test("qf2: linear classifier logit matches a hand computation; decision splits the corpus") {
    val row = graft.pipeline.PipelineQueries
      .queries("qf2_quality_classifier")(spark, sf0001)
    // exact Scala recomputation on a sample + non-degenerate decision.
    // Fetch the texts OF the sampled ids (two independent limit(50)s are
    // not guaranteed to pick the same rows — partitioning-dependent).
    val got = row.limit(50).collect()
    val ids = got.map(_.getLong(0)).toSeq
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text")
      .filter(col("doc_id").isin(ids: _*)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stop = Set("the", "a", "query", "row", "join", "data", "scan", "key")
    got.foreach { r =>
      val text = docs(r.getLong(0))
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val mwl = text.length.toLong * 1000 / math.max(toks.length, 1)
      val logit = -600000L + 30000L * toks.count(stop) + 9000L * toks.length +
        100L * text.length - 50L * mwl
      assert(r.getLong(1) == logit, s"doc ${r.getLong(0)}: ${r.getLong(1)} != $logit")
      assert(r.getBoolean(2) == (logit > 0))
    }
    val keeps = row.groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(keeps.getOrElse(true, 0L) > 0 && keeps.getOrElse(false, 0L) > 0,
      s"degenerate decision boundary: $keeps")
  }

  test("dd14: planted half-truncations surface at containment ≈ 1 with Jaccard below dd6's floor") {
    val rows = graft.pipeline.PipelineQueries
      .queries("dd14_containment")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val truncPairs = rows.filter { case (a, b, _, _) => b == a + 700000 }
    // 20 plants at sf0.001 (doc_id % 25 == 3 of 500); r=1 banding recall at
    // J≈0.5 is 1-(1/2)^8 ≈ 99.6% per pair — require at least 16 recovered
    assert(truncPairs.length >= 16, s"only ${truncPairs.length} truncation pairs")
    truncPairs.foreach { case (a, b, contA, contB) =>
      // the truncated side is (almost) fully contained; the full side is not
      assert(contB >= 9000, s"($a,$b): cont_b=$contB")
      assert(contA <= 7000, s"($a,$b): cont_a=$contA should sit near J≈0.5")
    }
  }

  test("tx22: Viterbi segmentation matches a hand-rolled DP; single chars guarantee coverage") {
    import graft.text.TextAnalysis
    // tiny corpus with a repeated bigram-friendly word so multi-char pieces win
    val docs = Seq.fill(8)("abab abab cd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.unigramEncode(docs, maxPieceLen = 4, minCount = 3,
        maxWordLen = 12).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // hand DP: replicate vocab costs then Viterbi in plain Scala
    val vocabRows = TextAnalysis.unigramVocab(docs, 4, 3).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    def viterbi(w: String): (Long, Long) = {
      val enc = Array.fill(w.length + 1)(Long.MaxValue)
      enc(0) = 0L
      for (j <- 1 to w.length; i <- math.max(0, j - 4) until j) {
        vocabRows.get(w.substring(i, j)).foreach { c =>
          if (enc(i) != Long.MaxValue)
            enc(j) = math.min(enc(j), enc(i) + c * 64 + 1)
        }
      }
      (enc(w.length) / 64, enc(w.length) % 64)
    }
    for (w <- Seq("abab", "cd")) assert(got(w) == viterbi(w), w)
    // "abab" should use multi-char pieces (fewer than 4 single chars)
    assert(got("abab")._2 < 4, s"abab segmented into ${got("abab")._2} pieces")
    // coverage: a word whose multi-char substrings are all below minCount
    // still encodes (single chars always in vocab) — "cd" appears 8 times
    // but its chars also ride; encode must be finite for every word
    got.values.foreach { case (c, n) => assert(c >= 0 && n >= 1) }
  }

  test("qf3: DSIR selection prefers the target language; scores exact vs hand computation") {
    val sel = graft.pipeline.PipelineQueries
      .queries("qf3_dsir_select")(spark, sf0001).collect()
    assert(sel.length == 50)
    // selected mix must enrich the en target slice well past its base rate
    // (~39% at sf0.001; hashed unigram buckets are shared across langs, so
    // the lift is real but bounded — assert ≥ base + 10 points)
    val en = sel.count(_.getString(1) == "en")
    val base = graft.Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").count().toDouble /
      graft.Tables.documents(spark, sf0001).count()
    assert(en.toDouble / sel.length >= base + 0.10,
      s"selected en fraction ${en}/${sel.length} not enriched over base $base")
    // exact recomputation of one doc's score from first principles
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md, 16) % 4096
    }
    val all = docs.flatMap { case (_, lang, t) => toks(t).map(tk => (bucket(tk), lang)) }
    val w = all.groupBy(_._1).map { case (b, xs) =>
      b -> (1000000L * (xs.count(_._2 == "en") + 1) / (xs.length + 1))
    }
    val probe = sel.head
    val (_, _, text) = docs.find(_._1 == probe.getLong(0)).get
    val ts = toks(text)
    val expect = ts.map(tk => w(bucket(tk))).sum / ts.length
    assert(probe.getLong(3) == expect,
      s"doc ${probe.getLong(0)}: score ${probe.getLong(3)} != $expect")
  }

  test("rl1: every planted corruption links within one edit; join is blocked") {
    val df = PipelineQueries.queries("rl1_fuzzy_linkage")(spark, sf0001)
    val rows = df.collect()
    // RlEvery = 19 (gate param): one dirty record per 19th part
    val dirtyN = graft.Tables.part(spark, sf0001)
      .filter(col("p_partkey") % 19 === 0).count()
    assert(rows.length == dirtyN,
      s"full recall: ${rows.length} of $dirtyN dirty records linked")
    assert(rows.forall(_.getLong(2) <= 1),
      "a single deletion is always recoverable within one edit")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"linkage must stay a blocked equi-join:\n$plan")
  }
}
