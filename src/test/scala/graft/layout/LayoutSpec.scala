package graft.layout

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue column matches the bit-at-a-time reference interleave") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == Layout.zValueRef(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("zValue is monotone in each dimension holding the other fixed") {
    // interleave preserves per-dimension order: z(x1,y) < z(x2,y) iff x1 < x2
    for (y <- Seq(0L, 7L, 65535L); x1 <- Seq(0L, 100L, 30000L)) {
      assert(Layout.zValueRef(x1, y) < Layout.zValueRef(x1 + 1, y))
      assert(Layout.zValueRef(y, x1) < Layout.zValueRef(y, x1 + 1))
    }
  }

  test("zo2 at sf0.001: z-layout scans strictly fewer rows than linear for the 2-D probe") {
    val r = LayoutQueries.queries("zo2_zorder_prune")(spark, sf0001).head()
    val zScan = r.getAs[Long]("z_rows_scan")
    val linScan = r.getAs[Long]("lin_rows_scan")
    val matched = r.getAs[Long]("n_match")
    assert(matched > 0, "probe rectangle must select something")
    assert(zScan >= matched, "zone maps never skip a matching row")
    assert(zScan * 2 < linScan,
      s"z-order should at least halve the scan: z=$zScan lin=$linScan")
  }

  test("sketch rho matches a direct big-integer leading-zero computation") {
    val keys = (1 to 2000).map(_.toString)
    def refRho(key: String): (String, Int) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val tail = hex.substring(Sketches.P)
      val lead = tail.takeWhile(_ == '0').length
      val rho =
        if (lead == tail.length) Sketches.RMax
        else {
          val d = Integer.parseInt(tail(lead).toString, 16)
          val nb = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
          math.min(4 * lead + nb + 1, Sketches.RMax)
        }
      (hex.substring(0, Sketches.P), rho)
    }
    val pairs = Sketches.rhoPairs(keys.toDF("k"), col("k"))
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted
    val expected = keys.map(refRho).sorted
    assert(pairs.toSeq == expected)
  }

  test("HLL estimate within 3% of truth on 50k distinct keys (p=3)") {
    val n = 50000
    val df = spark.range(n).select((col("id") * 2654435761L).as("k"))
    val est = Sketches.estimate(Sketches.registers(df, col("k")))
      .head().getAs[Long]("hll_est")
    assert(math.abs(est - n).toDouble / n < 0.03, s"est=$est truth=$n")
  }

  test("sketch-of-union equals merge-of-sketches, register-for-register") {
    val a = spark.range(0, 30000).select(col("id").as("k"))
    val b = spark.range(20000, 45000).select(col("id").as("k")) // overlap
    val direct = Sketches.registers(a.unionByName(b), col("k"))
    val merged = Sketches.registers(a, col("k"))
      .unionByName(Sketches.registers(b, col("k")))
      .groupBy("bucket").agg(max("rho").as("rho"))
    assert(direct.unionByName(merged).except(direct.intersect(merged)).isEmpty,
      "register multisets differ") // set equality: (A ∪ B) \ (A ∩ B) = ∅
    val eDirect = Sketches.estimate(direct).head().getAs[Long]("hll_est")
    val eMerged = Sketches.estimate(merged).head().getAs[Long]("hll_est")
    assert(eDirect == eMerged)
  }

  test("sketch registers are repartition-invariant") {
    val df = spark.range(10000).select(col("id").as("k"))
    val r1 = Sketches.registers(df, col("k")).collect().map(r =>
      (r.getString(0), r.getInt(1))).sorted.toSeq
    val r2 = Sketches.registers(df.repartition(13), col("k")).collect().map(r =>
      (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(r1 == r2)
  }

  test("kmv sketch: bottom-k distinct hashes, repartition-invariant, exact below k") {
    val agg = new KmvAgg(64)
    // direct in-memory reference vs the UDAF over shuffled partitions
    val df = spark.range(5000).select((col("id") % 1500).as("k"))
    val ref = df.select(Kmv.hash(col("k")).as("h")).distinct()
      .collect().map(_.getLong(0)).sorted.take(64).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts).select(Kmv.hash(col("k")).as("h"))
        .agg(graft.layout.Kmv.agg(64)(col("h")).as("sk"))
        .select(col("sk.values")).collect()(0).getSeq[Long](0)
      assert(got == ref, s"parts=$parts")
    }
    // below k the sketch IS the distinct set and the estimate is exact
    val small = spark.range(40).select(col("id").as("k"))
      .select(Kmv.hash(col("k")).as("h"))
      .agg(graft.layout.Kmv.agg(64)(col("h")).as("sk"))
      .select(col("sk.values").as("sk"))
      .select(Kmv.estimate("sk", 64).as("est")).collect()(0).getLong(0)
    assert(small == 40L)
    // merge == sketch of concatenation (exact bottom-k merge property)
    val xs = (0L until 300L).map(i => i * 7919L)
    val ys = (0L until 200L).map(i => i * 104729L)
    val sx = xs.foldLeft(agg.zero)(agg.reduce)
    val sy = ys.foldLeft(agg.zero)(agg.reduce)
    val whole = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(sx, sy).values.toSeq == whole.values.toSeq)
  }

  test("kmv estimate within 10% of truth on 50k distinct keys (k=1024)") {
    val df = spark.range(50000).select(col("id").as("k"))
    val est = df.select(Kmv.hash(col("k")).as("h"))
      .agg(Kmv.agg()(col("h")).as("sk"))
      .select(col("sk.values").as("sk"))
      .select(Kmv.estimate("sk").as("est")).collect()(0).getLong(0)
    assert(math.abs(est - 50000L) <= 5000, s"est=$est")
  }

  test("ams F2: exact on a one-key stream, merge-by-addition, repartition-invariant") {
    // single key repeated n times: every Z_d = ±n, so the estimate is
    // EXACTLY n² regardless of signs — the sketch's closed-form case
    val one = spark.range(500).select(lit("k").as("k"))
    val est1 = Sketches.amsEstimate(Sketches.amsZ(one, col("k")))
      .head().getAs[Long]("est_f2")
    assert(est1 == 500L * 500L, s"one-key stream: $est1")
    // Z vectors of disjoint stream halves ADD to the whole stream's Z
    val a = spark.range(0, 4000).select((col("id") % 97).as("k"))
    val b = spark.range(4000, 7000).select((col("id") % 131).as("k"))
    val whole = Sketches.amsZ(a.unionByName(b), col("k"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val added = (Sketches.amsZ(a, col("k")).collect() ++
      Sketches.amsZ(b, col("k")).collect())
      .groupBy(_.getInt(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).sum }
    assert(added == whole, "Z vectors must add across stream splits")
    // repartition invariance (sums commute)
    val z1 = Sketches.amsZ(a, col("k")).collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val z2 = Sketches.amsZ(a.repartition(13), col("k")).collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(z1 == z2)
  }

  test("ams F2 estimate within 4 sigma on a uniform 20k-key stream") {
    val n = 100000L; val k = 20000L
    val df = spark.range(n).select((col("id") % k).as("k"))
    val trueF2 = k * (n / k) * (n / k) // uniform: each key n/k times
    val est = Sketches.amsEstimate(Sketches.amsZ(df, col("k")))
      .head().getAs[Long]("est_f2")
    val sigma = math.sqrt(2.0 / Sketches.AmsD) * trueF2
    assert(math.abs(est - trueF2) <= 4 * sigma, s"est=$est true=$trueF2")
  }

  test("count-min never underestimates; exact for most keys at low load") {
    val rnd = new scala.util.Random(7)
    // 200 keys, skewed frequencies 1..60, total ~6k tokens over 4096 cells
    val freqs = (1 to 200).map(i => (s"key$i", 1 + rnd.nextInt(60)))
    val toks = freqs.flatMap { case (k, n) => Seq.fill(n)(k) }.toDF("k")
    val counters = Sketches.cmsCounters(toks, col("k"))
    val truth = freqs.toDF("k", "true_n")
    val est = Sketches.cmsEstimate(truth, counters, Seq("true_n")).collect()
    assert(est.length == 200)
    est.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Int]("true_n").toLong,
        s"${r.getString(0)} underestimated")
    }
    val exact = est.count(r => r.getAs[Long]("est_n") == r.getAs[Int]("true_n").toLong)
    assert(exact >= 180, s"only $exact/200 exact at 200 keys over 4×1024 cells")
  }

  test("count-min counter matrices merge by addition") {
    val a = spark.range(0, 5000).select((col("id") % 97).cast("string").as("k"))
    val b = spark.range(0, 3000).select((col("id") % 61).cast("string").as("k"))
    val whole = Sketches.cmsCounters(a.unionByName(b), col("k"))
    val merged = Sketches.cmsCounters(a, col("k"))
      .unionByName(Sketches.cmsCounters(b, col("k")))
      .groupBy("row_d", "idx").agg(sum("cnt").as("cnt"))
    val diff = whole.unionByName(merged)
      .except(whole.intersect(merged))
    assert(diff.isEmpty, "summed halves differ from whole-stream counters")
  }

  test("structured streaming: per-batch register folds converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("hll-stream-").toString
    var version = 0
    def cur = s"$dir/v$version"
    // seed an empty register table
    spark.emptyDataFrame.select(lit("").as("bucket"), lit(0).as("rho"))
      .limit(0).write.parquet(cur)
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("k")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the live ingest fold: stored registers + batch registers → MAX(ρ)
        val merged = spark.read.parquet(cur)
          .unionByName(Sketches.registers(batch, col("k")))
          .groupBy("bucket").agg(max("rho").as("rho"))
        version += 1
        merged.write.parquet(cur)
        ()
      }
      .start()
    mem.addData(0L until 4000L: _*)
    q.processAllAvailable()
    mem.addData(3000L until 9000L: _*) // overlap: replayed keys change nothing
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(cur)
    val direct = Sketches.registers(
      spark.range(9000).select(col("id").as("k")), col("k"))
    assert(streamed.unionByName(direct)
      .except(streamed.intersect(direct)).isEmpty,
      "streamed register table differs from the direct sketch")
  }

  test("structured streaming: per-batch KMV folds converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("kmv-stream-").toString
    var version = 0
    def cur = s"$dir/v$version"
    spark.emptyDataFrame.select(lit(0L).as("h")).limit(0).write.parquet(cur)
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("k")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // live fold: stored sketch values + batch hashes → bottom-k re-agg
        val merged = spark.read.parquet(cur)
          .unionByName(batch.select(Kmv.hash(col("k")).as("h")))
          .agg(Kmv.agg(256)(col("h")).as("sk"))
          .select(explode(col("sk.values")).as("h"))
        version += 1
        merged.write.parquet(cur)
        ()
      }
      .start()
    mem.addData(0L until 4000L: _*)
    q.processAllAvailable()
    mem.addData(3000L until 9000L: _*) // overlap: replayed keys change nothing
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(cur).collect().map(_.getLong(0)).sorted.toSeq
    val direct = spark.range(9000).select(Kmv.hash(col("id")).as("h"))
      .agg(Kmv.agg(256)(col("h")).as("sk"))
      .select(col("sk.values")).collect()(0).getSeq[Long](0)
    assert(streamed == direct,
      "streamed bottom-k sketch differs from the direct sketch")
  }

  test("ks1 at sf0.001: sample quantile rank error within 2.5 points; monotone in q") {
    val rows = graft.layout.LayoutQueries
      .queries("ks1_sample_quantiles")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 6)
    // orders at sf0.001 has ~1.5k rows and the sketch keeps 1024 — a >2/3
    // sample. The statistical contract of a uniform-sample quantile is RANK
    // accuracy (value error is unbounded in distribution tails): the
    // estimate's true rank must sit within 2.5 points of the target
    // percentile.
    val prices = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted
    rows.foreach { r =>
      val q = r.getInt(0); val est = r.getDouble(1); val tru = r.getDouble(2)
      assert(est > 0 && tru > 0, s"q$q: $est / $tru")
      val pos = prices.count(_ <= est).toDouble / prices.length * 100
      assert(math.abs(pos - q) <= 2.5, s"q$q: est $est has true rank $pos")
    }
    // monotone in q on both sides
    assert(rows.map(_.getDouble(1)).toSeq == rows.map(_.getDouble(1)).sorted.toSeq)
    assert(rows.map(_.getDouble(2)).toSeq == rows.map(_.getDouble(2)).sorted.toSeq)
  }

  test("bucket-parallel global rank matches the single-partition reference") {
    // the ks1 truth-side machinery, isolated: value-range buckets + offset
    // join must reproduce exact global row_number on a skewed value set
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(4000)(math.pow(rnd.nextDouble(), 4) * 1e5) // skewed
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
      .repartition(16)
    val NB = 8
    val bounds = df.agg(min("v").as("lo"), max("v").as("hi"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("pid", least(lit(NB - 1), greatest(lit(0),
        floor((col("v") - col("lo")) * NB /
          (col("hi") - col("lo") + lit(1e-9))).cast("int"))))
    val offs = bucketed.groupBy("pid").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum("c").over(
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("off"))
    val got = bucketed
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("v"), col("k"))))
      .join(broadcast(offs), "pid")
      .select(col("k"), (col("off") + col("prn")).cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == ref)
  }

  test("cp1 bins at sf0.001: packing invariants hold") {
    val bins = LayoutQueries.queries("cp1_compaction_plan")(spark, sf0001).collect()
    val totalRows = bins.map(_.getAs[Long]("bin_rows")).sum
    val orders = graft.Tables.orders(spark, sf0001).count()
    assert(totalRows == orders, "every file lands in exactly one bin")
    bins.foreach { b =>
      // next-fit-by-cumsum: a bin overflows its target by at most one file
      assert(b.getAs[Long]("bin_rows") <
        LayoutQueries.CpTarget + b.getAs[Long]("largest_file"),
        s"bin ${b.getAs[Long]("bin_id")} overpacked")
    }
  }

  test("rp1 buckets at sf0.001: full coverage, ordered, balanced") {
    val bs = LayoutQueries.queries("rp1_range_plan")(spark, sf0001).collect()
    assert(bs.map(_.getAs[Long]("n_rows")).sum ==
      graft.Tables.orders(spark, sf0001).count())
    // ranges strictly ordered and non-overlapping
    bs.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Double]("hi") < hi.getAs[Double]("lo"))
      case _ =>
    }
    // o_totalprice is ~unique per order, so balance within ±1 of fair share
    val sizes = bs.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 2,
      s"unbalanced: min=${sizes.min} max=${sizes.max}")
  }

  test("structured streaming: per-batch histogram folds converge to the direct build") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("hist-stream-").toString
    var version = 0
    def cur = s"$dir/v$version"
    spark.emptyDataFrame.select(lit(0L).as("k"), lit(0L).as("cnt"))
      .limit(0).write.parquet(cur)
    // frozen bounds fixed at index-build time (the st4 contract)
    val lo = 0L; val dd = 10000L
    def histOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(expr(Sketches.histBucketClampedSql("x", s"$lo", s"$dd", "div"))
        .as("k"))
      .agg(count(lit(1)).as("cnt"))
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("x")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the live ingest fold: stored counts + batch counts ADD cell-wise
        val merged = spark.read.parquet(cur)
          .unionByName(histOf(batch))
          .groupBy("k").agg(sum("cnt").as("cnt"))
        version += 1
        merged.write.parquet(cur)
        ()
      }
      .start()
    mem.addData(0L until 4000L: _*)
    q.processAllAvailable()
    mem.addData(4000L until 9000L: _*)
    mem.addData(12000L until 12100L: _*) // out of frozen range: edge-clamped
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(cur)
    val direct = histOf(spark.range(9000).select(col("id").as("x"))
      .unionByName((12000L until 12100L).toDF("x")))
    assert(streamed.unionByName(direct)
      .except(streamed.intersect(direct)).isEmpty,
      "streamed histogram differs from the direct clamped build")
  }

  // ---------------------------------------------------------------- bloom

  private def bloomRefPositions(k: Long): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until Sketches.BloomK).map(i =>
      (java.lang.Long.parseLong(h.substring(i * 8, i * 8 + 8), 16)
        % Sketches.BloomM).toInt)
  }

  private def wordsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bloom: packed words match a direct md5-position reference") {
    val keys = (1L to 1500L).filter(_ % 3 == 0)
    val ref = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    keys.foreach(k => bloomRefPositions(k).foreach { p =>
      val w = (p / Sketches.BloomLane).toLong
      ref(w) = ref(w) | (1L << (p % Sketches.BloomLane))
    })
    val got = wordsOf(Sketches.bloomBuild(keys.toDF("k"), col("k")))
    assert(got == ref.toMap)
  }

  test("bloom: no false negatives, mergeable by OR, repartition-invariant") {
    val a = spark.range(1, 2000).select(col("id").as("k"))
    val b = spark.range(5000, 6000).select(col("id").as("k"))
    val u = a.unionByName(b)
    val wU = wordsOf(Sketches.bloomBuild(u, col("k")))
    val wA = wordsOf(Sketches.bloomBuild(a, col("k")))
    val wB = wordsOf(Sketches.bloomBuild(b, col("k")))
    val or = (wA.keySet ++ wB.keySet).map(i =>
      i -> (wA.getOrElse(i, 0L) | wB.getOrElse(i, 0L))).toMap
    assert(or == wU, "sketches of disjoint streams merge by cell-wise OR")
    assert(wordsOf(Sketches.bloomBuild(u.repartition(13), col("k"))) == wU)
    // membership: every true member passes (never-false-negative)
    val res = Sketches.bloomContains(a, Sketches.bloomBuild(a, col("k")))
    assert(res.collect().forall(_.getAs[Boolean]("bf_pass")))
  }

  test("bloom: bf1 membership grid matches per-key reference decisions") {
    val members = (1L to 1500L).filter(_ % 3 == 0)
    val bits = members.flatMap(bloomRefPositions).toSet
    val words = Sketches.bloomBuild(members.toDF("k"), col("k"))
    val got = Sketches.bloomContains((1L to 1500L).toDF("k"), words)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("bf_pass")).toMap
    (1L to 1500L).foreach { k =>
      val expect = bloomRefPositions(k).forall(bits.contains)
      assert(got(k) == expect, s"key $k")
    }
    // the operating point is non-degenerate: some fp, not all
    val fp = (1L to 1500L).count(k => k % 3 != 0 && got(k))
    assert(fp > 0 && fp < 500, s"fp count $fp out of 1000 non-members")
  }

  test("bf2 at sf0.001: bloom-pruned join equals the plain join; pruning bites") {
    import graft.Tables
    val pruned = LayoutQueries.queries("bf2_bloom_join")(spark, sf0001).collect()
    val dim = Tables.supplier(spark, sf0001)
      .filter(col("s_nationkey") < LayoutQueries.BfNationMax)
      .select(col("s_suppkey"), col("s_nationkey"))
    val plain = Tables.lineitem(spark, sf0001)
      .join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"), Tables.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("s_nationkey").collect()
    assert(pruned.toSeq.map(_.toSeq) == plain.toSeq.map(_.toSeq))
    // the scan-side predicate really prunes: pass-fraction ≈ dim coverage
    val w = wordsOf(Sketches.bloomBuild(dim, col("s_suppkey")))
    val arr = (0 until Sketches.bloomNWords)
      .map(i => w.getOrElse(i.toLong, 0L)).mkString("array(", "L, ", "L)")
    val li = Tables.lineitem(spark, sf0001)
      .withColumn("h", md5(col("l_suppkey").cast("string")))
    val pass = li.filter(expr(Sketches.bloomFilterExpr("h", arr))).count()
    assert(pass > 0 && pass * 5 < li.count() * 4,
      s"bloom should prune the fact scan: pass=$pass")
  }
}
