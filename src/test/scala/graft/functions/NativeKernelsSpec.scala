package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NativeKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("sliding_min_i64 ≡ the HOF window-min form, including short arrays") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong()))
    val w = 5
    val hof = element_at(transform(array(col("a")), hs =>
      transform(sequence(lit(0), greatest(size(hs) - w, lit(0))),
        j => array_min(slice(hs, j + 1, lit(w))))), 1)
    val df = rows.toDF("a")
      .select(SlidingMinI64(col("a"), w).as("native"), hof.as("hof"))
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
  }

  test("winnow_fps ≡ the composed md5/conv/sliding-min/distinct pipeline") {
    val k = 6; val w = 4
    // includes a surrogate-pair doc: substr counts CODE POINTS, and a
    // UTF-16-offset kernel would hash different grams
    val docs = (Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaa", "short", "exact6",
      "emoji 😀 inside a longer piece of text 😀 twice") ++
      Seq.tabulate(50)(i => s"synthetic document number $i with shared tail words"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val composedHashes = transform(
      sequence(lit(1), length(col("text")) - (k - 1)),
      i => conv(substring(md5(col("text").substr(i, lit(k))), 1, 15), 16, 10)
        .cast("long"))
    val composed = docs.toDF("doc_id", "text")
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(SlidingMinI64(composedHashes, w))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = TextOps.winnow(docs, k, w)
    assert(native == composed,
      s"kernel diverges from the composed form: ${(native diff composed).take(3)} / ${(composed diff native).take(3)}")
    assert(native.nonEmpty && !native.exists(_._1 == 2L), "sub-k doc must vanish")
  }

  test("minhash_sigs ≡ the composed md5/conv/xor-shift HOF derivation") {
    val k = 8
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha", "beta", "gamma", "delta", "café", "Über")
    val rows = Seq.fill(80)(Seq.fill(1 + rnd.nextInt(12))(
      words(rnd.nextInt(words.size))).mkString(" ")) :+ ""
    val shs = graft.dedup.Dedup.shingles(col("text"), 3)
    val composed = array((0 until k).map(i =>
      array_min(transform(shs, sh => {
        val m = md5(sh)
        conv(substring(m, 1, 15), 16, 10).cast("long")
          .bitwiseXOR(shiftrightunsigned(
            conv(substring(m, 17, 15), 16, 10).cast("long"), i))
      }))): _*)
    val df = rows.toDF("text")
      .select(MinhashSigs(shs, k).as("native"), composed.as("hof"),
        size(shs).as("n_sh"))
    val bad = df.filter(col("n_sh") > 0 && not(col("native") === col("hof")))
    assert(bad.count() == 0, s"kernel diverges: ${bad.take(2).toSeq}")
    assert(df.filter(col("n_sh") === 0 && size(col("native")) =!= 0).count() == 0,
      "empty shingle set must give an empty signature")
  }

  test("simhash_of ≡ the explode + double-groupBy vote formulation") {
    val rnd = new scala.util.Random(5)
    val words = Vector("data", "spark", "engine", "query", "café", "the", "a")
    val docs = (Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(20))(
        words(rnd.nextInt(words.size))).mkString(" "))) :+
      (900L, "!!! ...")) // token-less doc must vanish from BOTH
      .toDF("doc_id", "text")
    val toks = graft.dedup.Dedup.tokens(col("text"))
    val voteSums = (0 until 60).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"v$i"))
    val fp = (0 until 60).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    val composed = docs
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      .groupBy(col("doc_id")).agg(voteSums.head, voteSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = graft.dedup.Dedup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed, s"simhash kernel diverges: " +
      s"${(native.toSet diff composed.toSet).take(3)} vs ${(composed.toSet diff native.toSet).take(3)}")
    assert(!native.contains(900L), "token-less doc leaked into the fingerprints")
  }

  test("simhash triple-key blocking is complete for hamming distance <= 3") {
    // pigeonhole invariant behind simhashPairs' candidate generation: flip
    // any <=3 of the 60 bits and at least one C(6,3) block-triple is
    // untouched, so its 30-bit key still collides. A blocking that lost
    // this would silently MISS pairs (the exact verify step only prunes).
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(300) {
      val fp = rnd.nextLong() & ((1L << 60) - 1)
      val nFlips = 1 + rnd.nextInt(3)
      val bits = rnd.shuffle((0 until 60).toList).take(nFlips)
      (fp, bits.foldLeft(fp)((f, b) => f ^ (1L << b)))
    }
    val keyed = rows.toDF("fp", "fp2").select(
      array(graft.dedup.Dedup.simhashTripleKeys(col("fp")): _*).as("k1"),
      array(graft.dedup.Dedup.simhashTripleKeys(col("fp2")): _*).as("k2"))
    // positional, matching simhashPairs' (triple_idx, key) join equi-key
    val collides = exists(zip_with(col("k1"), col("k2"), (a, b) => a === b),
      x => x)
    assert(keyed.filter(not(collides)).count() == 0)
  }

  private object TextOps {
    def winnow(docs: Seq[(Long, String)], k: Int, w: Int): Set[(Long, Long)] =
      graft.text.TextAnalysis.winnowFingerprints(
          docs.toDF("doc_id", "text"), k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("sig_bits ≡ the boxed-UDF loop it replaced, over fuzzed widths/signs") {
    // the round-11 UDF re-expressed verbatim as the reference: same
    // closed-over md5-parity sign matrix, same >0 bit rule
    val nBits = 12
    def planeSigns(p: Int): Array[Long] = {
      val mdf = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(1024) { i =>
        val hex = mdf.digest(s"$p|$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L
        else -1L
      }
    }
    val signs = Array.tabulate(nBits)(planeSigns)
    val refUdf = udf((v: Seq[Long]) => {
      var sig = 0L
      var p = 0
      while (p < signs.length) {
        val s = signs(p)
        var acc = 0L
        var i = 0
        while (i < v.length) { acc += v(i) * s(i); i += 1 }
        if (acc > 0) sig |= (1L << p)
        p += 1
      }
      sig
    })
    val rnd = new scala.util.Random(29)
    // varied widths (incl. 0 and the 1024 cap), small magnitudes so the
    // acc==0 tie branch (sign bit NOT set) is actually exercised
    val rows = (Seq(Seq.empty[Long], Seq.fill(1024)(1L)) ++
      Seq.fill(200)(Seq.fill(1 + rnd.nextInt(64))(
        (rnd.nextInt(5) - 2).toLong))).map(Tuple1(_))
    val df = rows.toDF("v")
      .select(SigBits(col("v"), nBits).as("native"), refUdf(col("v")).as("ref"))
    assert(df.filter(not(col("native") === col("ref"))).count() == 0)
    // wide vectors must error, not silently truncate
    val wide = Seq(Tuple1(Seq.fill(1025)(1L))).toDF("v")
      .select(SigBits(col("v"), nBits))
    val e = intercept[Exception] { wide.collect() }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("")) +
        Option(t.getCause).map(rootMsg).getOrElse("")
    assert(rootMsg(e).contains("wider than 1024"))
  }

  test("intersect_count ≡ size(array_intersect), incl. dups, nulls, empties") {
    val rnd = new scala.util.Random(31)
    val words = Vector("a", "b", "c", "dd", "ee", "ff", "über", "😀", null)
    val rows = Seq((Seq.empty[String], Seq("a", "b")),
      (Seq("a", "a", "b"), Seq("b", "b", "a"))) ++
      Seq.fill(300)((Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))),
        Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size)))))
    val df = rows.toDF("x", "y").select(
      IntersectCount(col("x"), col("y")).as("native"),
      size(array_intersect(col("x"), col("y"))).cast("long").as("hof"))
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
  }

  test("gear_chunks: boundaries match a direct windowed-sum reference") {
    // independent reference: h_i as the explicit 62-term windowed sum mod
    // 2^62 (the closed form the DuckDB oracle uses), not the kernel's
    // rolling recurrence — the two derivations must agree exactly
    def gear(c: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(String.valueOf(c).getBytes("US-ASCII"))
      var h = 0L
      for (b <- 0 until 8) h = (h << 8) | (d(b) & 0xffL)
      h >>> 4
    }
    val mask62 = (1L << 62) - 1
    def refEnds(s: String, bits: Int): Seq[Int] = {
      if (s.isEmpty) return Seq.empty
      val g = s.map(c => gear(c.toInt))
      val ends = (0 until s.length).filter { i =>
        var acc = 0L
        for (k <- 0 to math.min(i, 61))
          acc = (acc + ((g(i - k) & (mask62 >> k)) << k)) & mask62
        (acc & ((1L << bits) - 1)) == 0L
      }.map(_ + 1).filter(_ < s.length)
      ends :+ s.length
    }
    val rnd = new scala.util.Random(23)
    val texts = Seq("", "a", "hello world") ++
      Seq.fill(40)(Seq.fill(20 + rnd.nextInt(300))(
        ('a' + rnd.nextInt(26)).toChar).mkString)
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), GearChunks(col("text"), 6).as("ends"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refEnds(t, 6), s"mismatch on text #$i")
    }
  }

  test("gear_chunks: chunk hashes re-align after a prefix edit (edit-shift robustness)") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(600)(('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED-PREFIX-" + base
    def chunkHashes(t: String): Seq[String] = {
      val rows = Seq((1L, t)).toDF("doc_id", "text")
      graft.dedup.Dedup.cdcChunks(rows, 6)
        .orderBy("chunk_idx").collect().map(_.getString(4)).toSeq
    }
    val a = chunkHashes(base)
    val b = chunkHashes(edited)
    // the gear window is 62 chars: boundaries more than ~62 chars past the
    // edit are unchanged, so the two chunk streams share a long tail — the
    // property a fixed-width grid chunker fails
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size / 2,
      s"edit destroyed chunk alignment: ${shared.size} shared of ${a.size}")
    assert(a.takeRight(2) == b.takeRight(2), "tail chunks did not re-align")
  }
}
