package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fuzz pins: the native md5 digest-slice kernels must equal the composed
  * `conv(substring(md5(x), pos, len), 16, 10)` forms they replaced
  * (Kmv.hash, CMS chunk/Bloom probe positions, AMS parity signs, the
  * split/cap/shard slot hashes) — value identity is what keeps every DuckDB
  * oracle untouched. */
class Md5SlicesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xd5)
  private def fuzzStrings: Seq[String] =
    Seq("", "a", "key|1", "é世界 unicode", "0" * 200) ++
      Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString) ++
      Seq.fill(50)(rnd.nextLong().toString)

  test("md5_hex_long ≡ conv(substring(md5(x), pos, len), 16, 10) for every slice geometry in use") {
    val df = fuzzStrings.toDF("x")
    for ((pos, len) <- Seq((1, 15), (1, 8), (9, 8), (17, 8), (25, 8), (2, 5), (18, 15))) {
      val bad = df.select(
          Md5HexLong(col("x"), pos, len).as("native"),
          expr(s"CAST(conv(substring(md5(x), $pos, $len), 16, 10) AS BIGINT)").as("sql"))
        .filter(col("native") =!= col("sql") ||
          col("native").isNull =!= col("sql").isNull)
        .count()
      assert(bad == 0, s"slice ($pos, $len) diverged on $bad rows")
    }
  }

  test("md5_hex_longs ≡ k independent conv slices of one digest") {
    val slices = Seq((1, 8), (9, 8), (17, 8), (25, 8))
    val df = fuzzStrings.toDF("x")
      .withColumn("hs", Md5HexLongs(col("x"), slices))
    slices.zipWithIndex.foreach { case ((pos, len), i) =>
      val bad = df.select(col("hs").getItem(i).as("native"),
          expr(s"CAST(conv(substring(md5(x), $pos, $len), 16, 10) AS BIGINT)").as("sql"))
        .filter(col("native") =!= col("sql")).count()
      assert(bad == 0, s"slice $i diverged on $bad rows")
    }
  }

  test("md5_parity_mask bit d ≡ conv(substring(md5(x), d+1, 1), 16, 10) % 2 for all 32 digits") {
    val df = fuzzStrings.toDF("x").withColumn("m", Md5ParityMask(col("x")))
    for (d <- 0 until 32) {
      val bad = df.select(expr(s"(m >> $d) & 1").as("native"),
          expr(s"CAST(conv(substring(md5(x), ${d + 1}, 1), 16, 10) % 2 AS BIGINT)").as("sql"))
        .filter(col("native") =!= col("sql")).count()
      assert(bad == 0, s"digit ${d + 1} parity diverged on $bad rows")
    }
  }

  test("md5_rho ≡ the hex substring/regexp/instr ladder for every precision in use") {
    val df = fuzzStrings.toDF("x")
    for (p <- Seq(2, 3, 4)) {
      val rMax = 40
      val sql = df.withColumn("h", md5(col("x")))
        .withColumn("bucket", substring(col("h"), 1, p))
        .withColumn("tail", substring(col("h"), p + 1, 32 - p))
        .withColumn("lead0", length(regexp_extract(col("tail"), "^(0*)", 1)))
        .withColumn("dv",
          expr("instr('123456789abcdef', substring(tail, lead0 + 1, 1))"))
        .withColumn("rho",
          when(col("dv") === 0, lit(rMax)).otherwise(
            least(lit(4) * col("lead0") +
              when(col("dv") >= 8, 0).when(col("dv") >= 4, 1)
                .when(col("dv") >= 2, 2).otherwise(3) + 1, lit(rMax))))
        .select(col("x"), col("bucket"), col("rho"))
      val native = df.select(col("x"),
        Md5Rho(col("x"), p, rMax).as("br"))
        .select(col("x"), col("br.bucket").as("nb"), col("br.rho").as("nr"))
      val joined = sql.join(native, "x")
      val bad = joined.filter(col("bucket") =!= col("nb") ||
        col("rho") =!= col("nr")).count()
      assert(bad == 0, s"p=$p diverged on $bad rows")
    }
  }

  test("null propagates like the composed form") {
    val df = Seq(Some("k"), None).toDF("x")
    val r = df.select(
      Md5HexLong(col("x"), 1, 15).as("a"),
      Md5HexLongs(col("x"), Seq((1, 8))).as("b"),
      Md5ParityMask(col("x")).as("c")).collect()
    assert(!r(0).isNullAt(0) && !r(0).isNullAt(1) && !r(0).isNullAt(2))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1) && r(1).isNullAt(2))
  }
}
