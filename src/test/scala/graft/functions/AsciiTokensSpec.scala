package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fuzz pin: the native tokenizer must equal the composed
  * `filter(split(lower(c), "[^a-z0-9]+"), len > 0)` it replaced — the exact
  * tokenization every FTS/text/shingle oracle is written against. */
class AsciiTokensSpec extends SparkSpec {
  import spark.implicits._

  private def sqlTokens = filter(
    split(lower(col("x")), "[^a-z0-9]+"), t => length(t) > 0)

  test("ascii_tokens ≡ the split/filter form on fuzz + unicode edge cases") {
    val rnd = new scala.util.Random(0x70c)
    val alphabet = "abcXYZ019 .,;!-_/\\\n\tÉüλ世界😀İKKİ"
    val cases = Seq("", " ", "...", "a", "A B", "hello,world 42x",
      "İstanbul", "Kelvin", "é é é", "ŉ", "ẞ sharp") ++
      Seq.fill(400)((0 until rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("x")
      .select(AsciiTokens(col("x")).as("native"), sqlTokens.as("sql"))
    val bad = df.filter(col("native") =!= col("sql")).collect()
    assert(bad.isEmpty, s"diverged on: ${bad.take(3).mkString("; ")}")
  }

  test("null propagates") {
    val r = Seq(Some("a b"), None).toDF("x")
      .select(AsciiTokens(col("x")).as("t")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
