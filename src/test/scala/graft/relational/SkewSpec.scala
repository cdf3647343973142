package graft.relational

import graft.SparkSpec
import graft.sparql.SparqlEngine
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join: identical result to plain join under heavy key skew") {
    // 10k rows, 90% on one hot key
    val probe = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(42L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val build = Seq((42L, "hot"), (7L, "cold"), (10L, "ten")).toDF("k", "v")
    val plain = probe.join(build, "k").select("k", "payload", "v")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(probe, build, "k", salts = 8)
      .select("k", "payload", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 42L) == 9000)
  }

  test("hotKeys surfaces the heavy hitters in order") {
    val df = (Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c")).toDF("k")
    val hot = Skew.hotKeys(df, "k", 2).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hot.toSeq == Seq(("a", 100L), ("b", 10L)))
  }

  test("collectCapped enforces the 10k-row / 8MiB result contract") {
    val wide = spark.range(200)
      .select(concat(lit("x" * 100000), col("id").cast("string")).as("s"))
    val (rows, truncated) = SparqlEngine.collectCapped(wide)
    assert(truncated, "8 MiB cap must truncate 200 x 100KB rows")
    assert(rows.length < 200 && rows.nonEmpty)
    val (small, t2) = SparqlEngine.collectCapped(spark.range(10).toDF())
    assert(!t2 && small.length == 10)
  }
}
