package graft.web

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url").select(Urls.canonicalize(col("url"))).head().getString(0)

  test("canonicalize: each planted shape normalizes to the expected form") {
    // shapes 0..5 of the same (site, base) — hand-derived expectations
    assert(canon("HTTPS://WWW.site7.ORG:443/docs/31/?utm_source=feed&id=31")
      == "https://site7.org/docs/31?id=31")
    assert(canon("http://site7.org/docs/31?id=31&ref=rss#frag")
      == "https://site7.org/docs/31?id=31")
    assert(canon("https://www.site7.ORG/docs/31/")
      == "https://site7.org/docs/31")
    assert(canon("https://site7.org:80/docs/31")
      == "https://site7.org/docs/31")
    assert(canon("https://m.site7.org/docs/31")
      == "https://m.site7.org/docs/31")
    assert(canon("https://site7.org/docs/31?a=1&utm_campaign=x&b=2")
      == "https://site7.org/docs/31?a=1&b=2")
  }

  test("canonicalize edge cases: root path, only-tracking query, mixed scheme") {
    assert(canon("HTTP://Example.COM/") == "https://example.com")
    assert(canon("https://example.com/?utm_source=x") == "https://example.com")
    assert(canon("ftp://a.b.example.com/x/") == "https://a.b.example.com/x")
  }

  test("domainOf: subdomains roll up to the registrable domain") {
    val rows = Seq("https://m.site4.org/d", "https://www.site4.org/d",
      "https://site4.org/d").toDF("url")
      .select(Urls.domainOf(Urls.hostOf(col("url")))).distinct().collect()
    assert(rows.map(_.getString(0)).toSet == Set("site4.org"))
  }

  test("planted pairs: shapes (0,1) and (2,3) collapse, (4,5) stay distinct") {
    val perPair = WebQueries.urlCorpus(spark, sf0001)
      .select(expr("doc_id div 2").as("pair"), (col("doc_id") % 6).as("shape"),
        Urls.canonicalize(col("url")).as("canon"))
      .groupBy("pair")
      .agg(countDistinct("canon").as("n"), min("shape").as("s0"),
        count(lit(1)).as("members"))
      .filter(col("members") === 2) // complete pairs only
      .collect()
    perPair.foreach { r =>
      val expected = if (r.getAs[Long]("s0") == 4L) 2L else 1L
      assert(r.getAs[Long]("n") == expected,
        s"pair ${r.getAs[Long]("pair")} shape ${r.getAs[Long]("s0")}")
    }
  }
}
