package graft.web

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver gates for web-corpus URL curation ([[Urls]]). The documents table
  * carries no URLs, so each doc gets a deterministically planted one (the
  * piiCorpus discipline: the oracle CTE replicates the planting verbatim) —
  * six rotating shapes that exercise every normalization rule: scheme/host
  * case, `www.`, default ports 443/80, tracking params, fragments, trailing
  * slashes, and an `m.` subdomain. Docs `2k`/`2k+1` share a path, so raw
  * URLs that differ only in noise collapse to one canonical form — the
  * URL-level dedup url2 measures per domain.
  */
object WebQueries {

  private def baseId = expr("CAST(doc_id div 2 AS STRING)")
  private def siteId = expr("CAST((doc_id div 2) % 40 AS STRING)")

  /** documents + one planted URL per doc (shape = doc_id % 6). Docs 2k/2k+1
    * share a site + path, so shape pairs (0,1) and (2,3) collapse to one
    * canonical URL while (4,5) stay distinct (different host / surviving
    * query) — a known ~⅔ cross-variant dup rate for url2 to measure. */
  def urlCorpus(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
      when(col("doc_id") % 6 === 0,
        concat(lit("HTTPS://WWW.site"), siteId, lit(".ORG:443/docs/"),
          baseId, lit("/?utm_source=feed&id="), baseId))
      .when(col("doc_id") % 6 === 1,
        concat(lit("http://site"), siteId, lit(".org/docs/"),
          baseId, lit("?id="), baseId, lit("&ref=rss#frag")))
      .when(col("doc_id") % 6 === 2,
        concat(lit("https://www.site"), siteId, lit(".ORG/docs/"),
          baseId, lit("/")))
      .when(col("doc_id") % 6 === 3,
        concat(lit("https://site"), siteId, lit(".org:80/docs/"), baseId))
      .when(col("doc_id") % 6 === 4,
        concat(lit("https://m.site"), siteId, lit(".org/docs/"), baseId))
      .otherwise(
        concat(lit("https://site"), siteId, lit(".org/docs/"),
          baseId, lit("?a=1&utm_campaign=x&b=2")))
      .as("url"))

  /** DuckDB mirror of [[urlCorpus]] as a CTE body. Continuation lines keep
    * `||` at END of line: this fragment is re-interpolated into outer
    * stripMargin templates, which would eat a leading pipe. */
  val urlCorpusSql: String =
    """urls AS (SELECT doc_id, n_chars,
      |  CASE doc_id % 6
      |    WHEN 0 THEN 'HTTPS://WWW.site' || CAST((doc_id // 2) % 40 AS VARCHAR) ||
      |      '.ORG:443/docs/' || CAST(doc_id // 2 AS VARCHAR) ||
      |      '/?utm_source=feed&id=' || CAST(doc_id // 2 AS VARCHAR)
      |    WHEN 1 THEN 'http://site' || CAST((doc_id // 2) % 40 AS VARCHAR) ||
      |      '.org/docs/' || CAST(doc_id // 2 AS VARCHAR) || '?id=' ||
      |      CAST(doc_id // 2 AS VARCHAR) || '&ref=rss#frag'
      |    WHEN 2 THEN 'https://www.site' || CAST((doc_id // 2) % 40 AS VARCHAR) ||
      |      '.ORG/docs/' || CAST(doc_id // 2 AS VARCHAR) || '/'
      |    WHEN 3 THEN 'https://site' || CAST((doc_id // 2) % 40 AS VARCHAR) ||
      |      '.org:80/docs/' || CAST(doc_id // 2 AS VARCHAR)
      |    WHEN 4 THEN 'https://m.site' || CAST((doc_id // 2) % 40 AS VARCHAR) ||
      |      '.org/docs/' || CAST(doc_id // 2 AS VARCHAR)
      |    ELSE 'https://site' || CAST((doc_id // 2) % 40 AS VARCHAR) ||
      |      '.org/docs/' || CAST(doc_id // 2 AS VARCHAR) || '?a=1&utm_campaign=x&b=2'
      |  END AS url
      |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // URL canonicalization: raw → canonical/host/domain, one narrow
    // codegen'd projection (no UDF, no shuffle — ingest-scan work).
    "url1_normalize" -> { (s, d) =>
      urlCorpus(s, d)
        .select(col("doc_id"), col("url"),
          Urls.canonicalize(col("url")).as("url_canon"),
          Urls.hostOf(col("url")).as("host"),
          Urls.domainOf(Urls.hostOf(col("url"))).as("domain"))
        .orderBy("doc_id")
    },

    // Domain-level curation stats: docs, raw URLs vs distinct canonical
    // URLs (the URL-dedup ratio), chars — the relation a domain
    // blocklist/quality policy consumes. One domain-key aggregation.
    "url2_domain_stats" -> { (s, d) =>
      urlCorpus(s, d)
        .select(col("n_chars"),
          Urls.canonicalize(col("url")).as("canon"),
          Urls.domainOf(Urls.hostOf(col("url"))).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canon")).as("n_urls_canon"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("domain")
    }
  )

  val oracles: Map[String, String] = Map(

    "url1_normalize" ->
      s"""WITH $urlCorpusSql
         |SELECT doc_id, url,
         |  ${Urls.canonicalSql("url")} AS url_canon,
         |  ${Urls.hostSql("url")} AS host,
         |  ${Urls.domainSql(Urls.hostSql("url"))} AS domain
         |FROM urls ORDER BY doc_id""".stripMargin,

    "url2_domain_stats" ->
      s"""WITH $urlCorpusSql
         |SELECT ${Urls.domainSql(Urls.hostSql("url"))} AS domain,
         |  COUNT(*) AS n_docs,
         |  COUNT(DISTINCT ${Urls.canonicalSql("url")}) AS n_urls_canon,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM urls GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
