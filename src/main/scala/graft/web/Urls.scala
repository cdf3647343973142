package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization every
  * crawl pipeline (C4, RefinedWeb, Dolma) runs before URL-level dedup and
  * domain-level filtering: two pages that differ only in scheme case, a
  * `www.` prefix, a default port, tracking parameters, a fragment, or a
  * trailing slash are the same document.
  *
  * Parse-then-rebuild, not whole-string sed: the URL is split into
  * host/path/query by anchored regexes (identical RE2-safe patterns in both
  * engines — no lookarounds), each part is normalized independently, and the
  * canonical form is reassembled. All narrow codegen'd string expressions —
  * no UDF, no shuffle; at 100 TB this runs inside the ingest scan.
  */
object Urls {

  /** Tracking query parameters dropped during canonicalization. */
  val TrackingPrefixes = Seq("utm_", "ref", "fbclid", "gclid")

  /** hostname: lowercased, `www.` stripped, default ports stripped. */
  def hostOf(url: Column): Column = {
    val raw = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val noPort = regexp_replace(raw, ":(443|80)$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** registrable domain, approximated as the last two host labels (the
    * corpus here has no public-suffix subtleties; a deployment swaps in a
    * suffix-list lookup via the same column contract). */
  def domainOf(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** path: trailing slash stripped (root collapses to empty). */
  def pathOf(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")

  /** query string with tracking params dropped, original order kept. */
  def cleanQueryOf(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(q, "&"), p =>
      p =!= "" && !TrackingPrefixes.map(t => p.startsWith(t)).reduce(_ || _))
    array_join(kept, "&")
  }

  /** canonical URL: https + normalized host + path (+ surviving query). */
  def canonicalize(url: Column): Column = {
    val base = concat(lit("https://"), hostOf(url), pathOf(url))
    when(cleanQueryOf(url) === "", base)
      .otherwise(concat(base, lit("?"), cleanQueryOf(url)))
  }

  // ------------------------------------------------------------------
  // DuckDB mirrors (same anchored RE2 patterns, list ops for the query)
  // ------------------------------------------------------------------

  def hostSql(url: String): String =
    s"""regexp_replace(regexp_replace(
       |  lower(regexp_extract($url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
       |  ':(443|80)$$', ''), '^www\\.', '')""".stripMargin

  def domainSql(host: String): String =
    s"regexp_extract($host, '([^.]+\\.[^.]+)$$', 1)"

  def pathSql(url: String): String =
    s"""regexp_replace(
       |  regexp_extract($url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1),
       |  '/+$$', '')""".stripMargin

  def cleanQuerySql(url: String): String = {
    val conds = TrackingPrefixes.map(t => s"NOT starts_with(p, '$t')")
      .mkString(" AND ")
    // COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
    // array_join([]) is '' — pin the Spark semantics
    s"""COALESCE(array_to_string(list_filter(
       |  string_split(regexp_extract($url, '\\?([^#]*)', 1), '&'),
       |  p -> p <> '' AND $conds), '&'), '')""".stripMargin
  }

  def canonicalSql(url: String): String =
    s"""CASE WHEN ${cleanQuerySql(url)} = ''
       |  THEN 'https://' || ${hostSql(url)} || ${pathSql(url)}
       |  ELSE 'https://' || ${hostSql(url)} || ${pathSql(url)} || '?' || ${cleanQuerySql(url)}
       |END""".stripMargin
}
