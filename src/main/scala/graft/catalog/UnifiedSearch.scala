package graft.catalog

import graft.fts.Search
import graft.sparql.RdfTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unified four-section realm search (reference `api/src/routes/search.rs`):
  * one query string fanned to documents + buckets + groups + users, each
  * section independently limited and ordered, composed into one response.
  *
  * Semantics mirrored from the route handler:
  *  - per-section page size = `limit.getOrElse(10).clamp(1, 100)`
  *    (`search.rs:27-28,300`), buckets additionally capped at 50
  *    (`search.rs:29,352`);
  *  - `types` selects a subset of sections; default all four
  *    (`search.rs:53-54,parse_search_types`);
  *  - groups/users enforce the 2-char minimum query
  *    (`MIN_SEARCH_QUERY_CHARS`, `routes/users.rs`) — a shorter q yields
  *    empty sections; documents (FTS) and buckets have no such guard
  *    (`search.rs:227,294` trim the unified q before the check);
  *  - buckets is a case-insensitive substring match excluding `ws-`
  *    workspaces; groups/users are case-insensitive name substring.
  *
  * Spark shape: each section is a narrow top-k over its own table
  * (documents: token-IN pushdown into the token-clustered postings scan;
  * the others: small dimension scans), unioned AFTER the per-section
  * limits — the union moves k rows per section, never a corpus. At scale
  * each section's limit pushes down (TakeOrderedAndProject), and sections
  * execute independently — the same fan-out/merge the reference does
  * across nodes, done here across partitions.
  */
object UnifiedSearch {

  val AllTypes: Seq[String] = Seq("documents", "buckets", "groups", "users")

  /** One unified search, flattened to (section, rank, hit_id, label). */
  def search(s: SparkSession, dir: String, q: String,
      types: Seq[String] = AllTypes,
      limit: Int = Listing.UnifiedSearchDefaultLimit): DataFrame = {
    val eff = math.min(math.max(limit, 1), Listing.UnifiedSearchMaxLimit)
    val qt = q.trim
    // top-k FIRST (TakeOrderedAndProject — never a global sort), then the
    // rank window runs over at most n rows
    def ranked(df: DataFrame, ord: Seq[org.apache.spark.sql.Column], n: Int,
        section: String, id: org.apache.spark.sql.Column,
        label: org.apache.spark.sql.Column): DataFrame =
      df.orderBy(ord: _*).limit(n)
        .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
        .select(lit(section).as("section"), col("rank").cast("long").as("rank"),
          id.as("hit_id"), label.as("label"))

    val sections = Seq.newBuilder[DataFrame]
    if (types.contains("documents")) {
      val toks = Search.tokenize(qt)
      val hits =
        if (toks.isEmpty) graft.Store.postings(s, dir).limit(0)
        else graft.Store.postings(s, dir)
          .filter(col("token").isin(toks: _*))
          .groupBy(col("graph_iri"), col("subject_iri"))
          .agg(sum(col("tf")).cast("long").as("score_key"))
      sections += ranked(hits,
        Seq(col("score_key").desc, col("graph_iri"), col("subject_iri")),
        eff, "documents", col("graph_iri"), col("subject_iri"))
    }
    if (types.contains("buckets"))
      sections += ranked(
        Listing.searchBuckets(ObjectTables.buckets(s, dir), qt),
        Seq(col("bucket")), math.min(eff, Listing.UnifiedSearchBucketLimit),
        "buckets", col("bucket"), col("group_id"))
    if (types.contains("groups")) {
      val groups = RdfTables.registry(s, dir).select(col("group_id")).distinct()
      sections += ranked(
        Listing.searchNames(groups, "group_id", qt, limit = eff),
        Seq(col("group_id")), eff, "groups", col("group_id"), col("group_id"))
    }
    if (types.contains("users")) {
      val users = graft.Tables.customer(s, dir)
        .select(col("c_custkey").cast("string").as("user_id"), col("c_name").as("name"))
      sections += ranked(
        Listing.searchNames(users, "name", qt, limit = eff),
        Seq(col("name")), eff, "users", col("user_id"), col("name"))
    }
    sections.result().reduce(_ unionByName _)
  }

  /** The us2 gate's shared case grid: (case, q, types, limit) — exercised
    * identically by the Spark query and the generated oracle SQL. */
  val GateCases: Seq[(String, String, Seq[String], Int)] = Seq(
    ("all_spark", "spark merge", AllTypes, 3), // docs hit; others empty
    ("all_dash0", "-0", AllTypes, 2), // buckets/groups/users hit; doc token "0"
    ("docs_only", "spark merge", Seq("documents"), 1), // section selection
    ("clamp_hi", "00", AllTypes, 500), // users clamp to the unified max 100
    ("clamp_lo", "-0", AllTypes, -5), // clamp floor: 1 per section
    ("short_q", "x", AllTypes, 5)) // groups/users min-chars guard

  /** The whole grid as one frame: (case, section, rank, hit_id, label). */
  def gate(s: SparkSession, dir: String): DataFrame =
    GateCases.map { case (name, q, types, limit) =>
      search(s, dir, q, types, limit)
        .select(lit(name).as("case_name"), col("section"), col("rank"),
          col("hit_id"), col("label"))
    }.reduce(_ unionByName _)
      .orderBy(col("case_name"), col("section"), col("rank"))

  /** DuckDB oracle generated from the SAME grid. Requires the postings and
    * registry CTEs in scope. */
  def oracleSql: String = {
    def sectionSql(name: String, q: String, types: Seq[String], limit: Int): Seq[String] = {
      val eff = math.min(math.max(limit, 1), Listing.UnifiedSearchMaxLimit)
      val qe = q.trim.toLowerCase.replace("'", "''")
      val minOk = q.trim.length >= Listing.MinSearchQueryChars
      val out = Seq.newBuilder[String]
      if (types.contains("documents")) {
        val toks = Search.tokenize(q.trim)
        val in = if (toks.isEmpty) "FALSE"
          else s"token IN (${toks.map(t => s"'$t'").mkString(",")})"
        out += s"""SELECT '$name' AS case_name, 'documents' AS section,
           |  ROW_NUMBER() OVER (ORDER BY score_key DESC, graph_iri, subject_iri) AS rank,
           |  graph_iri AS hit_id, subject_iri AS label
           |FROM (SELECT graph_iri, subject_iri, CAST(SUM(tf) AS BIGINT) AS score_key
           |      FROM postings WHERE $in GROUP BY 1, 2)
           |ORDER BY rank LIMIT $eff""".stripMargin
      }
      if (types.contains("buckets"))
        out += s"""SELECT '$name', 'buckets',
           |  ROW_NUMBER() OVER (ORDER BY bucket), bucket, group_id
           |FROM buckets
           |WHERE contains(lower(bucket), '$qe') AND NOT starts_with(bucket, 'ws-')
           |ORDER BY 3 LIMIT ${math.min(eff, Listing.UnifiedSearchBucketLimit)}""".stripMargin
      if (types.contains("groups"))
        out += (if (!minOk) s"SELECT '$name', 'groups', 0, '', '' WHERE FALSE"
          else s"""SELECT '$name', 'groups',
             |  ROW_NUMBER() OVER (ORDER BY group_id), group_id, group_id
             |FROM (SELECT DISTINCT group_id FROM registry)
             |WHERE contains(lower(group_id), '$qe')
             |ORDER BY 3 LIMIT $eff""".stripMargin)
      if (types.contains("users"))
        out += (if (!minOk) s"SELECT '$name', 'users', 0, '', '' WHERE FALSE"
          else s"""SELECT '$name', 'users',
             |  ROW_NUMBER() OVER (ORDER BY c_name), CAST(c_custkey AS VARCHAR), c_name
             |FROM customer
             |WHERE contains(lower(c_name), '$qe')
             |ORDER BY 3 LIMIT $eff""".stripMargin)
      out.result()
    }
    val cases = GateCases.flatMap((sectionSql _).tupled)
      .map(sql => s"($sql)").mkString("\nUNION ALL ")
    s"""WITH ${graft.fts.Fts.postingsCte},
       |${RdfTables.registryCte},
       |${ObjectTables.bucketsCte}
       |SELECT case_name, section, CAST(rank AS BIGINT) AS rank, hit_id, label FROM (
       |$cases)
       |ORDER BY case_name, section, rank""".stripMargin
  }
}
