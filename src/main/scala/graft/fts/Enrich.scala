package graft.fts

import graft.sparql.{Kind, RdfTables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Hit enrichment (reference `search_enrichment.rs`):
  *
  *  - `hit_title` (`:14-38`): schema:name literal, else last path segment of
  *    the subject IRI, else the document path.
  *  - `hit_snippet` (`:42-75`): concat name/description/keywords/identifier
  *    literals, window around the first matching query token, else prefix,
  *    capped length.
  */
object Enrich {

  val SnippetMaxLen = 160
  val SnippetLead = 40

  /** (graph_iri, subject_iri, content) — the describe-join input: all indexed
    * literal values of each subject, deterministically ordered by field. */
  def describe(quads: DataFrame): DataFrame = {
    val fieldRank = Fts.IndexedFields.values.toSeq.sorted.zipWithIndex.toMap
    val rank = Fts.IndexedFields.foldLeft(lit(99)) { case (acc, (iri, name)) =>
      when(col("predicate") === iri, lit(fieldRank(name))).otherwise(acc)
    }
    quads
      .filter(col("obj_kind") === Kind.Literal &&
        col("predicate").isin(Fts.IndexedFields.keys.toSeq: _*))
      .select(col("graph_iri"), col("subject").as("subject_iri"),
        struct(rank.as("r"), col("obj_value").as("v")).as("rv"))
      .groupBy(col("graph_iri"), col("subject_iri"))
      .agg(array_join(transform(array_sort(collect_list(col("rv"))), _.getField("v")), " ")
        .as("content"))
  }

  /** (graph_iri, subject_iri, title) per hit_title precedence. `registry`
    * supplies the document-path fallback. */
  def titles(quads: DataFrame, registry: DataFrame): DataFrame = {
    val names = quads
      .filter(col("predicate") === RdfTables.SchemaNs + "name" &&
        col("obj_kind") === Kind.Literal)
      .groupBy(col("graph_iri"), col("subject").as("subject_iri"))
      .agg(min(col("obj_value")).as("name"))
    val subjects = quads
      .select(col("graph_iri"), col("subject").as("subject_iri")).distinct()
    subjects
      .join(names, Seq("graph_iri", "subject_iri"), "left_outer")
      // 1:1 PER (graph_iri, subject_iri) is load-bearing (r14 ADVICE): the
      // fts3 page-then-enrich commute (FtsQueries) only holds because these
      // enrich joins never inflate the hit count. `names` is grouped above;
      // `registry` carries ONE row per graph_iri by fixture contract
      // (RdfTables.registry derives it 1:1 from documents) — a future
      // registry with duplicate graph_iri rows would inflate a paged hit
      // past its LIMIT, so that contract must hold (deduping here would add
      // an exchange to every enrich for a case that cannot occur).
      .join(registry.select(col("graph_iri"), col("document_path")), Seq("graph_iri"), "left_outer")
      .withColumn("title", coalesce(
        col("name"),
        nullif(regexp_extract(col("subject_iri"), "([^/#:]+)$", 1), lit("")),
        col("document_path")))
      .select("graph_iri", "subject_iri", "title")
  }

  /** Snippet: window around the first query-token occurrence, else prefix. */
  val snippetUdf: UserDefinedFunction = udf { (content: String, tokens: Seq[String]) =>
    if (content == null) null
    else {
      val lower = content.toLowerCase
      val idx = tokens.iterator.map(lower.indexOf(_)).filter(_ >= 0)
        .foldLeft(Int.MaxValue)(math.min)
      val s =
        if (idx == Int.MaxValue) content.take(SnippetMaxLen)
        else {
          val start = math.max(0, idx - SnippetLead)
          content.substring(start, math.min(content.length, start + SnippetMaxLen))
        }
      s
    }
  }

  /** Join hits with titles + snippets (the describe-join at
    * `handle.rs:5286-5292`).
    *
    * The hit set is a page (≤ 1000 rows by the search clamps), so it is
    * broadcast and quads/registry are SEMI-JOINED down to hit subjects
    * BEFORE the title/describe aggregations — enrichment work is
    * O(quads-of-hit-subjects), not O(corpus). At 100 TB the alternative
    * (aggregate everything, join last) scans and shuffles the whole store
    * to decorate 50 rows. */
  def enrich(hits: DataFrame, quads: DataFrame, registry: DataFrame,
      query: String): DataFrame = {
    val toks = Search.tokenize(query)
    // the hit page is tiny (≤ 1000 rows by the search clamps) but its
    // lineage is the whole search pipeline — materialize it ONCE so the
    // two broadcast scopes + the final join don't re-run the search 3×
    val hitPage = hits.localCheckpoint(true)
    val hitKeys = hitPage.select(col("graph_iri"), col("subject_iri")).distinct()
    val scopedQuads = quads.join(
      broadcast(hitKeys.withColumnRenamed("subject_iri", "subject")),
      Seq("graph_iri", "subject"), "left_semi")
    val scopedRegistry = registry.join(
      broadcast(hitKeys.select(col("graph_iri")).distinct()),
      Seq("graph_iri"), "left_semi")
    // titles/describe emit ≤ one row per hit subject (bounded by the same
    // clamps as the page) — hint them broadcast; the static planner cannot
    // see through the aggregation and falls back to a sort-merge join
    hitPage
      .join(broadcast(titles(scopedQuads, scopedRegistry)),
        Seq("graph_iri", "subject_iri"), "left_outer")
      .join(broadcast(describe(scopedQuads)), Seq("graph_iri", "subject_iri"), "left_outer")
      .withColumn("snippet", snippetUdf(col("content"), lit(toks.toArray)))
      .drop("content")
  }
}
