package graft.sparql

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of the aruna-shaped RDF tables (FIXTURES.md §1)
  * from the driver's `documents` parquet, with the exact-equivalent DuckDB
  * CTE so oracles can rebuild the same rows.
  *
  * Shape follows the reference's canonical test fixtures
  * (`operations/tests/metadata_query_concurrency.rs:177`): entities typed
  * schema:Dataset / schema:File carrying schema:name / description /
  * keywords / identifier / contentSize literals plus a dcterms:conformsTo
  * IRI (the backlink-index predicate, `iri_index.rs:28`) and a second
  * `person` entity per graph to exercise cross-subject BGP joins.
  */
object RdfTables {

  val SchemaNs = "http://schema.org/"
  val RdfType = SparqlParser.RdfType
  val ConformsTo = "http://purl.org/dc/terms/conformsTo"

  /** quads(graph_iri, subject, subject_kind, predicate, obj_kind, obj_value,
    * obj_lang, obj_datatype) — one named graph per document.
    *
    * Built as ONE documents scan + per-row explode of up to 10 triples
    * (a 10-way union of scans would read the source ten times — at 100 TB
    * that difference is the whole game). Row set is identical to
    * [[quadsCte]].
    */
  def quads(spark: SparkSession, dir: String): DataFrame =
    quadsOfDocs(Tables.documents(spark, dir))

  /** [[quads]] over an explicit documents-shaped frame (doc_id, source,
    * text, lang, n_chars) — the incremental projector re-derives a mutated
    * document's graph through this same function, so streaming upserts and
    * the batch build can never diverge. */
  def quadsOfDocs(d: DataFrame): DataFrame = {
    val g = concat(lit("graph:"), col("doc_id").cast("string"))
    val s = concat(lit("doc:"), col("doc_id").cast("string"))
    val person = concat(lit("person:"), (col("doc_id") % 20).cast("string"))
    def row(subj: org.apache.spark.sql.Column, pred: String,
        kind: Int, v: org.apache.spark.sql.Column,
        lang: org.apache.spark.sql.Column = lit(""),
        dt: org.apache.spark.sql.Column = lit("")): org.apache.spark.sql.Column =
      struct(subj.as("subject"), lit(pred).as("predicate"),
        lit(kind).as("obj_kind"), v.as("obj_value"),
        lang.as("obj_lang"), dt.as("obj_datatype"))
    val triples = array(
      row(s, RdfType, Kind.Iri,
        when(col("doc_id") % 3 === 0, lit(SchemaNs + "Dataset"))
          .otherwise(lit(SchemaNs + "File"))),
      row(s, SchemaNs + "name", Kind.Literal,
        concat(col("source"), lit("-doc-"), col("doc_id").cast("string"))),
      row(s, SchemaNs + "description", Kind.Literal, col("text"), col("lang")),
      row(s, SchemaNs + "identifier", Kind.Literal, col("doc_id").cast("string")),
      row(s, SchemaNs + "contentSize", Kind.Literal,
        col("n_chars").cast("string"), lit(""), lit(Term.XsdInteger)),
      row(s, SchemaNs + "inLanguage", Kind.Literal, col("lang")),
      when(col("doc_id") % 5 === 0,
        row(s, SchemaNs + "keywords", Kind.Literal,
          concat(lit("kw-"), (col("doc_id") % 7).cast("string")))),
      when(col("doc_id") % 2 === 0,
        row(s, ConformsTo, Kind.Iri,
          concat(lit("https://w3id.org/ro/crate/"), (col("doc_id") % 4).cast("string")))),
      row(s, SchemaNs + "author", Kind.Iri, person),
      row(person, SchemaNs + "name", Kind.Literal,
        concat(lit("author-"), (col("doc_id") % 20).cast("string"))),
      // knows ring over the 20 person entities (property-path test graph)
      row(person, SchemaNs + "knows", Kind.Iri,
        concat(lit("person:"), ((col("doc_id") + 1) % 20).cast("string"))))
    d.select(g.as("graph_iri"),
        explode(filter(triples, t => t.isNotNull)).as("t"))
      .select(col("graph_iri"), col("t.subject").as("subject"),
        lit(0).as("subject_kind"), col("t.predicate").as("predicate"),
        col("t.obj_kind").as("obj_kind"), col("t.obj_value").as("obj_value"),
        col("t.obj_lang").as("obj_lang"), col("t.obj_datatype").as("obj_datatype"))
  }

  /** DuckDB CTE body equivalent to [[quads]] (reference it as `quads`). */
  val quadsCte: String = quadsCteFrom("documents")

  /** [[quadsCte]] over any documents-shaped relation (the ev15/ev16
    * incremental-projection oracles rebuild quads from a mutated `docs2`). */
  def quadsCteFrom(table: String): String = {
    def sel(subj: String, pred: String, kind: Int, v: String,
        lang: String = "''", dt: String = "''", where: String = ""): String =
      s"SELECT 'graph:'||doc_id AS graph_iri, $subj AS subject, 0 AS subject_kind, " +
        s"'$pred' AS predicate, $kind AS obj_kind, $v AS obj_value, " +
        s"$lang AS obj_lang, $dt AS obj_datatype FROM $table" +
        (if (where.nonEmpty) s" WHERE $where" else "")
    val doc = "'doc:'||doc_id"
    val person = "'person:'||(doc_id%20)"
    Seq(
      sel(doc, RdfType, Kind.Iri,
        "CASE WHEN doc_id%3=0 THEN 'http://schema.org/Dataset' ELSE 'http://schema.org/File' END"),
      sel(doc, SchemaNs + "name", Kind.Literal, "source||'-doc-'||doc_id"),
      sel(doc, SchemaNs + "description", Kind.Literal, "text", "lang"),
      sel(doc, SchemaNs + "identifier", Kind.Literal, "CAST(doc_id AS VARCHAR)"),
      sel(doc, SchemaNs + "contentSize", Kind.Literal, "CAST(n_chars AS VARCHAR)",
        "''", s"'${Term.XsdInteger}'"),
      sel(doc, SchemaNs + "inLanguage", Kind.Literal, "lang"),
      sel(doc, SchemaNs + "keywords", Kind.Literal, "'kw-'||(doc_id%7)", where = "doc_id%5=0"),
      sel(doc, ConformsTo, Kind.Iri, "'https://w3id.org/ro/crate/'||(doc_id%4)",
        where = "doc_id%2=0"),
      sel(doc, SchemaNs + "author", Kind.Iri, person),
      sel(person, SchemaNs + "name", Kind.Literal, "'author-'||(doc_id%20)"),
      sel(person, SchemaNs + "knows", Kind.Iri, "'person:'||((doc_id+1)%20)"))
      .mkString("quads AS (\n", "\nUNION ALL ", "\n)")
  }

  /** registry(graph_iri, document_id, group_id, document_path, public,
    * created_at_ms, deleted) — visibility matrix source
    * (`metadata_query_concurrency.rs:632-664`: public/private/deleted). */
  def registry(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      concat(lit("graph:"), col("doc_id").cast("string")).as("graph_iri"),
      col("doc_id").cast("string").as("document_id"),
      concat(lit("grp-"), (col("doc_id") % 10).cast("string")).as("group_id"),
      concat(lit("/"), col("source"), lit("/doc-"), col("doc_id").cast("string")).as("document_path"),
      (col("doc_id") % 2 === 0).as("public"),
      (lit(1700000000000L) + col("doc_id") * 1000).as("created_at_ms"),
      (col("doc_id") % 97 === 0).as("deleted"))

  val registryCte: String =
    """registry AS (
      |  SELECT 'graph:'||doc_id AS graph_iri, CAST(doc_id AS VARCHAR) AS document_id,
      |         'grp-'||(doc_id%10) AS group_id,
      |         '/'||source||'/doc-'||doc_id AS document_path,
      |         doc_id%2=0 AS public,
      |         1700000000000 + doc_id*1000 AS created_at_ms,
      |         doc_id%97=0 AS deleted
      |  FROM documents
      |)""".stripMargin

  /** Graphs visible to a caller: `anonymous` sees public+live; `member:<grp>`
    * additionally sees that group's private docs (reference scope rules,
    * `handle.rs:4675-4698`). */
  def visibleGraphs(spark: SparkSession, dir: String, caller: String): DataFrame = {
    val r = registry(spark, dir).filter(!col("deleted"))
    caller match {
      case "anonymous" => r.filter(col("public")).select("graph_iri")
      case m if m.startsWith("member:") =>
        val grp = m.stripPrefix("member:")
        r.filter(col("public") || col("group_id") === grp).select("graph_iri")
      case other => throw new IllegalArgumentException(s"unknown caller $other")
    }
  }
}
