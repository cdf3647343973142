package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.sparql.{Kind, Term}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** RO-Crate JSON-LD ingest/export (reference `handle.rs:3505-3700` mapping
  * rules; `handle.rs:1853-1906` export):
  *
  * ingest validation:
  *  - `@id` must be a non-empty string; `@type` non-empty (string or array);
  *  - `@graph` is rejected inside single-entity payloads;
  *  - nested plain objects are rejected — only `{"@id": …}` references and
  *    `{"@value": …}` value objects are allowed.
  *
  * value mapping: bool → xsd:boolean literal, number → xsd:integer/decimal
  * literal, string → simple literal, `{"@id"}` → IRI object, `{"@value"}`
  * with `@language`/`@type` → tagged/typed literal; arrays multi-valued.
  *
  * property → IRI: JSON-LD keyword map, CURIE expansion on known prefixes,
  * bare word → `http://schema.org/<word>` (`property_named_node`,
  * `handle.rs:3615-3633`).
  */
object JsonLd {

  final class JsonLdError(msg: String) extends RuntimeException(msg)

  final case class QuadRow(graph_iri: String, subject: String, subject_kind: Int,
      predicate: String, obj_kind: Int, obj_value: String,
      obj_lang: String, obj_datatype: String)

  private val Prefixes = graft.sparql.SparqlParser.CommonPrefixes
  val RdfType: String = graft.sparql.SparqlParser.RdfType

  /** Properties with non-schema.org canonical IRIs (`handle.rs:3615-3633`;
    * dcterms:conformsTo is the backlink-index predicate, `iri_index.rs:28`). */
  private val KnownProperties = Map(
    "conformsTo" -> "http://purl.org/dc/terms/conformsTo")

  def propertyToIri(name: String): String = {
    if (KnownProperties.contains(name)) KnownProperties(name)
    else if (name.startsWith("http://") || name.startsWith("https://")) name
    else if (name.contains(":") && !name.startsWith(":")) {
      val Array(p, l) = name.split(":", 2)
      Prefixes.get(p) match {
        case Some(base) => base + l
        case None => name // unknown CURIE kept verbatim (an IRI-ish token)
      }
    } else "http://schema.org/" + name
  }

  private def termOfValue(v: JsonNode): Seq[Term] = {
    if (v.isBoolean) Seq(Term.typedLit(v.asBoolean.toString, Term.XsdBoolean))
    else if (v.isIntegralNumber) Seq(Term.typedLit(v.asLong.toString, Term.XsdInteger))
    else if (v.isNumber) Seq(Term.typedLit(v.asText, Term.XsdDecimal))
    else if (v.isTextual) Seq(Term.lit(v.asText))
    else if (v.isArray) v.asInstanceOf[ArrayNode].elements.asScala.toSeq.flatMap(termOfValue)
    else if (v.isObject) {
      val o = v.asInstanceOf[ObjectNode]
      if (o.has("@id") && o.size == 1) Seq(Term.iri(o.get("@id").asText))
      else if (o.has("@value")) {
        val base = o.get("@value")
        val lex =
          if (base.isTextual) base.asText
          else if (base.isBoolean) base.asBoolean.toString
          else base.asText
        if (o.has("@language")) Seq(Term.langLit(lex, o.get("@language").asText))
        else if (o.has("@type")) Seq(Term.typedLit(lex, propertyToIri(o.get("@type").asText)))
        else Seq(Term.lit(lex))
      } else throw new JsonLdError("nested objects are not allowed; use {\"@id\": …} references")
    } else if (v.isNull) Nil
    else throw new JsonLdError(s"unsupported JSON value: $v")
  }

  /** One entity object → triples (validation per handle.rs:3505-3611). */
  def entityToTriples(entity: JsonNode, graphIri: String,
      allowGraph: Boolean = false): Seq[QuadRow] = {
    if (!entity.isObject) throw new JsonLdError("entity must be a JSON object")
    val o = entity.asInstanceOf[ObjectNode]
    if (o.has("@graph") && !allowGraph)
      throw new JsonLdError("@graph is not allowed in a single-entity payload")
    val id = Option(o.get("@id")).filter(_.isTextual).map(_.asText).filter(_.nonEmpty)
      .getOrElse(throw new JsonLdError("entity requires a string @id"))
    val types: Seq[String] = Option(o.get("@type")) match {
      case Some(t) if t.isTextual && t.asText.nonEmpty => Seq(t.asText)
      case Some(t) if t.isArray && t.size > 0 =>
        val elems = t.elements.asScala.toSeq
        if (elems.exists(e => !e.isTextual || e.asText.isEmpty))
          throw new JsonLdError("entity @type arrays must contain only non-empty strings")
        elems.map(_.asText)
      case _ => throw new JsonLdError("entity requires a non-empty @type")
    }
    val typeTriples = types.map(t =>
      QuadRow(graphIri, id, Kind.Iri, RdfType, Kind.Iri, propertyToIri(t), "", ""))
    val propTriples = o.properties.asScala.toSeq
      .filterNot(e => e.getKey.startsWith("@"))
      .sortBy(_.getKey)
      .flatMap { e =>
        val pred = propertyToIri(e.getKey)
        termOfValue(e.getValue).map(t =>
          QuadRow(graphIri, id, Kind.Iri, pred, t.kind, t.value, t.lang, t.datatype))
      }
    typeTriples ++ propTriples
  }

  /** A document payload: either a single entity or an RO-Crate `@graph`. */
  def documentToTriples(json: String, graphIri: String): Seq[QuadRow] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    if (root == null || !root.isObject) throw new JsonLdError("payload must be a JSON object")
    if (root.has("@graph")) {
      val g = root.get("@graph")
      if (!g.isArray) throw new JsonLdError("@graph must be an array")
      g.elements.asScala.toSeq.flatMap(entityToTriples(_, graphIri))
    } else entityToTriples(root, graphIri)
  }

  /** Extract the RO-Crate metadata document from an `.eln` archive (a zip
    * whose single top-level folder contains `ro-crate-metadata.json` — the
    * shape of the reference's golden fixtures,
    * `operations/fixtures/eln/` archives). Returns None when absent. */
  def fromElnArchive(bytes: Array[Byte]): Option[String] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst {
          case e if !e.isDirectory &&
              (e.getName == "ro-crate-metadata.json" ||
                e.getName.endsWith("/ro-crate-metadata.json")) =>
            new String(zin.readAllBytes(), "UTF-8")
        }
    } finally zin.close()
  }

  /** Ingest a DataFrame of (graph_iri, eln_bytes) — archive extraction +
    * JSON-LD mapping in one pass (the import driver shape,
    * `operations/tests/rocrate_drivers.rs`). */
  def ingestEln(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("graph_iri"), col("eln_bytes")).as[(String, Array[Byte])]
      .flatMap { case (g, b) =>
        fromElnArchive(b).toSeq.flatMap(documentToTriples(_, g))
      }
      .toDF()
  }

  /** Ingest a DataFrame of (graph_iri, jsonld) into quads rows. Malformed
    * documents fail the task (the reference rejects at the API boundary) —
    * pre-validate with [[validate]] for a permissive pipeline. */
  def ingest(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("graph_iri"), col("jsonld")).as[(String, String)]
      .flatMap { case (g, j) => documentToTriples(j, g) }
      .toDF()
  }

  /** (graph_iri, jsonld, error) — error non-null for rejected payloads. */
  def validate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("graph_iri"), col("jsonld")).as[(String, String)]
      .map { case (g, j) =>
        val err = try { documentToTriples(j, g); null: String }
        catch { case e: Exception => e.getMessage }
        (g, j, err)
      }
      .toDF("graph_iri", "jsonld", "error")
  }

  /** Export a graph back to an RO-Crate `@graph` JSON-LD string, entities
    * sorted by subject and predicates sorted for determinism. Returns
    * (graph_iri, jsonld, total_data_entities) — the paged export contract
    * (`core/src/metadata.rs:658-665`) adds offset slicing over entities. */
  def exportGraphs(quads: DataFrame, offset: Int = 0, limit: Int = 100): DataFrame = {
    val spark = quads.sparkSession
    import spark.implicits._
    val clamped = math.max(1, math.min(limit, 1000)) // reference default 100, clamp 1..=1000
    val off = math.max(0, offset)
    quads
      .select(col("graph_iri"), col("subject"), col("predicate"),
        col("obj_kind"), col("obj_value"), col("obj_lang"), col("obj_datatype"))
      .as[(String, String, String, Int, String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (graph, rows) =>
        val mapper = new ObjectMapper()
        val bySubject = rows.toSeq.groupBy(_._2).toSeq.sortBy(_._1)
        val total = bySubject.size
        val page = bySubject.slice(off, off + clamped)
        val arr = mapper.createArrayNode()
        page.foreach { case (subject, triples) =>
          val ent = mapper.createObjectNode()
          ent.put("@id", subject)
          triples.sortBy(t => (t._3, t._5)).foreach {
            case (_, _, pred, kind, value, lang, dt) =>
              val key =
                if (pred == RdfType) "@type"
                else if (pred.startsWith("http://schema.org/")) pred.stripPrefix("http://schema.org/")
                else pred
              val node: JsonNode =
                if (pred == RdfType || kind == Kind.Iri) {
                  if (pred == RdfType) mapper.getNodeFactory.textNode(value.stripPrefix("http://schema.org/"))
                  else mapper.createObjectNode().put("@id", value)
                } else if (lang.nonEmpty)
                  mapper.createObjectNode().put("@value", value).put("@language", lang)
                else if (dt.nonEmpty)
                  mapper.createObjectNode().put("@value", value).put("@type", dt)
                else mapper.getNodeFactory.textNode(value)
              if (ent.has(key)) {
                ent.get(key) match {
                  case a: ArrayNode => a.add(node); ()
                  case prev =>
                    ent.set[JsonNode](key, mapper.createArrayNode().add(prev).add(node)); ()
                }
              } else { ent.set[JsonNode](key, node); () }
          }
          arr.add(ent)
        }
        val root = mapper.createObjectNode()
        root.set[JsonNode]("@graph", arr)
        (graph, mapper.writeValueAsString(root), total.toLong)
      }
      .toDF("graph_iri", "jsonld", "total_data_entities")
  }
}
