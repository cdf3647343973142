package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.sources.JsonLd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** RO-Crate export entity recognition — the `@context` keyword-alias fold
  * in front of [[ExportPlan]] (reference `operations/src/jobs/export.rs`
  * `recognize_entities` `:1086-1181`, `raw_entity_ids` `:1183-1228`,
  * `raw_local_path` `:1230-1247`, `expanded_id` `:1249-1258`, and
  * `jobs/rocrate_jsonld.rs:9-103` `JsonLdKeywords`; semantics pinned by the
  * reference's own tests `recognizes_context_aliases` `export.rs:3026-3056`
  * and `keeps_import_path` `:3058-3079`).
  *
  * A crate's `@context` may alias the JSON-LD keywords (`{"idAlias":
  * "@id"}`, `{"graphItems": "@graph"}`, `{"typeAlias": "@type"}`) or map
  * terms to absolute IRIs (`{"download": "http://schema.org/contentUrl"}`);
  * recognition must honor those aliases in BOTH walks the reference runs:
  *
  *  1. the RAW walk ([[rawEntityIds]]): every JSON object with more than
  *     one key and an id key (a key that IS `@id` or is context-aliased to
  *     it, first such key in document order whose value is a string) is an
  *     entity → `(expanded_id, raw_id, raw_localPath)`. The same expanded
  *     id appearing under two different raw spellings is an "ambiguous
  *     identifiers" error. Ids expand against the fixed JSON-LD base
  *     (`export.rs:57`) when not already absolute.
  *  2. the EXPANDED walk: the reference types entities from the crate's
  *     canonicalized N-Quads; this analog replays the expansion rules the
  *     processor applies — a term's IRI is its context definition when one
  *     exists (a `None`-valued definition DROPS the term), otherwise the
  *     RO-Crate vocabulary default (`File`/`MediaObject` →
  *     `schema:MediaObject`, `localPath` → the w3id ro-terms IRI, any other
  *     bare term → `schema.org/<term>` per [[JsonLd.propertyToIri]]).
  *     Subjects with an rdf:type expanding to `schema:MediaObject`
  *     (http OR https) are File entities; values under predicates
  *     expanding to `schema:contentUrl` / ro-terms `localPath` feed the
  *     content-url and quad-path maps.
  *
  * Per File entity the archive path prefers the raw `localPath` but only
  * when the expanded quads CONFIRM it, else the first quad-level path
  * (`export.rs:1145-1148`) — so a `{"@value": …}`-wrapped path (invisible
  * to the raw walk, a literal in the quads) still resolves. A typed File
  * subject with no raw definition is a permanent failure
  * (`export.rs:1174-1178`). Identity parsing (ARN/w3id/hash ladders) stays
  * [[ExportPlan]]'s input contract.
  *
  * Scale: one distributed flatMap over crate documents — per-crate work is
  * bounded by the manifest size, nothing leaves the row.
  */
object ExportRecognize {

  final class RecognizeError(msg: String) extends RuntimeException(msg)

  val JsonLdBase = "https://craqle.invalid/"                      // export.rs:57
  val SchemaContent = "http://schema.org/contentUrl"              // export.rs:58
  val SchemaContentHttps = "https://schema.org/contentUrl"
  val LocalPathIri = "https://w3id.org/ro/terms#localPath"        // export.rs:70
  val LocalPathHttpIri = "http://w3id.org/ro/terms#localPath"     // export.rs:71
  val MediaIri = "http://schema.org/MediaObject"                  // rocrate_jsonld.rs:6
  val MediaHttpsIri = "https://schema.org/MediaObject"

  private val ContentIris = Set(SchemaContent, SchemaContentHttps)
  private val LocalPathIris = Set(LocalPathIri, LocalPathHttpIri)

  /** RO-Crate vocabulary defaults for @type terms the context leaves bare
    * (the published context maps `File` to `schema:MediaObject`). */
  private def expandTypeTerm(t: String): String = t match {
    case "File" | "MediaObject" => MediaIri
    case other => JsonLd.propertyToIri(other)
  }

  /** `JsonLdKeywords` (rocrate_jsonld.rs:13-103): term → Some(iri) for
    * string defs and `{"@id": iri}` object defs, None for anything else;
    * contexts recurse through arrays. */
  final class Keywords(terms: Map[String, Option[String]]) extends Serializable {
    def isId(key: String): Boolean =
      key == "@id" || terms.get(key).exists(_.contains("@id"))
    def isGraph(key: String): Boolean =
      key == "@graph" || terms.get(key).exists(_.contains("@graph"))
    def isType(key: String): Boolean =
      key == "@type" || terms.get(key).exists(_.contains("@type"))
    def expandsTo(key: String, values: Set[String]): Boolean = terms.get(key) match {
      case Some(Some(iri)) => values.contains(iri)
      case Some(None) => false
      case None => values.contains(key)
    }
    /** Predicate expansion for the quads analog; None = term dropped. */
    def predicateIri(key: String): Option[String] = terms.get(key) match {
      case Some(Some(iri)) => Some(iri)
      case Some(None) => None
      case None =>
        Some(if (key == "localPath") LocalPathIri else JsonLd.propertyToIri(key))
    }
    /** First id-key's string value in document order (object_id,
      * rocrate_jsonld.rs:59-68). */
    def objectId(o: ObjectNode): Option[String] =
      o.properties.asScala.iterator.collectFirst {
        case e if isId(e.getKey) && e.getValue.isTextual => e.getValue.asText
      }
  }

  def keywordsOf(root: JsonNode): Keywords = {
    val terms = mutable.LinkedHashMap.empty[String, Option[String]]
    def collect(ctx: JsonNode): Unit = ctx match {
      case a: ArrayNode => a.elements.asScala.foreach(collect)
      case o: ObjectNode =>
        o.properties.asScala.foreach { e =>
          val iri = e.getValue match {
            case s if s.isTextual => Some(s.asText)
            case d: ObjectNode if d.has("@id") && d.get("@id").isTextual =>
              Some(d.get("@id").asText)
            case _ => None
          }
          terms.update(e.getKey, iri)
        }
      case _ => ()
    }
    Option(root.get("@context")).foreach(collect)
    new Keywords(terms.toMap)
  }

  /** expanded_id (export.rs:1249-1258): absolute ids kept, relative ids
    * joined against [[JsonLdBase]]. */
  def expandedId(id: String): String = {
    val abs =
      try { val u = new java.net.URI(id); u.isAbsolute }
      catch { case _: Exception => false }
    if (abs) id
    else
      try java.net.URI.create(JsonLdBase).resolve(id).toString
      catch { case e: Exception => throw new RecognizeError(e.getMessage) }
  }

  /** raw_entity_ids (export.rs:1183-1228): recursive raw-JSON walk →
    * (expanded, raw_id, raw_localPath) in document order, deduped on the
    * expanded id, erroring on ambiguous raw spellings. */
  def rawEntityIds(root: JsonNode, kw: Keywords): Seq[(String, String, Option[String])] = {
    val out = mutable.ArrayBuffer.empty[(String, String, Option[String])]
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        if (o.size > 1) kw.objectId(o).foreach { id =>
          val expanded = expandedId(id)
          out.find(_._1 == expanded) match {
            case Some((_, existing, _)) if existing != id =>
              throw new RecognizeError(
                s"JSON-LD entity `$expanded` uses ambiguous identifiers")
            case Some(_) => ()
            case None => out += ((expanded, id, rawLocalPath(o, kw)))
          }
        }
        o.properties.asScala.foreach(e => walk(e.getValue))
      case _ => ()
    }
    walk(root)
    out.toSeq
  }

  /** raw_local_path (export.rs:1230-1247): first key expanding to
    * localPath whose value is a string (or an array's first string). */
  private def rawLocalPath(o: ObjectNode, kw: Keywords): Option[String] =
    o.properties.asScala.iterator.flatMap { e =>
      if (!kw.expandsTo(e.getKey, LocalPathIris + "localPath")) None
      else e.getValue match {
        case s if s.isTextual => Some(s.asText)
        case a: ArrayNode => a.elements.asScala.collectFirst {
          case el if el.isTextual => el.asText
        }
        case _ => None
      }
    }.nextOption()

  /** String values a predicate carries into the quads: plain strings,
    * `{"@id": …}` references, `{"@value": …}` literals, arrays thereof. */
  private def quadValues(v: JsonNode): Seq[String] = v match {
    case s if s.isTextual => Seq(s.asText)
    case a: ArrayNode => a.elements.asScala.toSeq.flatMap(quadValues)
    case o: ObjectNode if o.has("@id") && o.get("@id").isTextual &&
        o.size == 1 => Seq(o.get("@id").asText)
    case o: ObjectNode if o.has("@value") && o.get("@value").isTextual =>
      Seq(o.get("@value").asText)
    case _ => Nil
  }

  /** One recognized File entity of a crate. */
  final case class FileEntity(subject: String, entity_id: String,
      local_path: Option[String], content_urls: Seq[String])

  /** recognize_entities (export.rs:1086-1181) over one crate document. */
  def recognizeDocument(json: String): Seq[FileEntity] = {
    val root = new ObjectMapper().readTree(json)
    if (root == null || !root.isObject)
      throw new RecognizeError("payload must be a JSON object")
    val kw = keywordsOf(root)
    val rawIds = rawEntityIds(root, kw)

    // expanded-walk analog of the N-Quads pass: type / contentUrl /
    // localPath triples per named subject
    val files = mutable.LinkedHashSet.empty[String]
    val contentUrls = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
    val quadPaths = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        kw.objectId(o).foreach { id =>
          val subject = expandedId(id)
          o.properties.asScala.foreach { e =>
            val key = e.getKey
            if (kw.isType(key)) {
              val terms = e.getValue match {
                case s if s.isTextual => Seq(s.asText)
                case arr: ArrayNode =>
                  arr.elements.asScala.toSeq.filter(_.isTextual).map(_.asText)
                case _ => Nil
              }
              if (terms.map(expandTypeTerm)
                  .exists(t => t == MediaIri || t == MediaHttpsIri))
                files += subject
            } else if (key != "@context" && !kw.isId(key) && !kw.isGraph(key) &&
                !key.startsWith("@")) {
              kw.predicateIri(key).foreach { pred =>
                if (ContentIris.contains(pred))
                  contentUrls.getOrElseUpdate(subject,
                    mutable.ArrayBuffer.empty) ++= quadValues(e.getValue)
                else if (LocalPathIris.contains(pred))
                  quadPaths.getOrElseUpdate(subject,
                    mutable.ArrayBuffer.empty) ++= quadValues(e.getValue)
              }
            }
          }
        }
        o.properties.asScala.foreach(e => walk(e.getValue))
      case _ => ()
    }
    walk(root)

    val out = rawIds.flatMap { case (subject, rawId, rawPath) =>
      if (!files.remove(subject)) None
      else {
        val paths = quadPaths.get(subject).map(_.toSeq).getOrElse(Nil)
        val localPath = rawPath.filter(paths.contains).orElse(paths.headOption)
        Some(FileEntity(subject, rawId, localPath,
          contentUrls.get(subject).map(_.toSeq).getOrElse(Nil)))
      }
    }
    // export.rs:1174-1178 guard. Under this analog the typed walk and the
    // raw walk share objectId, so a typed subject always has a raw
    // definition and the arm cannot fire; it stays as the reference's
    // safety net should the two walks ever diverge (e.g. a richer
    // expansion that types subjects the raw walk cannot see).
    files.headOption.foreach { subject =>
      throw new RecognizeError(
        s"expanded File entity `$subject` has no raw JSON-LD definition")
    }
    out
  }

  /** Distributed recognition over `(crate_id, jsonld)` rows →
    * `(crate_id, subject, entity_id, local_path, content_url)` — one row
    * per File entity, content_url = the first collected URL. */
  def recognize(crates: DataFrame): DataFrame = {
    val spark = crates.sparkSession
    import spark.implicits._
    crates.select(col("crate_id"), col("jsonld")).as[(Long, String)]
      .flatMap { case (id, json) =>
        recognizeDocument(json).map(f =>
          (id, f.subject, f.entity_id, f.local_path.orNull,
            f.content_urls.headOption.orNull))
      }
      .toDF("crate_id", "subject", "entity_id", "local_path", "content_url")
  }
}
