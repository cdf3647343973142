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
  *     it, first such key in sorted-key order whose value is a string —
  *     the reference's serde_json `Map` is a BTreeMap, so its "first" is
  *     alphabetical) is an entity → `(expanded_id, raw_id, raw_localPath)`.
  *     The same expanded id appearing under two different raw spellings is
  *     an "ambiguous identifiers" error. Ids expand against the fixed
  *     JSON-LD base (`export.rs:57`) when not already absolute, and
  *     absolute ids are URL-normalized the way `Url::parse → to_string`
  *     round-trips them (see [[expandedId]]).
  *  2. the EXPANDED walk: the reference types entities from the crate's
  *     canonicalized N-Quads; this analog replays the expansion rules the
  *     processor applies — a term's IRI is its context definition when one
  *     exists (a `None`-valued definition DROPS the term — the same ladder
  *     for predicates AND `@type` values, [[Keywords.typeIri]]), otherwise
  *     the RO-Crate vocabulary default (`File`/`MediaObject` →
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
    /** @type-value expansion — the same context ladder as [[predicateIri]]
      * (the reference types entities from context-expanded N-Quads, so a
      * `{"File": "http://example.org/Other"}` term definition overrides the
      * vocabulary default and a `None`-valued definition drops the type);
      * the RO-Crate vocabulary default maps `File`/`MediaObject` to
      * `schema:MediaObject` (rocrate_jsonld.rs:6-11). */
    def typeIri(t: String): Option[String] = terms.get(t) match {
      case Some(Some(iri)) => Some(iri)
      case Some(None) => None
      case None =>
        Some(if (t == "File" || t == "MediaObject") MediaIri
             else JsonLd.propertyToIri(t))
    }
    /** term_matches (rocrate_jsonld.rs:51-57) — like [[expandsTo]] but an
      * UNDEFINED term matches (the compact spelling is assumed usable when
      * the context says nothing about it). */
    def termMatches(term: String, values: Set[String]): Boolean =
      terms.get(term) match {
        case Some(Some(iri)) => values.contains(iri)
        case Some(None) => false
        case None => true
      }
    /** First id-key's string value in sorted-key order (object_id,
      * rocrate_jsonld.rs:59-68 — serde_json without preserve_order makes
      * `Map` a BTreeMap, so the reference's "first" is alphabetical). */
    def objectId(o: ObjectNode): Option[String] =
      objectIdEntry(o).map(_._2)
    /** Same, but with the matching key — the import-side rewrite replaces
      * the id in place under whatever alias carried it (rewrite.rs:246). */
    def objectIdEntry(o: ObjectNode): Option[(String, String)] =
      sortedProps(o).collectFirst {
        case e if isId(e.getKey) && e.getValue.isTextual =>
          (e.getKey, e.getValue.asText)
      }
  }

  /** Object entries in sorted-key order — the iteration order of the
    * reference's serde_json `Map` (BTreeMap; Cargo.toml enables only
    * `raw_value`, not `preserve_order`). Sorting is by UTF-16 code unit,
    * which agrees with the reference's UTF-8 byte order for all BMP keys. */
  private[catalog] def sortedProps(o: ObjectNode): Seq[java.util.Map.Entry[String, JsonNode]] = {
    val props = o.properties.asScala.toSeq
    if (props.sizeIs <= 1) props else props.sortBy(_.getKey)
  }

  /** Per-document memo for [[expandedId]] — ids recur across the raw and
    * expanded walks (subject, refs, target probes), and the URL
    * normalization is the fold's hottest allocation site (sf1 profile,
    * round 13). Failures are not cached (they rethrow per call, matching
    * the uncached behavior). */
  final class IdCache extends Serializable {
    private val m = mutable.HashMap.empty[String, String]
    def apply(id: String): String = m.getOrElseUpdate(id, expandedId(id))
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

  /** The ASCII set `url::Url` percent-encodes that a raw identifier may
    * carry literally (rewrite.rs:19-30 ID_ENCODE_SET — C0 controls, DEL,
    * space and `"<>\^`{|}`; `%` excluded so already-encoded ids normalize
    * to themselves). Shared by [[expandedId]] and the import-side
    * [[ImportRewrite.canonicalId]]. */
  def percentEncodeIdSet(id: String): String = {
    val sb = new java.lang.StringBuilder(id.length)
    // percent_encoding always encodes non-ASCII bytes regardless of set
    for (b <- id.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
      val c = b & 0xff
      if (c < 0x20 || c >= 0x7f || " \"<>\\^`{|}".indexOf(c) >= 0)
        sb.append(f"%%$c%02X")
      else sb.append(c.toChar)
    }
    sb.toString
  }

  private val DefaultPorts =
    Map("http" -> 80, "https" -> 443, "ws" -> 80, "wss" -> 443, "ftp" -> 21)

  /** expanded_id (export.rs:1249-1258): absolute ids round-trip through the
    * URL parser (`Url::parse(id).to_string()` — lowercased scheme/host,
    * default port dropped, dot-segments removed, forbidden ASCII
    * percent-encoded, empty path → `/` for special schemes); relative ids
    * join against [[JsonLdBase]] with the RFC 3986 merge +
    * remove-dot-segments fold `Url::join` applies (above-root `..` pops to
    * the root, chars `java.net.URI` rejects — `[`, `]`, stray `%` — are
    * kept verbatim the way the url crate keeps them). An ABSOLUTE id the
    * JDK parser rejects is returned encoded-but-unnormalized rather than
    * erroring (the url crate accepts it; only case normalization is lost).
    * Remaining divergences from `url::Url`, none reachable from
    * crate-shaped ids: IDN hosts are not punycoded and `\` is encoded
    * rather than treated as `/` in special schemes. */
  def expandedId(id: String): String = {
    val encoded = percentEncodeIdSet(id)
    if (hasScheme(encoded)) {
      try normalizeAbsolute(new java.net.URI(encoded))
      catch { case _: Exception => encoded }
    } else if (encoded.startsWith("//")) {
      // protocol-relative: adopt the base's scheme (Url::join)
      val abs = "https:" + encoded
      try normalizeAbsolute(new java.net.URI(abs))
      catch { case _: Exception => abs }
    } else {
      val (path0, trailer) = {
        val hash = encoded.indexOf('#')
        val qm = encoded.indexOf('?')
        val cut = Seq(hash, qm).filter(_ >= 0).minOption.getOrElse(encoded.length)
        (encoded.substring(0, cut), encoded.substring(cut))
      }
      val merged = if (path0.startsWith("/")) path0 else "/" + path0
      JsonLdBase.stripSuffix("/") + removeDotSegments(merged) + trailer
    }
  }

  /** RFC 3986 scheme detection — `data/a:b` is NOT a scheme (the url crate
    * agrees: `/` may not appear before the first `:`). */
  private def hasScheme(s: String): Boolean = {
    val i = s.indexOf(':')
    i > 0 && s.charAt(0).isLetter && (1 until i).forall { j =>
      val c = s.charAt(j)
      c.isLetterOrDigit || c == '+' || c == '-' || c == '.'
    }
  }

  /** RFC 3986 §5.2.4 over an absolute path; above-root `..` is dropped
    * (Url::join's "cannot escape the root" behavior), trailing slashes on
    * directory ids survive. */
  private def removeDotSegments(path: String): String = {
    val out = mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1).drop(1) // leading "" of the absolute path
    val dir = segs.nonEmpty &&
      (segs.last == "" || segs.last == "." || segs.last == "..")
    segs.zipWithIndex.foreach { case (seg, i) =>
      seg match {
        case "." => ()
        case ".." => if (out.nonEmpty) out.remove(out.length - 1): Unit
        case "" if i == segs.length - 1 => () // trailing slash
        case s => out += s // interior empty segments survive (a//b)
      }
    }
    "/" + out.mkString("/") + (if (dir && out.nonEmpty) "/" else "")
  }

  /** `Url::to_string` normalization of one absolute URI (see [[expandedId]]). */
  private def normalizeAbsolute(u0: java.net.URI): String = {
    val scheme = u0.getScheme.toLowerCase(java.util.Locale.ROOT)
    if (u0.isOpaque)
      return scheme + ":" + u0.getRawSchemeSpecificPart +
        Option(u0.getRawFragment).map("#" + _).getOrElse("")
    val u = u0.normalize()
    val sb = new java.lang.StringBuilder(scheme).append(":")
    if (u.getRawAuthority != null) {
      sb.append("//")
      Option(u.getRawUserInfo).foreach(ui => sb.append(ui).append('@'))
      Option(u.getHost) match {
        case Some(h) => sb.append(h.toLowerCase(java.util.Locale.ROOT))
        case None => sb.append(Option(u.getRawAuthority).getOrElse(""))
      }
      if (u.getPort >= 0 && !DefaultPorts.get(scheme).contains(u.getPort))
        sb.append(':').append(u.getPort)
    }
    val path = Option(u.getRawPath).getOrElse("")
    if (path.isEmpty && u.getRawAuthority != null && DefaultPorts.contains(scheme))
      sb.append('/')
    else sb.append(path)
    Option(u.getRawQuery).foreach(q => sb.append('?').append(q))
    Option(u.getRawFragment).foreach(f => sb.append('#').append(f))
    sb.toString
  }

  /** raw_entity_ids (export.rs:1183-1228): recursive raw-JSON walk →
    * (expanded, raw_id, raw_localPath) in traversal order (arrays in
    * element order, object children in sorted-key order — the reference's
    * serde_json `Map` is a BTreeMap), deduped on the expanded id, erroring
    * on ambiguous raw spellings. */
  def rawEntityIds(root: JsonNode, kw: Keywords,
      ids: IdCache = new IdCache): Seq[(String, String, Option[String])] = {
    val out = mutable.ArrayBuffer.empty[(String, String, Option[String])]
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        if (o.size > 1) kw.objectId(o).foreach { id =>
          val expanded = ids(id)
          out.find(_._1 == expanded) match {
            case Some((_, existing, _)) if existing != id =>
              throw new RecognizeError(
                s"JSON-LD entity `$expanded` uses ambiguous identifiers")
            case Some(_) => ()
            case None => out += ((expanded, id, rawLocalPath(o, kw)))
          }
        }
        sortedProps(o).foreach(e => walk(e.getValue))
      case _ => ()
    }
    walk(root)
    out.toSeq
  }

  /** raw_local_path (export.rs:1230-1247): first key (sorted-key order)
    * expanding to localPath whose value is a string (or an array's first
    * string). */
  private def rawLocalPath(o: ObjectNode, kw: Keywords): Option[String] =
    sortedProps(o).iterator.flatMap { e =>
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
    val ids = new IdCache
    val rawIds = rawEntityIds(root, kw, ids)

    // expanded-walk analog of the N-Quads pass: type / contentUrl /
    // localPath triples per named subject
    val files = mutable.LinkedHashSet.empty[String]
    val contentUrls = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
    val quadPaths = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        kw.objectId(o).foreach { id =>
          val subject = ids(id)
          sortedProps(o).foreach { e =>
            val key = e.getKey
            if (kw.isType(key)) {
              val terms = e.getValue match {
                case s if s.isTextual => Seq(s.asText)
                case arr: ArrayNode =>
                  arr.elements.asScala.toSeq.filter(_.isTextual).map(_.asText)
                case _ => Nil
              }
              if (terms.flatMap(kw.typeIri)
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
        sortedProps(o).foreach(e => walk(e.getValue))
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
