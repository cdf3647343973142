package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import graft.catalog.ExportRecognize.{IdCache, Keywords, RecognizeError,
  expandedId, keywordsOf, percentEncodeIdSet, sortedProps}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** RO-Crate import rewrite fold — the import-side twin of
  * [[ExportRecognize]] (reference `operations/src/jobs/import/rewrite.rs`):
  * a submitted crate is validated and id-normalized, its File entities are
  * recognized, and once the referenced bytes are staged every File entity
  * and every reference to it is rewritten to the stable registry targets.
  *
  *  - [[validateDocument]] (`rewrite.rs:63`): parse → percent-encode every
  *    id in place ([[normalizeIds]], `rewrite.rs:166` — normalization MUST
  *    mutate the document itself: an id only a normalized copy makes valid
  *    would be dropped by the JSON-LD parser on the create path, orphaning
  *    everything behind it) → crate validation (the version gate,
  *    `rewrite.rs:483` `rejects_crate_version`) → File-typed subjects from
  *    the expanded form ([[ExportRecognize]]'s quads analog,
  *    `rewrite.rs:109` `file_subjects`) → raw File ids in traversal order,
  *    erroring when one id is defined twice (`rewrite.rs:135`
  *    `collect_file_ids`).
  *  - [[rewriteDocument]] (`rewrite.rs:77`): targets are keyed by their
  *    RESOLVED iri (`rewrite.rs:190` `expanded_targets`, so an entity and
  *    the references to it still meet when they differ in `./` prefix or
  *    percent-encoding); every object whose id resolves to a target gets
  *    the id replaced under whatever alias carried it, and — when the
  *    object is a definition, not a bare `{"@id"}` ref — `localPath` +
  *    `contentUrl` prepended ([[prependValue]], `rewrite.rs:292` — scalar
  *    collisions become two-element arrays, array collisions prepend);
  *    plain STRING occurrences of a target id are never rewritten, only
  *    collected as sorted warnings; keys context-expanding to `localPath`
  *    are skipped entirely; a crate conforming to RO-Crate 1.1 that used
  *    compact `localPath` keys gets the term pinned into its `@context`
  *    ([[ensureLocalContext]], `rewrite.rs:320`); the rewritten bytes are
  *    re-validated before they are returned.
  *
  * The compact-vs-IRI key choice for the prepends follows
  * `JsonLdKeywords::term_matches` (`rocrate_jsonld.rs:51`): an UNDEFINED
  * term is assumed compact-usable; a term the context maps elsewhere forces
  * the absolute-IRI key.
  *
  * The crate-validation analog enforces exactly what the reference's own
  * tests pin: the document must be a JSON object and the crate's
  * `conformsTo` version must be a published RO-Crate version (1.1/1.2) —
  * `unsupported_crate_version` otherwise. The full `craqle` SHACL-style
  * profile (required root-dataset properties etc.) is an external crate the
  * reference does not vendor and its tests do not pin; violations beyond
  * the version gate are out of this analog's scope.
  *
  * Serialization sorts object keys ([[sortedJson]]) because the reference's
  * serde_json `Map` is a BTreeMap — "prepend" is positional only inside
  * array values; key position is always alphabetical.
  *
  * Scale: one distributed flatMap over `(crate_id, jsonld)` rows with the
  * per-crate targets co-grouped on `crate_id` — per-crate work is bounded
  * by the manifest size, nothing leaves the row.
  */
object ImportRewrite {

  /** `CrateValidationError` analog; `code` is stable for the gate verdicts
    * (`invalid` = parse/shape, `unsupported_crate_version` = the craqle
    * violation code the reference test pins, `duplicate_file` = the
    * more-than-once guard the reference folds into `Invalid`). */
  final class CrateError(val code: String, msg: String)
      extends RuntimeException(msg)

  /** RewriteTarget (rewrite.rs:46-51). */
  final case class RewriteTarget(w3id: String, hashW3id: String,
      localPath: String)

  /** ValidatedDocument (rewrite.rs:39-43): the id-normalized document plus
    * its File-entity ids in traversal order. */
  final case class Validated(value: JsonNode, fileIds: Seq[String])

  /** RewriteOutcome (rewrite.rs:53-57): rewritten bytes + sorted warnings
    * (target ids that appeared as plain strings we could not rewrite). */
  final case class RewriteOutcome(jsonld: String, warnings: Seq[String])

  val LocalPathIri: String = ExportRecognize.LocalPathIri
  val SchemaContent: String = ExportRecognize.SchemaContent
  private val SchemaContentHttps = ExportRecognize.SchemaContentHttps
  private val MediaIri = ExportRecognize.MediaIri
  private val MediaHttpsIri = ExportRecognize.MediaHttpsIri
  private val SupportedVersions = Set("1.1", "1.2")
  private val CrateIriPrefix = "https://w3id.org/ro/crate/"

  /** canonical_id (rewrite.rs:186): the ID-set percent-encoding, `Some`
    * only when it changed anything (`%` excluded from the set so an
    * already-encoded id normalizes to itself). */
  def canonicalId(id: String): Option[String] = {
    val canonical = percentEncodeIdSet(id)
    if (canonical != id) Some(canonical) else None
  }

  /** normalize_ids (rewrite.rs:166): percent-encode every id-key string
    * value in place, recursing through the whole document. */
  def normalizeIds(v: JsonNode, kw: Keywords): Unit = v match {
    case a: ArrayNode => a.elements.asScala.foreach(normalizeIds(_, kw))
    case o: ObjectNode =>
      sortedProps(o).foreach { e =>
        if (kw.isId(e.getKey) && e.getValue.isTextual)
          canonicalId(e.getValue.asText)
            .foreach(c => o.set[JsonNode](e.getKey, TextNode.valueOf(c)))
        normalizeIds(e.getValue, kw)
      }
    case _ => ()
  }

  /** validate_document (rewrite.rs:63). */
  def validateDocument(jsonld: String): Validated = {
    val root =
      try new ObjectMapper().readTree(jsonld)
      catch { case e: Exception => throw new CrateError("invalid", e.getMessage) }
    if (root == null || !root.isObject)
      throw new CrateError("invalid", "RO-Crate document must be an object")
    val kw = keywordsOf(root)
    normalizeIds(root, kw)
    validateCrate(root, kw)
    val ids = new IdCache // one resolution memo across both walks
    val subjects = fileSubjects(root, kw, ids)
    Validated(root, collectFileIds(root, subjects, kw, ids))
  }

  /** The version gate of `craqle::validate_rocrate_jsonld` (pinned by
    * `rewrite.rs:483` `rejects_crate_version`): any `conformsTo` reference
    * to `https://w3id.org/ro/crate/<v>` must name a published version. */
  private def validateCrate(root: JsonNode, kw: Keywords): Unit = {
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        Option(o.get("conformsTo")).foreach { c =>
          val refs = c match {
            case arr: ArrayNode => arr.elements.asScala.toSeq
            case other => Seq(other)
          }
          refs.foreach {
            case ref: ObjectNode =>
              kw.objectId(ref).filter(_.startsWith(CrateIriPrefix)).foreach { iri =>
                val version = iri.stripPrefix(CrateIriPrefix).stripSuffix("/")
                if (!SupportedVersions.contains(version))
                  throw new CrateError("unsupported_crate_version",
                    s"RO-Crate version `$version` is not supported")
              }
            case _ => ()
          }
        }
        // @context term DEFINITIONS are not data — a context term named
        // `conformsTo` must not trigger the version gate
        sortedProps(o).foreach(e =>
          if (e.getKey != "@context") walk(e.getValue))
      case _ => ()
    }
    walk(root)
  }

  /** file_subjects (rewrite.rs:109) via the expanded-walk analog: resolved
    * ids of subjects whose `@type` context-expands to `schema:MediaObject`
    * (http or https — `rocrate_jsonld.rs:9` `is_file_type`). */
  private def fileSubjects(root: JsonNode, kw: Keywords,
      ids: IdCache): Set[String] = {
    val subjects = mutable.LinkedHashSet.empty[String]
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        kw.objectId(o).foreach { id =>
          val typed = sortedProps(o).exists { e =>
            kw.isType(e.getKey) && (e.getValue match {
              case s if s.isTextual => Seq(s.asText)
              case arr: ArrayNode =>
                arr.elements.asScala.toSeq.filter(_.isTextual).map(_.asText)
              case _ => Nil
            }).flatMap(kw.typeIri).exists(t => t == MediaIri || t == MediaHttpsIri)
          }
          if (typed) subjects += ids(id)
        }
        sortedProps(o).foreach(e => walk(e.getValue))
      case _ => ()
    }
    walk(root)
    subjects.toSet
  }

  /** collect_file_ids (rewrite.rs:135): raw ids of multi-key objects whose
    * resolved id is a File subject, in traversal order; a second DEFINITION
    * of the same raw id (bare `{"@id"}` refs don't count — single key) is a
    * permanent failure. */
  private def collectFileIds(root: JsonNode, subjects: Set[String],
      kw: Keywords, ids: IdCache): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    def walk(v: JsonNode): Unit = v match {
      case a: ArrayNode => a.elements.asScala.foreach(walk)
      case o: ObjectNode =>
        if (o.size > 1) kw.objectId(o).foreach { id =>
          if (subjects.contains(ids(id))) {
            if (out.contains(id))
              throw new CrateError("duplicate_file",
                s"File entity `$id` is defined more than once")
            out += id
          }
        }
        sortedProps(o).foreach(e => walk(e.getValue))
      case _ => ()
    }
    walk(root)
    out.toSeq
  }

  /** rewrite_document (rewrite.rs:77). `value` is not mutated. */
  def rewriteDocument(value0: JsonNode,
      targets: Map[String, RewriteTarget]): RewriteOutcome =
    rewriteDocumentChecked(value0, targets)._1

  /** [[rewriteDocument]] plus the mandatory re-validation's parsed result
    * (outcome, re-validated document) — spares the caller a re-parse. */
  private[catalog] def rewriteDocumentChecked(value0: JsonNode,
      targets: Map[String, RewriteTarget]): (RewriteOutcome, Validated) = {
    val value = value0.deepCopy[JsonNode]()
    val kw = keywordsOf(value)
    // expanded_targets (rewrite.rs:190): key by resolved IRI
    val ids = new IdCache
    val expanded = targets.map { case (id, t) => ids(id) -> t }
    val compactContent = kw.termMatches("contentUrl",
      Set(SchemaContent, SchemaContentHttps, "schema:contentUrl"))
    val compactPath = kw.termMatches("localPath", Set(LocalPathIri))
    val warnings = mutable.HashSet.empty[String]
    rewriteValue(value, expanded, kw, compactContent, compactPath, warnings,
      ids)
    if (usesV11(value) && compactPath && targets.nonEmpty)
      ensureLocalContext(value)
    val jsonld = sortedJson(value)
    // the emitted bytes must validate unaided; the parsed tree is kept so
    // callers (rewriteSummary) need not parse the same bytes a third time
    val revalidated = validateDocument(jsonld)
    (RewriteOutcome(jsonld, warnings.toSeq.sorted), revalidated)
  }

  /** matching_target (rewrite.rs:203): resolve-then-probe, unparseable ids
    * simply don't match. */
  private def matchingTarget(targets: Map[String, RewriteTarget],
      id: String, ids: IdCache): Option[RewriteTarget] =
    (try Some(ids(id)) catch { case _: RecognizeError => None })
      .flatMap(targets.get)

  private def rewriteValue(v: JsonNode, targets: Map[String, RewriteTarget],
      kw: Keywords, compactContent: Boolean, compactPath: Boolean,
      warnings: mutable.Set[String], ids: IdCache): Unit = v match {
    case a: ArrayNode =>
      a.elements.asScala.foreach { el =>
        if (el.isTextual && matchingTarget(targets, el.asText, ids).isDefined)
          warnings += el.asText
        rewriteValue(el, targets, kw, compactContent, compactPath, warnings,
          ids)
      }
    case o: ObjectNode =>
      kw.objectIdEntry(o)
        .flatMap { case (k, id) => matchingTarget(targets, id, ids).map((k, _)) }
        .foreach { case (idKey, t) =>
          o.set[JsonNode](idKey, TextNode.valueOf(t.w3id)): Unit
          if (o.size > 1) {
            prependValue(o, if (compactPath) "localPath" else LocalPathIri,
              TextNode.valueOf(t.localPath))
            prependValue(o, if (compactContent) "contentUrl" else SchemaContent,
              TextNode.valueOf(t.hashW3id))
          }
        }
      sortedProps(o).foreach { e =>
        val key = e.getKey
        if (!kw.expandsTo(key, Set("localPath", LocalPathIri))) {
          if (!kw.isId(key) && e.getValue.isTextual &&
              matchingTarget(targets, e.getValue.asText, ids).isDefined)
            warnings += e.getValue.asText
          rewriteValue(e.getValue, targets, kw, compactContent, compactPath,
            warnings, ids)
        }
      }
    case _ => ()
  }

  /** prepend_value (rewrite.rs:292): no key → insert; equal scalar → keep;
    * array → prepend unless present; different scalar → `[new, existing]`. */
  private def prependValue(o: ObjectNode, key: String, v: JsonNode): Unit =
    o.remove(key) match {
      case null => o.set[JsonNode](key, v)
      case existing if existing == v => o.set[JsonNode](key, existing)
      case arr: ArrayNode =>
        if (!arr.elements.asScala.contains(v)) arr.insert(0, v)
        o.set[JsonNode](key, arr)
      case existing =>
        val arr = o.arrayNode(); arr.add(v); arr.add(existing)
        o.set[JsonNode](key, arr)
    }

  /** uses_v11 (rewrite.rs:307): the `@context` carries the 1.1 context URL
    * (as the string itself or an array element). */
  private def usesV11(value: JsonNode): Boolean = {
    def contains(v: JsonNode): Boolean = v match {
      case s if s.isTextual => s.asText == "https://w3id.org/ro/crate/1.1/context"
      case a: ArrayNode => a.elements.asScala.exists(contains)
      case _ => false
    }
    Option(value.get("@context")).exists(contains)
  }

  /** ensure_local_context (rewrite.rs:320): pin `{"localPath": <iri>}`
    * into the `@context` so the compact keys the rewrite just wrote stay
    * meaningful under RO-Crate 1.1 (whose published context lacks the
    * term). */
  private def ensureLocalContext(value: JsonNode): Unit = {
    val o = value match {
      case obj: ObjectNode => obj
      case _ => throw new CrateError("invalid",
        "RO-Crate document must be an object")
    }
    def mapping = {
      val m = o.objectNode()
      m.set[JsonNode]("localPath", TextNode.valueOf(LocalPathIri)): Unit
      m
    }
    def hasLocal(v: JsonNode): Boolean =
      v.isObject && Option(v.get("localPath")).exists(n =>
        n.isTextual && n.asText == LocalPathIri)
    o.remove("@context") match {
      case arr: ArrayNode =>
        if (!arr.elements.asScala.exists(hasLocal)) arr.add(mapping)
        o.set[JsonNode]("@context", arr)
      case ctx: ObjectNode =>
        ctx.set[JsonNode]("localPath", TextNode.valueOf(LocalPathIri)): Unit
        o.set[JsonNode]("@context", ctx)
      case null => o.set[JsonNode]("@context", mapping)
      case other =>
        val arr = o.arrayNode(); arr.add(other); arr.add(mapping)
        o.set[JsonNode]("@context", arr)
    }
  }

  /** Serialize with keys sorted — serde_json's BTreeMap order. */
  def sortedJson(v: JsonNode): String = {
    def sort(n: JsonNode): JsonNode = n match {
      case a: ArrayNode =>
        val out = a.arrayNode()
        a.elements.asScala.foreach(el => out.add(sort(el)))
        out
      case o: ObjectNode =>
        val out = o.objectNode()
        sortedProps(o).foreach(e => out.set[JsonNode](e.getKey, sort(e.getValue)): Unit)
        out
      case other => other
    }
    sort(v).toString
  }

  // ------------------------------------------------------------------
  // distributed gate surface

  /** Validation summary over `(crate_id, jsonld)` rows → one row per
    * crate: verdict (`ok` or the [[CrateError]] code), File count and the
    * normalized File ids in traversal order. */
  def validate(crates: DataFrame): DataFrame = {
    val spark = crates.sparkSession
    import spark.implicits._
    crates.select(col("crate_id"), col("jsonld")).as[(Long, String)]
      .map { case (id, json) =>
        try {
          val v = validateDocument(json)
          (id, "ok", v.fileIds.size.toLong, v.fileIds.mkString(","))
        } catch {
          case e: CrateError => (id, e.code, -1L, null: String)
          // defense in depth: an id-resolution error (the reference folds
          // these into Invalid) must stay a per-crate verdict, never abort
          // the job
          case _: RecognizeError => (id, "invalid", -1L, null: String)
        }
      }
      .toDF("crate_id", "verdict", "n_files", "file_ids")
      .withColumn("n_files",
        when(col("verdict") === "ok", col("n_files")).cast("long"))
  }

  /** Full import fold over `(crate_id, jsonld)` with per-crate staged
    * targets `(crate_id, file_id, w3id, hash_w3id, local_path)`: validate →
    * rewrite → re-parse the emitted bytes and extract the fields the gate
    * asserts (root `hasPart` head, the main File entity's rewritten id and
    * prepended localPath/contentUrl under the key flavor the context
    * forces, whether the 1.1 context gained the localPath term, warning
    * count/head). Targets are co-grouped on `crate_id` — the join is the
    * only shuffle and the small side stays with its crate. */
  def rewriteSummary(crates: DataFrame, targets: DataFrame): DataFrame = {
    val spark = crates.sparkSession
    import spark.implicits._
    val grouped = targets.groupBy("crate_id").agg(
      collect_list(struct(col("file_id"), col("w3id"), col("hash_w3id"),
        col("local_path"))).as("targets"))
    crates.join(grouped, Seq("crate_id"), "left_outer")
      .select(col("crate_id"), col("jsonld"), col("targets"))
      .map { row =>
        val id = row.getLong(0)
        val json = row.getString(1)
        val targetMap =
          (if (row.isNullAt(2)) Nil else row.getSeq[Row](2)).map { r =>
            r.getAs[String]("file_id") -> RewriteTarget(r.getAs[String]("w3id"),
              r.getAs[String]("hash_w3id"), r.getAs[String]("local_path"))
          }.toMap
        try {
          val validated = validateDocument(json)
          val (out, revalidated) =
            rewriteDocumentChecked(validated.value, targetMap)
          val s = summarize(out, revalidated.value,
            validated.fileIds.headOption.map(targetMap.get))
          (id, "ok", s._1, s._2, s._3, s._4, s._5, s._6,
            out.warnings.size.toLong, out.warnings.headOption.orNull)
        } catch {
          case e: CrateError =>
            (id, e.code, null: String, null: String, null: String,
              null: String, null: java.lang.Long, null: java.lang.Boolean,
              -1L, null: String)
          case _: RecognizeError => // see validate(): per-crate, never fatal
            (id, "invalid", null: String, null: String, null: String,
              null: String, null: java.lang.Long, null: java.lang.Boolean,
              -1L, null: String)
        }
      }
      .toDF("crate_id", "verdict", "ref_id", "file_id_out", "local_path_out",
        "content_url_out", "n_local_paths", "ctx_local", "n_warnings",
        "first_warning")
      .withColumn("n_warnings",
        when(col("verdict") === "ok", col("n_warnings")).cast("long"))
  }

  /** Gate support: pull the asserted fields back out of the rewritten
    * document (the re-validation's parsed tree — fixture shape: one root
    * `./` Dataset whose `hasPart` head references the main File). */
  private def summarize(out: RewriteOutcome, root: JsonNode,
      mainTarget: Option[Option[RewriteTarget]]): (String, String, String,
      String, java.lang.Long, java.lang.Boolean) = {
    val kw = keywordsOf(root)
    val graph = root match {
      case o: ObjectNode =>
        sortedProps(o).collectFirst {
          case e if kw.isGraph(e.getKey) && e.getValue.isArray =>
            e.getValue.asInstanceOf[ArrayNode]
        }
      case _ => None
    }
    val entities = graph.map(_.elements.asScala.toSeq.collect {
      case o: ObjectNode => o
    }).getOrElse(Nil)
    def entity(id: String): Option[ObjectNode] =
      entities.find(e => kw.objectId(e).contains(id))
    val refId = entity("./")
      .flatMap(r => Option(r.get("hasPart")))
      .flatMap {
        case arr: ArrayNode => arr.elements.asScala.nextOption()
        case one => Some(one)
      }
      .collect { case o: ObjectNode => kw.objectId(o) }.flatten.orNull
    val main = mainTarget.flatten.flatMap(t => entity(t.w3id))
    val compactContent = kw.termMatches("contentUrl",
      Set(SchemaContent, SchemaContentHttps, "schema:contentUrl"))
    val compactPath = kw.termMatches("localPath", Set(LocalPathIri))
    def head(o: ObjectNode, key: String): (Option[String], Option[Long]) =
      Option(o.get(key)) match {
        case Some(a: ArrayNode) =>
          (a.elements.asScala.collectFirst { case t if t.isTextual => t.asText },
            Some(a.size.toLong))
        case Some(t) if t.isTextual => (Some(t.asText), Some(1L))
        case _ => (None, None)
      }
    val (localPath, nLocal) = main
      .map(head(_, if (compactPath) "localPath" else LocalPathIri))
      .getOrElse((None, None))
    val contentUrl = main
      .flatMap(head(_, if (compactContent) "contentUrl" else SchemaContent)._1)
    val ctxLocal: java.lang.Boolean = Option(root.get("@context")).exists {
      case a: ArrayNode => a.elements.asScala.exists(v =>
        v.isObject && Option(v.get("localPath")).exists(n =>
          n.isTextual && n.asText == LocalPathIri))
      case o: ObjectNode => Option(o.get("localPath")).exists(n =>
        n.isTextual && n.asText == LocalPathIri)
      case _ => false
    }
    (refId, main.flatMap(kw.objectId).orNull, localPath.orNull,
      contentUrl.orNull, nLocal.map(Long.box).orNull, ctxLocal)
  }
}
