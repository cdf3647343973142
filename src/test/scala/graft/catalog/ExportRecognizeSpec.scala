package graft.catalog

import graft.SparkSpec

/** Pins [[ExportRecognize]] to the reference's own recognition tests
  * (`export.rs:3026-3079` `recognizes_context_aliases` /
  * `keeps_import_path`) and the two permanent-failure arms. */
class ExportRecognizeSpec extends SparkSpec {

  test("context aliases for @graph/@id/@type and IRI-mapped terms are honored") {
    // recognizes_context_aliases (export.rs:3026-3056) re-expressed: every
    // structural key is an alias; the crate must still recognize one File
    // entity with its local path confirmed by the expanded quads
    val doc =
      """{"@context": [
        |   "https://w3id.org/ro/crate/1.2/context",
        |   {"graphItems": "@graph", "idAlias": "@id", "typeAlias": "@type",
        |    "downloadAlias": "http://schema.org/contentUrl",
        |    "pathAlias": "https://w3id.org/ro/terms#localPath"}],
        | "graphItems": [{
        |   "idAlias": "data/a.txt",
        |   "typeAlias": "File",
        |   "downloadAlias": "https://example.org/download/a",
        |   "pathAlias": "data/a.txt"}]}""".stripMargin
    val ents = ExportRecognize.recognizeDocument(doc)
    assert(ents.size == 1)
    assert(ents.head.subject == "https://craqle.invalid/data/a.txt")
    assert(ents.head.entity_id == "data/a.txt")
    assert(ents.head.local_path.contains("data/a.txt"))
    assert(ents.head.content_urls == Seq("https://example.org/download/a"))
    // the ro-crate context string itself contributes no term definitions
    // (collect_terms only reads object contexts) — "File" typing came from
    // the vocabulary default, not the remote context
  }

  test("keeps_import_path: array localPath prefers the first raw string when confirmed") {
    val doc =
      """{"@graph": [{
        |  "@id": "https://w3id.org/data/1111111111111111111111111111111111111111111111111111111111111111",
        |  "@type": "File",
        |  "localPath": ["data/canonical.txt", "aaa-original.txt"]}]}""".stripMargin
    val ents = ExportRecognize.recognizeDocument(doc)
    assert(ents.size == 1)
    assert(ents.head.local_path.contains("data/canonical.txt"))
  }

  test("raw path not present in the expanded quads falls back to the first quad path") {
    // raw walk sees only the unconfirmed first string; the quads carry a
    // {"@value"} literal invisible to the raw walk → export.rs:1145-1148
    // picks the first QUAD path
    val doc =
      """{"@context": {"rawOnly": "http://example.org/unrelated"},
        | "@graph": [{
        |  "@id": "data/b.txt", "@type": "File",
        |  "localPath": {"@value": "quads/b.txt"}}]}""".stripMargin
    val ents = ExportRecognize.recognizeDocument(doc)
    assert(ents.head.local_path.contains("quads/b.txt"))
  }

  test("a context term mapped to something else is NOT a localPath key") {
    // expands_to: Some(other-iri) → false even though the bare key would
    // have matched (rocrate_jsonld.rs:43-48 Some-branch)
    val doc =
      """{"@context": {"localPath": "http://example.org/notapath"},
        | "@graph": [{
        |  "@id": "data/c.txt", "@type": "File",
        |  "localPath": "data/c.txt"}]}""".stripMargin
    val ents = ExportRecognize.recognizeDocument(doc)
    assert(ents.head.local_path.isEmpty,
      "an overridden localPath term must not resolve a path")
  }

  test("ambiguous raw spellings of one expanded id are a permanent failure") {
    // "data/a.txt" and "./data/a.txt" both expand to the same IRI
    val doc =
      """{"@graph": [
        |  {"@id": "data/a.txt", "@type": "File", "name": "x"},
        |  {"@id": "./data/a.txt", "@type": "File", "name": "y"}]}""".stripMargin
    val e = intercept[ExportRecognize.RecognizeError] {
      ExportRecognize.recognizeDocument(doc)
    }
    assert(e.getMessage.contains("ambiguous identifiers"))
  }

  test("@type values expand through the context ladder before the vocabulary default") {
    // a context that maps `File` elsewhere un-types the entity; a custom
    // term mapped to schema:MediaObject types it (Keywords.typeIri — the
    // same Some(Some)/Some(None)/None ladder as predicate expansion)
    val overridden =
      """{"@context": {"File": "http://example.org/Other"},
        | "@graph": [{"@id": "data/a.txt", "@type": "File", "name": "a"}]}""".stripMargin
    assert(ExportRecognize.recognizeDocument(overridden).isEmpty,
      "context-overridden File must not be recognized")
    val custom =
      """{"@context": {"Blob": "https://schema.org/MediaObject"},
        | "@graph": [{"@id": "data/b.txt", "@type": "Blob", "name": "b"}]}""".stripMargin
    assert(ExportRecognize.recognizeDocument(custom).size == 1,
      "a custom term mapped to schema:MediaObject IS a File")
    val dropped =
      """{"@context": {"File": {"unrelated": true}},
        | "@graph": [{"@id": "data/c.txt", "@type": "File", "name": "c"}]}""".stripMargin
    assert(ExportRecognize.recognizeDocument(dropped).isEmpty,
      "a None-valued term definition drops the type")
  }

  test("two id-aliased keys resolve in sorted-key order (serde_json BTreeMap)") {
    // reference Maps are BTreeMaps: "first matching key" is alphabetical,
    // not document order — `aId` wins over `zId` regardless of position
    val doc =
      """{"@context": {"zId": "@id", "aId": "@id"},
        | "@graph": [{"zId": "data/z.txt", "aId": "data/a.txt", "@type": "File"}]}""".stripMargin
    val ents = ExportRecognize.recognizeDocument(doc)
    assert(ents.map(_.entity_id) == Seq("data/a.txt"))
  }

  test("expandedId normalizes absolute ids like Url::parse → to_string") {
    assert(ExportRecognize.expandedId("HTTP://Ex.COM:80") == "http://ex.com/")
    assert(ExportRecognize.expandedId("https://ex.com:8443/a/./b/../c") ==
      "https://ex.com:8443/a/c")
    assert(ExportRecognize.expandedId("https://ex.com/a b.txt") ==
      "https://ex.com/a%20b.txt")
    // opaque (non-hierarchical) ids keep their body verbatim
    assert(ExportRecognize.expandedId("arn:Example:X") == "arn:Example:X")
    // relative ids join the fixed base, percent-encoding like Url::join
    assert(ExportRecognize.expandedId("data/a b.txt") ==
      "https://craqle.invalid/data/a%20b.txt")
    // already-encoded ids normalize to themselves (% not in the set)
    assert(ExportRecognize.expandedId("data/a%20b.txt") ==
      "https://craqle.invalid/data/a%20b.txt")
  }

  test("expandedId is lenient where the url crate is: brackets, stray %, above-root ..") {
    // chars java.net.URI rejects are kept verbatim (Url::join behavior) —
    // real filenames carry brackets; a resolution must not error
    assert(ExportRecognize.expandedId("data/a[1].txt") ==
      "https://craqle.invalid/data/a[1].txt")
    assert(ExportRecognize.expandedId("data/100%.txt") ==
      "https://craqle.invalid/data/100%.txt")
    // above-root .. pops to the root, never escapes (Url::join)
    assert(ExportRecognize.expandedId("../x") == "https://craqle.invalid/x")
    assert(ExportRecognize.expandedId("a/../../x") ==
      "https://craqle.invalid/x")
    // directory ids keep their trailing slash through dot-segment removal
    assert(ExportRecognize.expandedId("./dir name/") ==
      "https://craqle.invalid/dir%20name/")
    // an absolute id the JDK parser rejects is kept (encoded) rather than
    // failing the crate
    assert(ExportRecognize.expandedId("https://ex.com/a[1].txt") ==
      "https://ex.com/a[1].txt")
    // `data/a:b` is not a scheme — '/' before the first ':'
    assert(ExportRecognize.expandedId("data/a:b.txt") ==
      "https://craqle.invalid/data/a:b.txt")
  }

  test("entity ids appearing only as {'@id'} references are not entities") {
    val doc =
      """{"@graph": [
        |  {"@id": "./", "@type": "Dataset", "about": {"@id": "urn:x:1"}}]}""".stripMargin
    assert(ExportRecognize.recognizeDocument(doc).isEmpty)
  }
}
