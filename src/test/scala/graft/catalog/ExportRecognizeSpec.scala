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

  test("entity ids appearing only as {'@id'} references are not entities") {
    val doc =
      """{"@graph": [
        |  {"@id": "./", "@type": "Dataset", "about": {"@id": "urn:x:1"}}]}""".stripMargin
    assert(ExportRecognize.recognizeDocument(doc).isEmpty)
  }
}
