package graft.catalog

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.SparkSpec
import graft.catalog.ImportRewrite._

/** Pins [[ImportRewrite]] to the reference's own unit tests
  * (`operations/src/jobs/import/rewrite.rs:423-608`): finds_file_types,
  * finds_keyword_aliases, rejects_crate_version, matches_mixed_ids,
  * encodes_nested_ids, rewrite_updates_refs — plus the prepend_value merge
  * arms. */
class ImportRewriteSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  // crate_json (rewrite.rs:426-456)
  private def crateJson(version: String): String =
    s"""{
       | "@context": "https://w3id.org/ro/crate/$version/context",
       | "@graph": [
       |   {"@id": "ro-crate-metadata.json", "@type": "CreativeWork",
       |    "about": {"@id": "./"},
       |    "conformsTo": {"@id": "https://w3id.org/ro/crate/$version"}},
       |   {"@id": "./", "@type": "Dataset", "name": "test",
       |    "description": "test crate", "datePublished": "2026-07-23",
       |    "hasPart": {"@id": "data/a.txt"}},
       |   {"@id": "data/a.txt", "@type": "File", "name": "a"}
       | ]}""".stripMargin

  private def target(name: String): RewriteTarget =
    RewriteTarget(s"https://w3id.org/aruna/data/arn:$name",
      "https://w3id.org/aruna/data/" + "a" * 64, s"data/$name")

  test("finds_file_types: the typed File entity is collected, refs are not") {
    val validated = validateDocument(crateJson("1.2"))
    assert(validated.fileIds == Seq("data/a.txt"))
  }

  test("finds_keyword_aliases: @graph/@id aliases carry through rewrite") {
    // rewrite.rs:459-510 — every structural key is context-aliased; the
    // rewrite must replace both the entity id and the hasPart reference
    // under the alias key
    val doc =
      """{
        | "@context": [
        |   "https://w3id.org/ro/crate/1.2/context",
        |   {"graphItems": "@graph", "idAlias": "@id"}],
        | "graphItems": [
        |   {"idAlias": "ro-crate-metadata.json", "@type": "CreativeWork",
        |    "about": {"idAlias": "./"},
        |    "conformsTo": {"idAlias": "https://w3id.org/ro/crate/1.2"}},
        |   {"idAlias": "./", "@type": "Dataset", "name": "test",
        |    "description": "test crate", "datePublished": "2026-07-23",
        |    "hasPart": {"idAlias": "data/a.txt"}},
        |   {"idAlias": "data/a.txt", "@type": "File", "name": "a"}
        | ]}""".stripMargin
    val validated = validateDocument(doc)
    assert(validated.fileIds == Seq("data/a.txt"))
    val out = rewriteDocument(validated.value,
      Map("data/a.txt" -> target("example")))
    val value = mapper.readTree(out.jsonld)
    val graph = value.get("graphItems").asInstanceOf[ArrayNode]
    assert(graph.get(1).get("hasPart").get("idAlias").asText ==
      "https://w3id.org/aruna/data/arn:example")
    assert(graph.get(2).get("idAlias").asText ==
      "https://w3id.org/aruna/data/arn:example")
  }

  test("rejects_crate_version: conformsTo 9.9 is unsupported_crate_version") {
    val doc = mapper.readTree(crateJson("1.2")).asInstanceOf[ObjectNode]
    doc.get("@graph").get(0).asInstanceOf[ObjectNode]
      .set("conformsTo", mapper.readTree(
        """{"@id": "https://w3id.org/ro/crate/9.9"}"""))
    val e = intercept[CrateError] { validateDocument(doc.toString) }
    assert(e.code == "unsupported_crate_version")
  }

  test("matches_mixed_ids: encoded and literal spellings meet on the resolved iri") {
    // rewrite.rs:520-566 — one entity is encoded and referenced literally,
    // the other reversed; normalize_ids makes both spellings canonical and
    // expanded_targets matches them
    val doc =
      """{
        | "@context": "https://w3id.org/ro/crate/1.2/context",
        | "@graph": [
        |   {"@id": "ro-crate-metadata.json", "@type": "CreativeWork",
        |    "about": {"@id": "./"},
        |    "conformsTo": {"@id": "https://w3id.org/ro/crate/1.2"}},
        |   {"@id": "./", "@type": "Dataset", "name": "test",
        |    "description": "test crate", "datePublished": "2026-07-27",
        |    "hasPart": [{"@id": "./data/a%20b.txt"}, {"@id": "./data/c d.txt"}]},
        |   {"@id": "./data/a b.txt", "@type": "File", "name": "a"},
        |   {"@id": "./data/c%20d.txt", "@type": "File", "name": "c"}
        | ]}""".stripMargin
    val validated = validateDocument(doc)
    assert(validated.fileIds ==
      Seq("./data/a%20b.txt", "./data/c%20d.txt"))
    val out = rewriteDocument(validated.value, Map(
      "./data/a%20b.txt" -> target("a"), "./data/c%20d.txt" -> target("c")))
    val value = mapper.readTree(out.jsonld)
    val hasPart = value.get("@graph").get(1).get("hasPart")
    assert(hasPart.get(0).get("@id").asText ==
      "https://w3id.org/aruna/data/arn:a")
    assert(hasPart.get(1).get("@id").asText ==
      "https://w3id.org/aruna/data/arn:c")
  }

  test("encodes_nested_ids: a folder id needing encoding survives as written") {
    // rewrite.rs:568-606
    val folder = "./Demo - Experiment - abc123/"
    val doc =
      s"""{
         | "@context": "https://w3id.org/ro/crate/1.2/context",
         | "@graph": [
         |   {"@id": "ro-crate-metadata.json", "@type": "CreativeWork",
         |    "about": {"@id": "./"},
         |    "conformsTo": {"@id": "https://w3id.org/ro/crate/1.2"}},
         |   {"@id": "./", "@type": "Dataset", "name": "test",
         |    "description": "test crate", "datePublished": "2026-07-27",
         |    "hasPart": [{"@id": "$folder"}, {"@id": "./ -  - bb8b469d/"}]},
         |   {"@id": "$folder", "@type": "Dataset", "name": "folder",
         |    "hasPart": {"@id": "${folder}example.txt"}},
         |   {"@id": "./ -  - bb8b469d/", "@type": "Dataset", "name": "empty"},
         |   {"@id": "${folder}example.txt", "@type": "File", "name": "example"}
         | ]}""".stripMargin
    val validated = validateDocument(doc)
    val fileId = "./Demo%20-%20Experiment%20-%20abc123/example.txt"
    assert(validated.fileIds == Seq(fileId))
    val out = rewriteDocument(validated.value, Map(fileId -> target("example")))
    val value = mapper.readTree(out.jsonld)
    assert(value.get("@graph").get(2).get("@id").asText ==
      "./Demo%20-%20Experiment%20-%20abc123/")
    assert(value.get("@graph").get(3).get("@id").asText ==
      "./%20-%20%20-%20bb8b469d/")
    // the emitted bytes must validate unaided (the create path normalizes
    // nothing) — rewriteDocument already re-validates, assert it directly
    validateDocument(out.jsonld)
  }

  test("rewrite_updates_refs: v1.1 crate gains localPath + context mapping") {
    // rewrite.rs:608-? — the 1.1 context lacks the localPath term, so the
    // rewrite must pin {"localPath": <iri>} into @context
    val validated = validateDocument(crateJson("1.1"))
    val out = rewriteDocument(validated.value,
      Map("data/a.txt" -> target("example")))
    assert(out.warnings.isEmpty)
    val value = mapper.readTree(out.jsonld)
    assert(value.get("@graph").get(1).get("hasPart").get("@id").asText ==
      "https://w3id.org/aruna/data/arn:example")
    assert(value.get("@graph").get(2).get("localPath").asText ==
      "data/example")
    val ctx = value.get("@context").asInstanceOf[ArrayNode]
    import scala.jdk.CollectionConverters._
    assert(ctx.elements.asScala.exists(v => v.isObject &&
      Option(v.get("localPath")).exists(_.asText == LocalPathIri)))
  }

  test("a v1.2 crate does not get the context mapping (its context has the term)") {
    val validated = validateDocument(crateJson("1.2"))
    val out = rewriteDocument(validated.value,
      Map("data/a.txt" -> target("example")))
    val value = mapper.readTree(out.jsonld)
    assert(value.get("@context").isTextual,
      "@context must stay the bare 1.2 string")
  }

  test("a context term named conformsTo never triggers the version gate") {
    // @context term definitions are not data: {"conformsTo": {"@id": ...}}
    // in the context is an alias table entry, not a conformance claim
    val doc = mapper.readTree(crateJson("1.2")).asInstanceOf[ObjectNode]
    doc.set("@context", mapper.readTree(
      """["https://w3id.org/ro/crate/1.2/context",
        | {"conformsTo": {"@id": "https://w3id.org/ro/crate/0.9"}}]""".stripMargin))
    validateDocument(doc.toString) // must not throw
  }

  test("ids the JDK URI parser rejects stay per-crate data, not failures") {
    // brackets / stray % resolve leniently (Url::join keeps them verbatim)
    val doc = mapper.readTree(crateJson("1.2")).asInstanceOf[ObjectNode]
    doc.get("@graph").get(2).asInstanceOf[ObjectNode]
      .put("@id", "data/a[1] 100%.txt")
    doc.get("@graph").get(1).asInstanceOf[ObjectNode]
      .set("hasPart", mapper.readTree("""{"@id": "data/a[1]%20100%.txt"}"""))
    val v = validateDocument(doc.toString)
    assert(v.fileIds == Seq("data/a[1]%20100%.txt"))
    val out = rewriteDocument(v.value,
      Map("data/a[1]%20100%.txt" -> target("br")))
    val value = mapper.readTree(out.jsonld)
    assert(value.get("@graph").get(1).get("hasPart").get("@id").asText ==
      "https://w3id.org/aruna/data/arn:br")
  }

  test("duplicate File definitions are a permanent failure") {
    val doc = mapper.readTree(crateJson("1.2")).asInstanceOf[ObjectNode]
    doc.get("@graph").asInstanceOf[ArrayNode].add(mapper.readTree(
      """{"@id": "data/a.txt", "@type": "File", "name": "dup"}"""))
    val e = intercept[CrateError] { validateDocument(doc.toString) }
    assert(e.code == "duplicate_file")
    assert(e.getMessage.contains("defined more than once"))
  }

  test("prepend_value merge arms: equal keeps, array prepends, scalar pairs") {
    // existing localPath equal to the target's → kept as the scalar
    val equal = validateDocument(crateJson("1.2")).value
      .asInstanceOf[ObjectNode]
    equal.get("@graph").get(2).asInstanceOf[ObjectNode]
      .put("localPath", "data/example")
    val outEq = rewriteDocument(equal, Map("data/a.txt" -> target("example")))
    val fEq = mapper.readTree(outEq.jsonld).get("@graph").get(2)
    assert(fEq.get("localPath").isTextual &&
      fEq.get("localPath").asText == "data/example")
    // different scalar → [new, existing]
    val scalar = validateDocument(crateJson("1.2")).value
      .asInstanceOf[ObjectNode]
    scalar.get("@graph").get(2).asInstanceOf[ObjectNode]
      .put("localPath", "old/other.txt")
    val outSc = rewriteDocument(scalar, Map("data/a.txt" -> target("example")))
    val fSc = mapper.readTree(outSc.jsonld).get("@graph").get(2)
    assert(fSc.get("localPath").isArray)
    assert(fSc.get("localPath").get(0).asText == "data/example")
    assert(fSc.get("localPath").get(1).asText == "old/other.txt")
    // existing array → new value prepended unless already present
    val arr = validateDocument(crateJson("1.2")).value
      .asInstanceOf[ObjectNode]
    arr.get("@graph").get(2).asInstanceOf[ObjectNode]
      .set("localPath", mapper.readTree("""["x/1.txt", "x/2.txt"]"""))
    val outAr = rewriteDocument(arr, Map("data/a.txt" -> target("example")))
    val fAr = mapper.readTree(outAr.jsonld).get("@graph").get(2)
    assert(fAr.get("localPath").get(0).asText == "data/example")
    assert(fAr.get("localPath").size == 3)
  }

  test("fuzz: normalization is a fixed point and rewrite round-trips over the arm space") {
    // deterministic sweep over the im1/im2 fixture arm space: for every
    // combination, (a) validate(serialize(validate(doc))) returns the SAME
    // file ids (normalize_ids is idempotent — the reference relies on this
    // when rewrite_document re-validates its own output), (b) the rewritten
    // bytes validate unaided and no raw file id survives under an id key
    for (n <- 0 until 48) {
      val idK = if (n % 3 == 1) "idAlias" else "@id"
      val typeK = "@type"
      val ctx =
        if (n % 3 == 1)
          """"@context": ["https://w3id.org/ro/crate/1.1/context", {"idAlias": "@id"}], """
        else """"@context": "https://w3id.org/ro/crate/1.2/context", """
      val ver = if (n % 3 == 1) "1.1" else "1.2"
      val raw = if (n % 4 == 1) s"./f $n b.txt" else s"data/$n.txt"
      val enc = if (n % 4 == 1) s"./f%20$n%20b.txt" else s"data/$n.txt"
      val extraLp =
        if (n % 8 == 3) s""", "localPath": "old/p$n.txt"""" else ""
      val seeAlso = if (n % 6 == 2) s""", "seeAlso": "$enc"""" else ""
      val doc =
        s"""{$ctx"@graph": [
           | {"$idK": "ro-crate-metadata.json", "$typeK": "CreativeWork",
           |  "about": {"$idK": "./"},
           |  "conformsTo": {"$idK": "https://w3id.org/ro/crate/$ver"}},
           | {"$idK": "./", "$typeK": "Dataset", "name": "c$n",
           |  "hasPart": [{"$idK": "$enc"}]$seeAlso},
           | {"$idK": "$raw", "$typeK": "File", "name": "f"$extraLp}
           |]}""".stripMargin
      val v1 = validateDocument(doc)
      assert(v1.fileIds == Seq(enc), s"arm $n: ${v1.fileIds}")
      val v2 = validateDocument(sortedJson(v1.value))
      assert(v2.fileIds == v1.fileIds, s"arm $n: normalization not a fixed point")
      val out = rewriteDocument(v1.value, Map(enc -> target(s"t$n")))
      val re = validateDocument(out.jsonld)
      assert(re.fileIds == Seq(s"https://w3id.org/aruna/data/arn:t$n"),
        s"arm $n: rewritten File id not the staged target: ${re.fileIds}")
      assert(!out.jsonld.contains(s""""$idK": "$enc""""),
        s"arm $n: a raw file id survived under an id key")
      assert(out.warnings == (if (n % 6 == 2) Seq(enc) else Nil), s"arm $n")
    }
  }

  test("plain string occurrences of a target id warn but are not rewritten") {
    val doc = validateDocument(crateJson("1.2")).value.asInstanceOf[ObjectNode]
    doc.get("@graph").get(1).asInstanceOf[ObjectNode]
      .put("seeAlso", "data/a.txt")
    val out = rewriteDocument(doc, Map("data/a.txt" -> target("example")))
    assert(out.warnings == Seq("data/a.txt"))
    val root = mapper.readTree(out.jsonld).get("@graph").get(1)
    assert(root.get("seeAlso").asText == "data/a.txt",
      "string refs stay as written — only collected as warnings")
  }

  test("a context term mapped elsewhere forces the absolute-IRI prepend keys") {
    // term_matches Some(other) arm: contentUrl/localPath mapped away from
    // their IRIs → the rewrite must write under the full IRIs
    val doc =
      """{
        | "@context": ["https://w3id.org/ro/crate/1.2/context",
        |   {"contentUrl": "http://example.org/notacontent",
        |    "localPath": "http://example.org/notapath"}],
        | "@graph": [
        |   {"@id": "ro-crate-metadata.json", "@type": "CreativeWork",
        |    "about": {"@id": "./"},
        |    "conformsTo": {"@id": "https://w3id.org/ro/crate/1.2"}},
        |   {"@id": "./", "@type": "Dataset", "name": "t",
        |    "hasPart": {"@id": "data/a.txt"}},
        |   {"@id": "data/a.txt", "@type": "File", "name": "a"}
        | ]}""".stripMargin
    val validated = validateDocument(doc)
    val out = rewriteDocument(validated.value,
      Map("data/a.txt" -> target("example")))
    val f = mapper.readTree(out.jsonld).get("@graph").get(2)
    assert(f.get(LocalPathIri).asText == "data/example")
    assert(f.get(SchemaContent).asText ==
      "https://w3id.org/aruna/data/" + "a" * 64)
    assert(f.get("localPath") == null && f.get("contentUrl") == null)
  }
}
