package graft.sources

import graft.SparkSpec
import graft.sparql.{RdfTables, SparqlEngine}
import org.apache.spark.sql.functions._

class JsonLdSpec extends SparkSpec {
  import spark.implicits._

  private val crate =
    """{"@graph": [
      |  {"@id": "./", "@type": "Dataset", "name": "My Crate",
      |   "description": {"@value": "Ein Test", "@language": "de"},
      |   "contentSize": 42, "active": true,
      |   "author": {"@id": "#alice"},
      |   "keywords": ["k1", "k2"],
      |   "conformsTo": {"@id": "https://w3id.org/ro/crate/1.1"}},
      |  {"@id": "#alice", "@type": "Person", "name": "Alice"}
      |]}""".stripMargin

  test("RO-Crate @graph ingest: typed literals, refs, arrays, lang tags") {
    val quads = JsonLd.documentToTriples(crate, "g1")
    def objs(p: String) = quads.filter(_.predicate == p)
    assert(objs(JsonLd.RdfType).map(_.obj_value).toSet ==
      Set("http://schema.org/Dataset", "http://schema.org/Person"))
    assert(objs("http://schema.org/contentSize").head.obj_datatype.endsWith("integer"))
    assert(objs("http://schema.org/active").head.obj_datatype.endsWith("boolean"))
    assert(objs("http://schema.org/description").head.obj_lang == "de")
    assert(objs("http://schema.org/author").head.obj_kind == graft.sparql.Kind.Iri)
    assert(objs("http://schema.org/keywords").map(_.obj_value).toSet == Set("k1", "k2"))
    assert(objs("http://purl.org/dc/terms/conformsTo").head.obj_value ==
      "https://w3id.org/ro/crate/1.1")
  }

  test("ingest validation: @id/@type required, @graph and nested objects rejected") {
    def bad(j: String): Boolean =
      try { JsonLd.documentToTriples(j, "g"); false }
      catch { case _: JsonLd.JsonLdError => true }
    assert(bad("""{"@type": "Dataset", "name": "no id"}"""))
    assert(bad("""{"@id": "x", "name": "no type"}"""))
    assert(bad("""{"@id": "x", "@type": "", "name": "empty type"}"""))
    // @type arrays must contain only non-empty strings (reference errors on
    // non-string entries — no silent coercion or empty-filtered types)
    assert(bad("""{"@id": "x", "@type": [""], "name": "n"}"""))
    assert(bad("""{"@id": "x", "@type": [{}], "name": "n"}"""))
    assert(bad("""{"@id": "x", "@type": [5], "name": "n"}"""))
    assert(!bad("""{"@id": "x", "@type": ["Dataset", "Thing"], "name": "n"}"""))
    assert(bad("""{"@id": "x", "@type": "Dataset", "nested": {"a": 1}}"""))
    // @graph inside a single entity of a @graph payload is rejected
    assert(bad("""{"@graph": [{"@id": "x", "@type": "T", "@graph": []}]}"""))
    // but {"@id"} refs and {"@value"} objects are fine
    assert(!bad("""{"@id": "x", "@type": "T", "r": {"@id": "y"}, "v": {"@value": "z"}}"""))
  }

  test("ingested quads answer the canonical SPARQL query") {
    val df = Seq(("g1", crate)).toDF("graph_iri", "jsonld")
    val quads = JsonLd.ingest(df)
    val res = SparqlEngine.select(quads,
      "SELECT ?s ?name WHERE { ?s a schema:Dataset . ?s schema:name ?name }")
      .collect().map(_.toSeq).toSeq
    assert(res == Seq(Seq("./", "My Crate")))
  }

  test("export roundtrip: quads → JSON-LD → quads is lossless") {
    val df = Seq(("g1", crate)).toDF("graph_iri", "jsonld")
    val quads1 = JsonLd.ingest(df)
    val exported = JsonLd.exportGraphs(quads1)
    assert(exported.count() == 1)
    val row = exported.collect().head
    assert(row.getAs[Long]("total_data_entities") == 2L)
    val quads2 = JsonLd.ingest(exported.select(col("graph_iri"), col("jsonld")))
    val s1 = quads1.collect().map(_.toSeq).toSet
    val s2 = quads2.collect().map(_.toSeq).toSet
    assert(s1 == s2, s"roundtrip mismatch:\nonly-in-1: ${s1 -- s2}\nonly-in-2: ${s2 -- s1}")
  }

  test("paged export: offset slices entities, limit clamped to 1..1000") {
    val df = Seq(("g1", crate)).toDF("graph_iri", "jsonld")
    val quads = JsonLd.ingest(df)
    val page2 = JsonLd.exportGraphs(quads, offset = 1, limit = 1).collect().head
    assert(page2.getAs[Long]("total_data_entities") == 2L)
    assert(page2.getAs[String]("jsonld").contains("#alice") ||
      page2.getAs[String]("jsonld").contains("./"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(page2.getAs[String]("jsonld")).get("@graph").size == 1)
  }

  test(".eln archive ingest: crate extracted from the zip and mapped") {
    // synthesize an .eln: zip with <name>/ro-crate-metadata.json (fixture
    // shape of operations/fixtures/eln/*.eln — shape, not bytes)
    val bos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.putNextEntry(new java.util.zip.ZipEntry("my-export/"))
    zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("my-export/ro-crate-metadata.json"))
    zout.write(crate.getBytes("UTF-8"))
    zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("my-export/data.csv"))
    zout.write("a,b\n1,2\n".getBytes("UTF-8"))
    zout.closeEntry()
    zout.close()
    val eln = bos.toByteArray
    assert(JsonLd.fromElnArchive(eln).contains(crate))
    val df = Seq(("g9", eln)).toDF("graph_iri", "eln_bytes")
    val quads = JsonLd.ingestEln(df)
    assert(quads.filter($"predicate" === "http://schema.org/name").count() == 2)
    // an archive without a crate yields nothing
    val emptyZip = {
      val b = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(b)
      z.putNextEntry(new java.util.zip.ZipEntry("readme.txt")); z.write(1); z.closeEntry(); z.close()
      b.toByteArray
    }
    assert(JsonLd.fromElnArchive(emptyZip).isEmpty)
  }

  test("validate() flags bad rows without failing the batch") {
    val df = Seq(
      ("g1", crate),
      ("g2", """{"@id": "x"}"""),
      ("g3", "not json at all {")
    ).toDF("graph_iri", "jsonld")
    val v = JsonLd.validate(df).collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(v("g1") == null)
    assert(v("g2") != null && v("g3") != null)
  }
}
