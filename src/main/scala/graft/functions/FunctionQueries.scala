package graft.functions

import graft.Tables
import graft.sources.JsonLd
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-family and JSON-LD ingest coverage as oracle-checked queries. */
object FunctionQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multi-digest (PutObject write path shape): md5 + sha256 per document
    "h1_multihash" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("md5"),
          sha2(col("text"), 256).as("sha256"))
        .orderBy(col("doc_id"))
    },

    // crc family + blake3 over the binary payloads (rows-only: DuckDB lacks
    // these; pinned by the reference KAT vector + official BLAKE3 vectors in
    // FunctionsSpec, and by the oracle-checked h3 KAT gate below)
    "h2_crc_family" -> { (s, d) =>
      val bytes = encode(col("text"), "UTF-8")
      Tables.documents(s, d)
        .select(col("doc_id"),
          Hashes.blake3Udf(bytes).as("blake3"),
          Hashes.crc32Udf(bytes).as("crc32"),
          Hashes.crc32cUdf(bytes).as("crc32c"),
          Hashes.crc64nvmeUdf(bytes).as("crc64nvme"))
        .orderBy(col("doc_id"))
    },

    // BLAKE3 known-answer gate: digests of the official test-vector inputs
    // (bytes i % 251) — the oracle carries the published digests as
    // literals, so the compare is engine-independent and deterministic
    "h3_blake3_kat" -> { (s, d) =>
      import s.implicits._
      val mk = udf((n: Int) => Blake3.hex(Array.tabulate(n)(i => (i % 251).toByte)))
      Blake3Kat.Lengths.toDF("n")
        .select(col("n"), mk(col("n")).as("blake3"))
        .orderBy(col("n"))
    },

    // JSON-LD ingest end-to-end: documents → JSON-LD payloads → quads,
    // counted per predicate
    "jl1_ingest_counts" -> { (s, d) =>
      val payloads = Tables.documents(s, d).select(
        concat(lit("graph:"), col("doc_id").cast("string")).as("graph_iri"),
        to_json(struct(
          concat(lit("doc:"), col("doc_id").cast("string")).as("@id"),
          lit("Dataset").as("@type"),
          concat(col("source"), lit("-doc-"), col("doc_id").cast("string")).as("name"),
          col("n_chars").as("contentSize"))).as("jsonld"))
      JsonLd.ingest(payloads)
        .groupBy(col("predicate"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("predicate"))
    }
  )

  val oracles: Map[String, String] = Map(
    "h3_blake3_kat" -> Blake3Kat.oracleSql,

    "h1_multihash" ->
      """SELECT doc_id, md5(text) AS md5, sha256(text) AS sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    "jl1_ingest_counts" ->
      """SELECT p AS predicate, COUNT(*) AS n FROM documents
        |CROSS JOIN (VALUES ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
        |                   ('http://schema.org/name'),
        |                   ('http://schema.org/contentSize')) t(p)
        |GROUP BY p ORDER BY p""".stripMargin
  )
}
