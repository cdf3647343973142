package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate queries for the source adapters: autoindex HTML parsing and
  * the JSON-LD export → re-ingest roundtrip. Both oracles are
  * engine-independent (constant literals / predicate counts), so the gate
  * checks real parser output rather than rows-only.
  */
object SourceQueries {

  /** Deterministic nginx-style autoindex page: one directory, two files
    * (one with a URL-encoded space), a parent link that must be skipped. */
  val NginxFixture: String =
    """<html><head><title>Index of /data/</title></head>
      |<body><h1>Index of /data/</h1><hr><pre><a href="../">../</a>
      |<a href="subdir/">subdir/</a>                             12-Mar-2024 10:15       -
      |<a href="file1.bin">file1.bin</a>                         12-Mar-2024 10:20     4096
      |<a href="b%20c.txt">b c.txt</a>                           01-Jan-2023 00:01      123
      |</pre><hr></body></html>""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // autoindex parse over the fixture page: names decoded, dirs flagged,
    // sizes and timestamps extracted from the trailing listing columns
    "ax1_autoindex" -> { (s, _) =>
      Autoindex.toDf(s, Autoindex.parse(NginxFixture))
        .select(col("name"), col("is_dir"), col("size").cast("long"),
          col("modified"))
        .orderBy(col("name"))
    },

    // export → re-ingest roundtrip: documents → JSON-LD payloads → quads →
    // paged RO-Crate export → ingest the exported pages → per-predicate
    // counts must equal a direct count over the source rows
    "jl2_export_roundtrip" -> { (s, d) =>
      val payloads = Tables.documents(s, d).select(
        concat(lit("graph:"), col("doc_id").cast("string")).as("graph_iri"),
        to_json(struct(
          concat(lit("doc:"), col("doc_id").cast("string")).as("@id"),
          lit("Dataset").as("@type"),
          concat(col("source"), lit("-doc-"), col("doc_id").cast("string")).as("name"),
          col("n_chars").as("contentSize"))).as("jsonld"))
      val quads = JsonLd.ingest(payloads)
      val pages = JsonLd.exportGraphs(quads)
      JsonLd.ingest(pages.select(col("graph_iri"), col("jsonld")))
        .groupBy(col("predicate"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("predicate"))
    },

    // JSONL corpus round-trip — the interchange format every training
    // corpus ships as: write the documents table as JSON Lines, read it
    // back under an EXPLICIT schema (never inference — nondeterministic
    // sampling at scale), and the relation must be identical, which is
    // what the oracle (the original table) checks. Pins the writer's
    // escaping and the reader's decode end-to-end.
    "jl3_jsonl_roundtrip" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
      // per-invocation scratch dir: concurrent runs must never race on
      // mode(overwrite) of a shared deterministic path
      val path = java.nio.file.Files
        .createTempDirectory("graft-jsonl-").toString
      docs.write.mode("overwrite").json(path)
      s.read.schema(docs.schema).json(path).orderBy("doc_id")
    },

    // Staging-source listing (list_source.rs + opendal.rs list_operator):
    // one-level vs recursive walks with intermediate directories, the
    // files_only drop BEFORE offset/limit counting, offset/limit paging
    // with truncated + next_offset, root never listed
    "sl1_staging_list" -> { (s, d) =>
      val files = graft.catalog.ObjectTables.objects(s, d)
        .filter(col("bucket") === "bkt-2")
        .groupBy(col("key"))
        .agg(max("size").as("size"), max("created_at_ms").as("modified_ms"))
        .select(col("key").as("path"), col("size"), col("modified_ms"))
      def sect(tag: String, df: DataFrame) = df.withColumn("sect", lit(tag))
      sect("a", StagingList.listSource(files, "data/", 0, 10,
          recursive = false, filesOnly = false))
        .unionByName(sect("b", StagingList.listSource(files, "data/N/", 0, 30,
          recursive = true, filesOnly = false)))
        .unionByName(sect("c", StagingList.listSource(files, "data/N/", 25, 20,
          recursive = true, filesOnly = true)))
        .unionByName(sect("d", StagingList.listSource(files, "data/N/f3/", 0, 5,
          recursive = false, filesOnly = false)))
        .orderBy("sect", "path")
    }
  )

  val oracles: Map[String, String] = Map(
    "ax1_autoindex" ->
      """SELECT * FROM (VALUES
        |  ('b c.txt',   false, CAST(123  AS BIGINT), '01-Jan-2023 00:01'),
        |  ('file1.bin', false, CAST(4096 AS BIGINT), '12-Mar-2024 10:20'),
        |  ('subdir',    true,  CAST(NULL AS BIGINT), '12-Mar-2024 10:15')
        |) t(name, is_dir, size, modified) ORDER BY name""".stripMargin,

    // round-trip identity: the reimported relation IS the source table
    "jl3_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // identical to jl1: the roundtrip must preserve every triple
    "jl2_export_roundtrip" ->
      """SELECT p AS predicate, COUNT(*) AS n FROM documents
        |CROSS JOIN (VALUES ('http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
        |                   ('http://schema.org/name'),
        |                   ('http://schema.org/contentSize')) t(p)
        |GROUP BY p ORDER BY p""".stripMargin,

    // the dir-inference SQL is fixture-depth-specialized (max one
    // intermediate level under each section root); the Spark operator is
    // depth-generic
    "sl1_staging_list" -> {
      def sect(tag: String, p: String, off: Int, lim: Int,
          oneLevelLeaf: Boolean, filesOnly: Boolean): String = {
        val lp = p.length
        val fileCond =
          if (oneLevelLeaf) s"strpos(substr(path, ${lp + 1}), '/') = 0"
          else "TRUE"
        val dirPart =
          if (filesOnly) ""
          else
            s"""  UNION ALL
               |  SELECT DISTINCT regexp_extract(d, '([^/]+)$$', 1) AS name,
               |    '$p'||d AS path, 'Directory' AS kind,
               |    CAST(NULL AS BIGINT) AS size,
               |    CAST(NULL AS BIGINT) AS modified_ms
               |  FROM (SELECT split_part(substr(path, ${lp + 1}), '/', 1) AS d
               |        FROM files
               |        WHERE path LIKE '$p%'
               |          AND strpos(substr(path, ${lp + 1}), '/') > 0)
               |""".stripMargin
        s"""${tag}e AS (
           |  SELECT regexp_extract(path, '([^/]+)$$', 1) AS name, path,
           |    'File' AS kind, size, modified_ms
           |  FROM files WHERE path LIKE '$p%' AND $fileCond
           |$dirPart),
           |${tag}p AS (SELECT * FROM ${tag}e
           |            ORDER BY path LIMIT $lim OFFSET $off),
           |${tag}n AS (SELECT COUNT(*) AS t FROM ${tag}e),
           |${tag}_out AS (
           |  SELECT p.*, n.t > ${off + lim} AS truncated,
           |    CASE WHEN n.t > ${off + lim}
           |         THEN CAST(${off + lim} AS BIGINT) END AS next_offset,
           |    '$tag' AS sect
           |  FROM ${tag}p p, ${tag}n n)""".stripMargin
      }
      s"""WITH ${graft.catalog.ObjectTables.objectsCte},
         |files AS (SELECT key AS path, CAST(MAX(size) AS BIGINT) AS size,
         |                 MAX(created_at_ms) AS modified_ms
         |          FROM objects WHERE bucket='bkt-2' GROUP BY key),
         |${sect("a", "data/", 0, 10, oneLevelLeaf = true, filesOnly = false)},
         |${sect("b", "data/N/", 0, 30, oneLevelLeaf = false, filesOnly = false)},
         |${sect("c", "data/N/", 25, 20, oneLevelLeaf = false, filesOnly = true)},
         |${sect("d", "data/N/f3/", 0, 5, oneLevelLeaf = true, filesOnly = false)}
         |SELECT * FROM (
         |  SELECT * FROM a_out UNION ALL SELECT * FROM b_out
         |  UNION ALL SELECT * FROM c_out UNION ALL SELECT * FROM d_out)
         |ORDER BY sect, path""".stripMargin
    }
  )
}
