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
    },

    // RO-Crate import-archive layout ladder: root vs single-wrapper
    // descriptor, the ELN wrapper requirement, stray top-level entries,
    // wrapper stripping with payload/signature accounting
    "ia1_archive_layout" -> { (s, d) =>
      val arcs = Tables.orders(s, d)
        .select((col("o_orderkey") % 40).cast("long").as("a")).distinct()
        .withColumn("k", col("a") % 8)
        .withColumn("wn", concat(lit("w"), col("a").cast("string")))
      val meta = ArchiveLayout.MetadataPath
      val sig = ArchiveLayout.SignaturePath
      val ent = arcs
        .crossJoin(s.range(0, 5).select(col("id").as("j")))
        .select(
          concat(lit("ar"), col("a").cast("string")).as("arc_id"),
          (col("k") === 1 || (col("k") === 2 && col("a") % 4 < 2))
            .as("eln"),
          when(col("j") === 0 && col("k").isin(0L, 1L, 5L), meta)
            .when(col("j") === 0 && col("k").isin(2L, 3L, 7L), col("wn"))
            .when(col("j") === 0 && col("k") === 4, "data/f1")
            .when(col("j") === 0 && col("k") === 6,
              concat(lit("wA"), col("a").cast("string"), lit("/" + meta)))
            .when(col("j") === 1 && col("k").isin(0L, 1L), "data/f1")
            .when(col("j") === 1 && col("k").isin(2L, 3L, 5L, 7L),
              concat(col("wn"), lit("/" + meta)))
            .when(col("j") === 1 && col("k") === 4, "data/f2")
            .when(col("j") === 1 && col("k") === 6,
              concat(lit("wB"), col("a").cast("string"), lit("/" + meta)))
            .when(col("j") === 2 && col("k").isin(0L, 1L),
              when(col("a") % 2 === 0, sig).otherwise("data/f2"))
            .when(col("j") === 2 && col("k").isin(2L, 3L, 5L, 7L),
              concat(col("wn"), lit("/data/f1")))
            .when(col("j") === 3 && col("k").isin(0L, 1L), "data")
            .when(col("j") === 3 && col("k").isin(2L, 3L),
              when(col("a") % 2 === 0, concat(col("wn"), lit("/" + sig)))
                .otherwise(concat(col("wn"), lit("/data/f2"))))
            .when(col("j") === 4 && col("k") === 3, "stray.txt")
            .as("path"),
          ((col("j") === 0 && col("k").isin(2L, 3L)) ||
            (col("j") === 3 && col("k").isin(0L, 1L))).as("directory"))
        .filter(col("path").isNotNull)
      ArchiveLayout.inspect(ent).orderBy("arc_id")
    },

    // archive entry-path safety: backslash reject, ./-strip, slash
    // collapse, relative-only with drive/dot-component/control rules
    "ia2_archive_paths" -> { (s, d) =>
      val raws = array(lit("a/b/c.txt"), lit("./x/y"), lit("././z"),
        lit("dir/"), lit("a//b"), lit("a\\b"), lit("///"),
        lit("/abs/path"), lit("a/../b"), lit("C:/win"), lit("a/./b"),
        lit("a\u0001b"))
      val paths = Tables.orders(s, d)
        .select((col("o_orderkey") % 36).cast("long").as("p")).distinct()
        .select(col("p").as("p_id"),
          element_at(raws, (col("p") % 12 + 1).cast("int")).as("raw"))
      ArchiveLayout.normalizePaths(paths).orderBy("p_id")
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
    },

    "ia1_archive_layout" ->
      """WITH aseq AS (SELECT DISTINCT CAST(o_orderkey % 40 AS BIGINT) AS a
        |              FROM orders),
        |arcs AS (SELECT a, a%8 AS k, 'w'||a AS wn FROM aseq),
        |ent AS (
        |  SELECT 'ar'||a AS arc_id,
        |    (k = 1 OR (k = 2 AND a%4 < 2)) AS eln,
        |    CASE WHEN j=0 AND k IN (0,1,5) THEN 'ro-crate-metadata.json'
        |         WHEN j=0 AND k IN (2,3,7) THEN wn
        |         WHEN j=0 AND k=4 THEN 'data/f1'
        |         WHEN j=0 AND k=6 THEN 'wA'||a||'/ro-crate-metadata.json'
        |         WHEN j=1 AND k IN (0,1) THEN 'data/f1'
        |         WHEN j=1 AND k IN (2,3,5,7)
        |           THEN wn||'/ro-crate-metadata.json'
        |         WHEN j=1 AND k=4 THEN 'data/f2'
        |         WHEN j=1 AND k=6 THEN 'wB'||a||'/ro-crate-metadata.json'
        |         WHEN j=2 AND k IN (0,1) THEN CASE WHEN a%2=0
        |           THEN 'ro-crate-metadata.json.minisig' ELSE 'data/f2' END
        |         WHEN j=2 AND k IN (2,3,5,7) THEN wn||'/data/f1'
        |         WHEN j=3 AND k IN (0,1) THEN 'data'
        |         WHEN j=3 AND k IN (2,3) THEN CASE WHEN a%2=0
        |           THEN wn||'/ro-crate-metadata.json.minisig'
        |           ELSE wn||'/data/f2' END
        |         WHEN j=4 AND k=3 THEN 'stray.txt' END AS path,
        |    ((j=0 AND k IN (2,3)) OR (j=3 AND k IN (0,1))) AS directory
        |  FROM arcs, range(0,5) u(j)),
        |e2 AS (SELECT * FROM ent WHERE path IS NOT NULL),
        |b1 AS (SELECT *,
        |   path = 'ro-crate-metadata.json' AS is_root,
        |   regexp_matches(path, '^[^/]+/ro-crate-metadata\.json$')
        |     AS is_wrap,
        |   CASE WHEN regexp_matches(path,
        |     '^[^/]+/ro-crate-metadata\.json$')
        |     THEN split_part(path, '/', 1) END AS wrap_name
        |  FROM e2),
        |b2 AS (SELECT *,
        |   SUM(CASE WHEN is_root THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY arc_id) AS root_cnt,
        |   SUM(CASE WHEN is_wrap THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY arc_id) AS wrap_cnt,
        |   MAX(wrap_name) OVER (PARTITION BY arc_id) AS wrapper
        |  FROM b1),
        |b3 AS (SELECT *,
        |   MAX(CASE WHEN wrap_cnt = 1 AND ((path = wrapper
        |        AND NOT directory) OR (path <> wrapper
        |        AND NOT starts_with(path, wrapper||'/')))
        |        THEN 1 ELSE 0 END) OVER (PARTITION BY arc_id) AS stray
        |  FROM b2),
        |b4 AS (SELECT *,
        |   CASE WHEN root_cnt=1 AND wrap_cnt=0 THEN
        |          CASE WHEN eln THEN 'eln_needs_wrapper'
        |               ELSE 'ok_root' END
        |        WHEN root_cnt=0 AND wrap_cnt=1 THEN
        |          CASE WHEN stray=1 THEN 'stray_top_level'
        |               ELSE 'ok_wrapper' END
        |        WHEN root_cnt=0 AND wrap_cnt=0 THEN 'no_metadata'
        |        ELSE 'ambiguous' END AS verdict
        |  FROM b3),
        |b5 AS (SELECT *,
        |   CASE WHEN verdict='ok_root' THEN path
        |        WHEN verdict='ok_wrapper' AND path <> wrapper
        |          THEN substring(path, length(wrapper)+2) END AS eff
        |  FROM b4)
        |SELECT arc_id, MAX(verdict) AS verdict,
        |  MAX(CASE WHEN verdict='ok_wrapper' THEN wrapper END) AS wrapper,
        |  CAST(CASE WHEN MAX(verdict) IN ('ok_root','ok_wrapper') THEN
        |    SUM(CASE WHEN eff IS NOT NULL AND NOT directory
        |        AND eff NOT IN ('ro-crate-metadata.json',
        |          'ro-crate-metadata.json.minisig')
        |        THEN 1 ELSE 0 END) END AS BIGINT) AS n_payload,
        |  CASE WHEN MAX(verdict) IN ('ok_root','ok_wrapper') THEN
        |    MAX(CASE WHEN eff = 'ro-crate-metadata.json.minisig'
        |        THEN 1 ELSE 0 END) = 1 END AS has_signature
        |FROM b5 GROUP BY arc_id ORDER BY arc_id""".stripMargin,

    "ia2_archive_paths" ->
      """WITH pseq AS (SELECT DISTINCT CAST(o_orderkey % 36 AS BIGINT) AS p
        |              FROM orders),
        |raws AS (SELECT p AS p_id,
        |  (['a/b/c.txt','./x/y','././z','dir/','a//b','a\b','///',
        |    '/abs/path','a/../b','C:/win','a/./b','a'||chr(1)||'b'])
        |    [CAST(p%12 + 1 AS INT)] AS raw
        |  FROM pseq),
        |n1 AS (SELECT *, regexp_replace(raw, '/+$', '') AS t1 FROM raws),
        |n2 AS (SELECT *, regexp_replace(t1, '^(\./)+', '') AS t2 FROM n1),
        |n3 AS (SELECT *, regexp_replace(t2, '/+', '/', 'g') AS t3 FROM n2),
        |v AS (SELECT *, CASE WHEN contains(raw, '\') THEN 'unsafe_path'
        |  WHEN t2 = '' THEN 'empty_path'
        |  WHEN starts_with(t2, '/') THEN 'unsafe_relative'
        |  WHEN regexp_matches(t3, '^[A-Za-z]:') THEN 'unsafe_relative'
        |  WHEN regexp_matches(t3, '(^|/)\.\.?(/|$)') THEN 'unsafe_relative'
        |  WHEN regexp_matches(t3, '[[:cntrl:]]') THEN 'control_char'
        |  ELSE 'ok' END AS verdict FROM n3)
        |SELECT p_id, verdict,
        |  CASE WHEN verdict = 'ok' THEN t3 END AS normalized
        |FROM v ORDER BY p_id""".stripMargin
  )
}
