package graft.fts

import graft.sparql.RdfTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FTS operator coverage for the driver gate. Integer-statistic queries get
  * exact DuckDB oracles; the float BM25 ranking is rows-only here and pinned
  * by golden unit tests instead (float scores are not bit-stable across
  * engines' ln implementations — the *contract* per SURVEY §7 is our own
  * deterministic ordering, which fts5 validates via the integer sort key).
  */
object FtsQueries {

  // materialized token-clustered index ([[graft.Store]]) — the reference
  // queries its persistent tantivy index, never re-tokenizes per query
  private def postings(s: SparkSession, d: String): DataFrame =
    graft.Store.postings(s, d)

  /** Deterministic integer relevance: total tf of query tokens per subject
    * (exactly reproducible in SQL; same ordering contract as compare_hits). */
  private def rankedInt(s: SparkSession, d: String, query: String): DataFrame = {
    val toks = Search.tokenize(query)
    postings(s, d)
      .filter(col("token").isin(toks: _*))
      .groupBy(col("graph_iri"), col("subject_iri"))
      .agg(sum(col("tf")).cast("long").as("score_key"),
        countDistinct(col("token")).as("n_tokens"))
      .orderBy(col("score_key").desc, col("graph_iri").asc, col("subject_iri").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fts1_postings" -> { (s, d) =>
      postings(s, d)
        .filter(col("token").isin("merge", "window", "author"))
        .orderBy(col("token"), col("graph_iri"), col("subject_iri"), col("field"))
    },

    "fts2_doc_freq" -> { (s, d) =>
      Fts.docFrequencies(postings(s, d))
        .orderBy(col("df").desc, col("token"))
        .limit(20)
    },

    // full BM25 pipeline: scoring + merge + enrichment (rows-only gate;
    // ordering/quantization pinned by FtsSpec golden tests)
    "fts3_bm25_search" -> { (s, d) =>
      val quads = graft.Store.quads(s, d)
      val hits = Search.bm25(postings(s, d), "spark merge fast")
        .withColumn("document_id", regexp_extract(col("graph_iri"), "([0-9]+)$", 1))
        .withColumn("snippet", lit(null: String))
      val merged = Search.mergeHits(hits)
      Search.page(Enrich.enrich(merged, quads, RdfTables.registry(s, d), "spark merge fast"),
        None, 50)
        .select("graph_iri", "subject_iri", "score_key", "title", "snippet")
    },

    "fts4_ranked" -> { (s, d) =>
      rankedInt(s, d, "spark merge fast").limit(20)
    },

    // watermark pagination page 2 ≡ OFFSET page_size on the same ordering
    "fts5_page2" -> { (s, d) =>
      val ranked = rankedInt(s, d, "spark merge fast")
        .withColumnRenamed("n_tokens", "nt")
        .select(col("graph_iri"), col("subject_iri"), col("score_key"))
      val page1 = ranked.limit(25).collect()
      val last = page1.last
      val wm = Search.Watermark(last.getLong(2), last.getString(0), last.getString(1))
      ranked.filter(Search.afterWatermark(wm))
        .orderBy(Search.hitOrder: _*)
        .limit(25)
    }
  )

  private val rankedSql =
    """SELECT graph_iri, subject_iri, CAST(SUM(tf) AS BIGINT) AS score_key,
      |       COUNT(DISTINCT token) AS n_tokens
      |FROM postings WHERE token IN ('spark','merge','fast')
      |GROUP BY 1, 2
      |ORDER BY score_key DESC, graph_iri, subject_iri""".stripMargin

  val oracles: Map[String, String] = Map(
    "fts1_postings" ->
      s"""WITH ${Fts.postingsCte}
         |SELECT token, graph_iri, subject_iri, field, tf FROM postings
         |WHERE token IN ('merge','window','author')
         |ORDER BY token, graph_iri, subject_iri, field""".stripMargin,

    "fts2_doc_freq" ->
      s"""WITH ${Fts.postingsCte}
         |SELECT token, COUNT(DISTINCT graph_iri) AS df FROM postings
         |GROUP BY token ORDER BY df DESC, token LIMIT 20""".stripMargin,

    "fts4_ranked" ->
      s"""WITH ${Fts.postingsCte}
         |$rankedSql LIMIT 20""".stripMargin,

    "fts5_page2" ->
      s"""WITH ${Fts.postingsCte},
         |ranked AS ($rankedSql)
         |SELECT graph_iri, subject_iri, score_key FROM ranked
         |LIMIT 25 OFFSET 25""".stripMargin
  )
}
