package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator (SURVEY §2);
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-compare gate.
  * Implementations live in per-domain objects (graft.relational, graft.sparql,
  * graft.fts, graft.catalog, graft.dedup, graft.text, …).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.relational.CoreQueries.queries ++
      graft.sparql.SparqlQueries.queries ++
      graft.fts.FtsQueries.queries ++
      graft.catalog.CatalogQueries.queries ++
      graft.pipeline.PipelineQueries.queries ++
      graft.streaming.StreamingQueries.queries ++
      graft.functions.FunctionQueries.queries ++
      graft.sources.SourceQueries.queries ++
      graft.layout.LayoutQueries.queries ++
      graft.web.WebQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.relational.CoreQueries.oracles ++
      graft.sparql.SparqlQueries.oracles ++
      graft.fts.FtsQueries.oracles ++
      graft.catalog.CatalogQueries.oracles ++
      graft.pipeline.PipelineQueries.oracles ++
      graft.streaming.StreamingQueries.oracles ++
      graft.functions.FunctionQueries.oracles ++
      graft.sources.SourceQueries.oracles ++
      graft.layout.LayoutQueries.oracles ++
      graft.web.WebQueries.oracles
}
