package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Readers for the driver-provided parquet tables (TESTDATA.md) plus the
  * aruna-shaped derived tables (FIXTURES.md §1) that the engine operators
  * consume: `quads`, `registry`, `objects`, `blobs`, `buckets`.
  *
  * Derivations are deterministic functions of the driver tables so the
  * DuckDB oracle can rebuild the exact same rows from the same parquet via
  * the SQL fragments in [[OracleCtes]].
  *
  * Scale notes: every derived table is a narrow projection/union of a
  * columnar scan — no shuffle, no driver-side materialization. At 100 TB the
  * physical `quads` table would be written out partitioned by a bucket of
  * `graph_iri` (SURVEY §7); here derivation stays lazy so Catalyst prunes
  * columns all the way into the parquet scan.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  /** events go through the normalizing reader — the generator has shipped
    * `ts` as both int64-ns and timestamp[us] across rounds, and a raw read
    * hands callers a schema-dependent column (the round-6 ev* breakage). */
  def events(s: SparkSession, d: String): DataFrame =
    graft.streaming.Projector.events(s, d)
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  // ---------------------------------------------------------------------
  // Exact-arithmetic helpers for oracle parity.
  // Double sums are order-dependent; decimal sums are exact and associative,
  // so `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)` is bit-identical
  // between Spark and DuckDB regardless of partitioning.
  // ---------------------------------------------------------------------

  /** Exact sum of a double column: cast to decimal(18,4), sum, cast back.
    * Per-row scalar math must stay in pure double (deterministic IEEE ops,
    * identical in Spark and DuckDB); only the SUM goes through decimal.
    * Decimal→decimal scale reduction is forbidden: Spark rounds HALF_UP,
    * DuckDB truncates — exact halves would diverge. A double can never be an
    * exact half at scale 4, so double→decimal(18,4) is unambiguous, and
    * decimal(18,4)→double stays on the exact long/10^4 fast path while the
    * unscaled value < 2^52 (sums < ~4.5e11).
    */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact average: decimal sum divided by count, in double at the end. */
  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum(c.cast(DecimalType(18, 4))).cast("double") / count(c))
}
