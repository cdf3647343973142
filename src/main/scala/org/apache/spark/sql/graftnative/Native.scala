package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the library's native Catalyst
  * expressions ([[graft.functions.DotI64]]).
  *
  * Spark 4's public `Column` wraps a connect-compatible `ColumnNode`, and
  * the classic converters (`ExpressionUtils.column/expression`) are
  * `private[sql]` — so this one-file shim lives under `org.apache.spark.sql`
  * to re-export them, the established pattern for libraries that ship
  * custom expressions without a SparkSessionExtensions registration
  * requirement (registration would force every caller to rebuild their
  * session with `.withExtensions`). Nothing else may go in this package.
  */
object Native {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a custom logical plan (classic `Dataset.ofRows` is
    * `private[sql]`) — entry point for [[graft.plans.AsOfJoinNode]]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over an RDD of InternalRows (classic
    * `internalCreateDataFrame` is `private[sql]`) — the lineage-barrier
    * entry point for [[graft.Caches.barrier]]: wraps the rows in a fresh
    * constraint-free `LogicalRDD` WITHOUT the external-Row round trip that
    * `createDataFrame(df.rdd, schema)` pays (decode every row to a GenericRow
    * on materialization, re-encode through a RowEncoder on every consumer). */
  def internalOfRows(spark: org.apache.spark.sql.SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
}
