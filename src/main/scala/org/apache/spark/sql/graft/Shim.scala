package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. Spark 4 made the Expression↔Column converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so libraries shipping
  * native expressions expose them through a shim in the sql package
  * namespace — the standard pattern for Catalyst-extending libraries.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** v2 `Column[]` → `StructType` (CatalogV2Util is `private[sql]`) — the
    * catalog's createTable(columns) overload needs the conversion.
    */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)

  /** A v2 connector `Literal` from an EXTERNAL Scala value
    * (`LiteralValue` and the Catalyst converters are `private[sql]`) —
    * the catalog's column-DEFAULT metadata needs one.
    */
  def v2Literal(external: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.connector.expressions.Literal[_] =
    org.apache.spark.sql.connector.expressions.LiteralValue(
      org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToCatalyst(external),
      dt)

  /** Analyze-and-wrap a logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` with the Spark 4 classic split). Used by the SQL DML
    * commands to evaluate the MERGE source plan the parser captured.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-brand a (lazily planned) batch DataFrame as a STREAMING one — the
    * V1 `Source.getBatch` contract requires `isStreaming = true` on the
    * returned frame (MicroBatchExecution asserts it), and a source whose
    * batches are computed plans (a change feed, not a file listing) has no
    * streaming-relation to inherit the bit from. `toRdd` is lazy: no job
    * runs until the sink consumes the batch. This is the standard shape for
    * log-replaying lakehouse sources.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** [[asStreaming]] with an explicitly declared schema (types must match
    * the computed rows; nullability may be RELAXED). A log-replaying
    * source whose batches come from different plan shapes (snapshot scan
    * vs feed union) must declare ONE schema across all of them — varying
    * per-batch nullability breaks downstream state-store schema checks on
    * restart (the state key written by batch 1 must match batch N's).
    */
  def asStreaming(df: DataFrame,
                  schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** Rebase a V1 `Sink.addBatch` micro-batch DataFrame onto its computed
    * RDD so downstream code can run MULTIPLE actions over it (the layout
    * writers probe emptiness, validate constraints and then write) without
    * re-triggering the incremental execution — the exact trick Spark's own
    * ForeachBatchSink uses.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val spark =
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
