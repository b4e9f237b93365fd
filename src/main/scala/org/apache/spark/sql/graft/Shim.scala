package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
}
