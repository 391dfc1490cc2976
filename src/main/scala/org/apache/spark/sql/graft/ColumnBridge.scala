package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 wraps columns in `ColumnNode`s (Connect-compatible); the
  * classic converter lives behind `private[sql]`, so this one-file
  * shim — the conventional pattern for Spark-native extension
  * libraries — re-exports just the two conversions graft's custom
  * codegen expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
