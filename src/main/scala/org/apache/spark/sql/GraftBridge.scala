package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between user-facing `Column`s and catalyst `Expression`s.
  *
  * Spark 4 moved `Column` to a backend-neutral ColumnNode wrapper; the
  * classic-backend converters live behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This shim — the
  * standard pattern for Spark extension libraries that ship custom
  * codegen Expressions — re-exports just the two conversions graft
  * needs. No Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
