package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` expression-agnostic; the Expression↔Column
  * converters live in `private[sql]` ExpressionUtils. This bridge (in an
  * org.apache.spark.sql subpackage, the customary pattern for Spark
  * extension libraries) re-exports just those two converters so graft's
  * custom Catalyst expressions can surface as Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
