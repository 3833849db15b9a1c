package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 routes Column through
  * ColumnNode, and the converter (`classic.ExpressionUtils`) is
  * `private[sql]` — the usual extension-library pattern is this thin
  * bridge object inside the sql namespace. No Spark internals are
  * modified; this only re-exports two conversions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
