package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (Connect
  * refactor); classic mode still supports it through the private[sql]
  * ExpressionUtils. This bridge re-exports exactly that pair of
  * conversions for graft's native expressions — the standard technique for
  * libraries that ship custom Catalyst expressions without a function
  * registry round-trip.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
