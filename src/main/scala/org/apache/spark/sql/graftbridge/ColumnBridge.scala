package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column↔Expression converters — the
  * documented extension-point pattern for registering custom Catalyst
  * expressions from an external library (Spark 4 moved Column onto the
  * ColumnNode API; ExpressionUtils is the sanctioned classic-mode shim).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
