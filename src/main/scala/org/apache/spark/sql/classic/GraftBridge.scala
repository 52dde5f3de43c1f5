package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column ↔ Expression conversions
  * (columnNodeSupport.scala). Spark 4 removed the public `Column.expr` /
  * `new Column(expr)` surface; custom Catalyst expressions still need it.
  */
object GraftBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
