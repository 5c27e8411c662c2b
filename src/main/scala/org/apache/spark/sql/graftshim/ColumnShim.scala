package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression converters so the
  * graft library can expose custom Catalyst expressions as `Column`s.
  * (Spark 4 moved the old `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`.)
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
