package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark 4 internals: wrap a raw Catalyst
  * [[Expression]] as a user-facing [[Column]] and back. Spark 4 routes
  * `Column` through `ColumnNode`s, so `new Column(expr)` no longer exists;
  * `ExpressionUtils` is the blessed internal path.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
