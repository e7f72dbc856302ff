package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `new Column(expr)` constructor; the classic
  * bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`.
  * This tiny shim lives inside the `org.apache.spark.sql` package purely to
  * re-export those two conversions to the engine — the standard idiom for
  * Catalyst-extending libraries on Spark 4.x.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
