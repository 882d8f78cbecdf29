package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column <-> Expression converters
  * (Spark 4 moved Column off Expression; libraries injecting custom
  * Catalyst expressions need this hop — same pattern as other Spark
  * extension libraries). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
