package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the Column <-> Expression conversions that Spark 4 made
  * `private[sql]`. Custom Catalyst expressions (graft.functions.*)
  * need both directions to expose a Column API; this is the
  * conventional extension-point shim, no internals are modified. */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
