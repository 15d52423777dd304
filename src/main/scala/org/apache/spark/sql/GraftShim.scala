package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark 4's `private[sql]` Column⇄Expression bridge —
  * the standard pattern for extension libraries that define native
  * Catalyst expressions (the public `Column` API is connect-agnostic and
  * no longer exposes `.expr`).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
