package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions, needed
  * to build Columns from raw Catalyst expressions (e.g. StaticInvoke) under
  * the Spark-4 split Column API. Standard extension-library pattern; no
  * Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
