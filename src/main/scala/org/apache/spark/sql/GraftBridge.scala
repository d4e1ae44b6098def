package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column↔Expression conversions, needed
  * to expose custom Catalyst aggregates (e.g. the t-digest
  * TypedImperativeAggregate) through the public Column API. This is the
  * standard extension-library shim — no Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
