package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversion
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils does
  * the conversion but is sql-private). Standard extension-library shim —
  * the only Spark-internal surface this project touches.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
