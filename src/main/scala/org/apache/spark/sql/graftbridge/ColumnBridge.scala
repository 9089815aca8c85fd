package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column↔Expression bridging behind private[sql]
  * ExpressionUtils; this subpackage shim re-exports the two calls the
  * engine needs for its native expressions (the supported extension
  * seam — SparkSessionExtensions function builders use the same types).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
