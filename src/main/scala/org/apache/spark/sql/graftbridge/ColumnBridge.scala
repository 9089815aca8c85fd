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

  /** Eager node→Expression conversion. `expression` defers behind a
    * lazy ColumnNodeExpression wrapper, which native expressions cannot
    * type-check against when used as a child inside a FunctionBuilder;
    * this converts the whole tree up front so the analyzer sees plain
    * (possibly unresolved) catalyst expressions.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
