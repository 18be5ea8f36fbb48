package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column↔Expression conversions
 * (`org.apache.spark.sql.classic.ExpressionUtils`), the supported
 * wiring point for libraries that ship custom Catalyst expressions
 * on Spark 4's classic engine. This is the only file in the project
 * compiled into Spark's namespace; everything else lives under
 * `graft`.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
