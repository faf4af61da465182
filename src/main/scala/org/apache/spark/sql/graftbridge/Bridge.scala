package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-API bridge for custom Catalyst expressions. Spark 4 made
  * the Column ↔ Expression conversions `private[sql]`
  * (ExpressionUtils in columnNodeSupport.scala), so extension
  * libraries expose them through a shim in the sql namespace — the
  * standard pattern for Spark-native operator libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
