package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved `Column` to a ColumnNode representation; the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, columnNodeSupport.scala
  * in the Apache Spark source) are `private[sql]`, so third-party
  * expression libraries expose them through a package-scoped bridge —
  * the standard extension pattern for Catalyst add-ons. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
