package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides the Column ↔ Expression constructors behind
  * `private[sql]`; this bridge (compiled into the sql package namespace, the
  * sanctioned extension point Spark itself uses for third-party expressions)
  * re-exposes exactly the two conversions custom Catalyst expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
