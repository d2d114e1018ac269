package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the Column ↔ Catalyst Expression conversions, which Spark 4
  * hides behind `private[sql]`. Lives under `org.apache.spark.sql` solely to
  * satisfy the access qualifier; keep all graft logic out of this file. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
