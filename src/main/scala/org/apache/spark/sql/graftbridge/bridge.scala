package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 hid `Column.expr` behind the classic/connect split; third-party
  * Catalyst expressions (graft.functions.DotProduct) still need to wrap
  * into a Column. This object lives under `org.apache.spark.sql` solely to
  * satisfy the `private[sql]` qualifier — it adds no behavior.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
