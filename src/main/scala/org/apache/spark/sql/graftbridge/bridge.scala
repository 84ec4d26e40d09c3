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

/** Non-blocking read of an [[org.apache.spark.sql.Observation]]'s metric
  * row. `Observation.get` (the public accessor) blocks with NO timeout,
  * which is the wrong contract for an iterative driver loop that needs a
  * bounded-wait probe with a fallback; the non-blocking `getRowOrEmpty`
  * is `private[sql]`. Same no-behavior bridge pattern as [[ColumnBridge]].
  */
object ObservationBridge {
  def rowOrEmpty(obs: org.apache.spark.sql.Observation)
      : Option[org.apache.spark.sql.Row] = obs.getRowOrEmpty
}
