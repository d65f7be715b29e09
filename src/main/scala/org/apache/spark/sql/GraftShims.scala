package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for the `private[sql]` Column <-> Expression converters so graft's
  * native expressions (graft.plans.*) can surface as Columns without a
  * registered session function. Standard third-party-extension shim. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst-internal -> external Scala value converter (timestamps to
    * java.sql.Timestamp, UTF8String to String, …) for connectors that
    * render values outside the row format, e.g. the graft-xlsx writer. */
  def toScalaConverter(dt: types.DataType): Any => Any =
    catalyst.CatalystTypeConverters.createToScalaConverter(dt)

  /** Drop every in-memory streaming state-store provider (the
    * `private[sql]` StateStore.unloadAll) — restart-recovery tests use
    * this to force the next query run to rebuild state from checkpoint
    * files, exactly like a new executor after a crash. */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
