package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters, needed to
  * expose custom Catalyst expressions (e.g. graft.dedup.SimHash64) through
  * the public Column API on Spark 4's ColumnNode-based Column.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager ColumnNode -> Expression conversion. `ExpressionUtils.expression`
    * wraps lazily in a ColumnNodeExpression, which never gets converted when
    * the result is spliced into a FunctionRegistry builder — the eager
    * converter emits Unresolved* trees the analyzer resolves in place.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
