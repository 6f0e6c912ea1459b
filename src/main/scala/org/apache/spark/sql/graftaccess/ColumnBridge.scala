package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Package-access bridge to Column ↔ Expression conversion
  * (`classic.ExpressionUtils` is `private[sql]` in Spark 4). Lets the
  * engine build a native Catalyst expression Column DIRECTLY —
  * [[graft.functions.Quantize1e4]] has call sites (PCA training,
  * outlier scoring) that never pass through a session-registration
  * path, so `call_function` would be a registration landmine there.
  * Same pattern as [[org.apache.spark.graftaccess.ListenerBusAccess]]:
  * the narrowest possible surface, no behavior.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
