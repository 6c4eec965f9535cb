package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  * Spark 4 made `ExpressionUtils` private[sql]; this is the conventional
  * extension-library shim (one object inside the sql package) that
  * re-exposes exactly the two conversions a library defining its own
  * expressions needs. No other private API is touched.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
