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

  /** `AbstractDataType` (the `ExpectsInputTypes.inputTypes` element
    * type) is private[sql]; expressions outside the sql package need
    * this alias to declare analysis-time input-type contracts. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
  /** TypeCollection ("one of these types") is private[sql] too. */
  def oneOf(types: org.apache.spark.sql.types.AbstractDataType*)
      : org.apache.spark.sql.types.AbstractDataType =
    org.apache.spark.sql.types.TypeCollection(types: _*)

  /** Register a native function on a live session's registry — the
    * same operation `SparkSessionExtensions.injectFunction` performs at
    * session build time, exposed for already-built sessions. */
  def registerFunction(spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
