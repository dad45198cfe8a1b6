package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and catalyst `Expression`s.
  *
  * Spark 4 hides the Column↔Expression converters behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`);
  * extension libraries that ship native expressions conventionally
  * expose them from an `org.apache.spark.sql` subpackage. This is the
  * only file outside the `graft` namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Imperative function registration into a live session's registry
    * (the public path, `SparkSessionExtensions.injectFunction`, only
    * applies at session construction).
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
