package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow accessor for the `private[sql]` Column ↔ Expression conversions
  * (SNIPPETS.md documents `Dataset`/`Column` internals as the sanctioned
  * extension seam; Spark 4 moved the public constructors behind
  * `classic.ExpressionUtils`). This is the only place the engine reaches
  * into Spark's package-private API.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native function into an EXISTING session's
    * FunctionRegistry (the extensions path only covers sessions built
    * after the conf is set; Verify/Bench receive a pre-built one).
    */
  def registerFunction(spark: SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
