package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4.x's `private[sql]` Column ↔ Expression conversions.
  *
  * Spark 4 moved `Column` to a backend-agnostic representation; classic
  * Catalyst interop lives in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. Extension libraries that ship custom Catalyst
  * expressions (the standard pattern used by spatial/ML Spark libraries)
  * host a tiny forwarder inside the `org.apache.spark.sql` package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder into a live session's registry (the
    * same registration `SparkSessionExtensions.injectFunction` performs at
    * session build time — this variant works on an existing session).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      "graft", name)
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
  }
}
