package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression bridging behind `private[sql]`
  * (columnNodeSupport.scala). This glue package lives inside
  * `org.apache.spark.sql` purely to re-export the two converters our
  * custom Catalyst expressions need — the standard extension-library
  * technique; no other internals are touched. */
object glue {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a named expression builder in the session's function
    * registry so `spark.sql("SELECT name(...)")` resolves it. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.SparkSession.getActiveSession
      .getOrElse(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
