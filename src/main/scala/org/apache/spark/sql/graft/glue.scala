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

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point for
    * custom LogicalPlan nodes (e.g. graft.plans.AsofJoinPlan). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame (classic sessions). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** The analyzed plan with persisted fragments substituted by their
    * `InMemoryRelation` leaves — computed FRESH from the cache manager,
    * unlike `queryExecution.withCachedData`, a lazy val that freezes the
    * substitution as of its first access (a persist() issued after that
    * first access would be invisible through it). Used by
    * graft.operators.InputContracts to honor "persist() first" remedies
    * applied at any point before the contract check. */
  def withCachedData(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.useCachedData(analyzed(df).clone())

  /** Unload every loaded state-store provider on this JVM (closes the
    * underlying stores). With the RocksDB provider this closes the native
    * DBs and their JNI logger callbacks BEFORE JVM exit — without it, a
    * RocksDB-internal background thread can call the Java logger through
    * JNI while the VM is shutting down and SIGSEGV (observed in
    * StreamBench's crossover teardown; known rocksdbjni shutdown race).
    * `StateStore.stop()` is `private[sql]`, hence the glue re-export. */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()

  /** Register a named expression builder in the session's function
    * registry so `spark.sql("SELECT name(...)")` resolves it. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    org.apache.spark.sql.classic.SparkSession.getActiveSession
      .getOrElse(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
