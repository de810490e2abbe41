package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge into Spark's `private[sql]` Column↔Expression
  * adapters for the engine's custom Catalyst expressions. Living in a
  * subpackage of `org.apache.spark.sql` is the standard technique for
  * Spark extension libraries (the alternatives — reflection or forking —
  * are worse); only these three forwarders live here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column → Catalyst expression via the classic converter: unlike
    * [[expression]]'s lazy `ColumnNodeExpression` wrapper (fine as a
    * child of an already-resolved custom Expression), this converts the
    * whole node tree into real Catalyst nodes (`UnresolvedFunction` etc.)
    * that the ANALYZER then resolves — required when the tree is returned
    * from a FunctionRegistry builder, where a wrapper node would reach
    * codegen unresolved.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Block until the shared listener bus has delivered every queued
    * event. Audit tooling needs this between queries: the
    * QueryExecutionListener bus is ASYNC, so executions belonging to
    * query N can otherwise deliver into query N+1's freshly-registered
    * listener and contaminate its plan audit (run-order-dependent counts
    * — the ADVICE r13 PLAN_AUDIT drift). Bounded wait, same contract as
    * Spark's own test helper.
    */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)

  // test access to the (private[sql]) SparkSessionExtensions build hooks,
  // so extension wiring is verifiable without tearing down the shared
  // test session (extensions only apply at session construction)
  def buildStrategies(exts: org.apache.spark.sql.SparkSessionExtensions,
                      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    exts.buildPlannerStrategies(spark)
  def applyExtensionFunctions(exts: org.apache.spark.sql.SparkSessionExtensions,
                              spark: SparkSession): Unit =
    exts.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
}
