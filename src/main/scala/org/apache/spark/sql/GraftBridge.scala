package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessor for the `private[sql]` Column↔Expression conversions in
  * Spark 4's classic API (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Needed to register dialect functions as native expression builders
  * (graft.functions.Registry) without any UDF indirection. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a transformed logical plan (`Dataset.ofRows` is
    * `private[sql]`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until queued listener-bus events are delivered
    * (`SparkContext.listenerBus` is `private[spark]`): task-metric
    * listeners (spill telemetry) are asynchronous, so a before/after
    * metric snapshot around a job must drain the bus on both sides.
    * `waitUntilEmpty` gives up after 10 s — a congested bus must not
    * turn a SUCCESSFUL materialization into a recorded failure, so a
    * timeout degrades to slightly-misattributed spill bytes instead of
    * propagating. */
  def drainListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => }
}
