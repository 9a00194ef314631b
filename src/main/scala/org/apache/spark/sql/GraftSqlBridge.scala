package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal access bridge into the `private[sql]` constructors the
  * custom-operator path needs (SURVEY.md §7.4 preference (c): a custom
  * LogicalPlan + SparkStrategy + SparkPlan). Spark extension libraries
  * conventionally host this shim inside the `org.apache.spark.sql`
  * package; everything referenced is public Spark source. Spark 4
  * splits the API: the concrete implementations live in
  * `org.apache.spark.sql.classic`.
  */
object GraftSqlBridge {

  /** DataFrame over an arbitrary (resolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a Column (Spark 4 Columns carry a
    * ColumnNode; this resolves it the way classic Dataset ops do). */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Idempotently add a planner strategy to a live session (the
    * runtime-mutable path; GraftExtensions also injects it at
    * session-construction time for config-wired sessions). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Idempotently add an optimizer rule to a live session (same dual
    * path as addStrategy; GraftExtensions injects for config-wired
    * sessions). */
  def addOptimization(
      spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(r))
      cs.experimental.extraOptimizations = cs.experimental.extraOptimizations :+ r
  }
}
