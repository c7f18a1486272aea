package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * The one `private[sql]` doorway graft's plan-level rewrites need:
 * `Dataset.ofRows` turns a hand-built `LogicalPlan` back into a
 * `DataFrame` (analyzer + optimizer run as usual). Spark exposes every
 * other piece of the rewrite surface publicly (`df.queryExecution`,
 * Catalyst node constructors); wrapping a plan as a Dataset is the only
 * step gated to the `org.apache.spark.sql` package, hence this bridge
 * object — the standard extension-library pattern for plan surgery.
 */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a hand-built Catalyst expression as a `Column` (the 4.x Column
    * is a ColumnNode facade; `ExpressionUtils.column` is the sanctioned
    * classic-backend adapter, `private[sql]` like `ofRows`). Used by the
    * percentile planner to ride original aggregate FUNCTIONS (sum/avg/
    * min/max/..., children remapped onto melted columns) through the
    * DataFrame aggregation in `Percentiles.finish`. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
