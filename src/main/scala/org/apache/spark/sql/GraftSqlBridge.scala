package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Minimal bridge into `private[sql]` constructors — the standard pattern
  * for third-party plan extensions (a custom `LogicalPlan` must be
  * wrapped back into a `DataFrame`, and `Dataset.ofRows` is package
  * private). Nothing here but the two one-liners. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
}
