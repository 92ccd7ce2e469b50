package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `sql` package: `Dataset.ofRows` is
  * private[sql], and wrapping a custom LogicalPlan (graft.plans.*) into
  * a DataFrame requires it. Standard extension-library technique; no
  * Spark internals are modified.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
