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

  /** Release the executor blocks held by a `localCheckpoint()`ed frame.
    * The checkpoint persists its internal RDD (MEMORY_AND_DISK) outside
    * the cache manager, so `Dataset.unpersist` cannot reach it; an
    * iterative algorithm that checkpoints per round (lineage truncation)
    * must free superseded generations or storage grows by one full copy
    * per round. No-op for non-checkpointed plans. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
