package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** The two `private[sql]` touch points a V1 streaming Source needs —
  * isolated in an `org.apache.spark.sql` subpackage exactly the way
  * delta-spark hosts DeltaSource under `org.apache.spark.sql.delta`
  * (that placement IS the sanctioned third-party seam for sources
  * whose `getBatch` builds a DataFrame from file relations; Spark's
  * own FileStreamSource does the same flagging internally). Kept to
  * the absolute minimum: everything else in this repo lives under
  * `graft.*` and uses only public API.
  *
  * Why needed at all: `MicroBatchExecution` asserts that the frame a
  * V1 `Source.getBatch` returns has `isStreaming = true` ("DataFrame
  * returned by getBatch ... did not have isStreaming=true"), but a
  * frame assembled from parquet scans is a BATCH plan — its leaf
  * `LogicalRelation`s/`LogicalRDD`s must be re-flagged before handing
  * the plan back, and `Dataset.ofRows` (the only way to wrap a
  * LogicalPlan) is `private[sql]`. */
object SqlShims {
  /** `df`'s logical plan with every leaf file relation flagged
    * streaming — what a V1 `Source.getBatch` must return. The caller
    * guarantees the plan's only leaves are file relations (the
    * graft-txn source builds batches from bare CDF step frames,
    * never the typed empty-frame seed, whose RDD leaf has no
    * re-flaggable streaming bit). */
  def asStreamingFrame(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val plan: LogicalPlan = df.queryExecution.logical transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
    }
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
  }

  /** Re-materialize a STREAMING micro-batch frame as a BATCH frame a
    * V1 `Sink.addBatch` can hand to batch writers — the one seam a
    * sink needs, mirroring [[asStreamingFrame]]: the incremental
    * frame's physical rows re-wrap over its executed RDD (rows copied
    * out of the reused unsafe buffers), dropping the isStreaming flag
    * so `df.write`/Txn commits accept it (Spark's own console/foreach
    * sinks and delta-spark's DeltaSink do exactly this re-wrap). */
  def asBatchFrame(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = spark.asInstanceOf[SparkSession]
    s.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema,
      isStreaming = false)
  }

  /** An empty streaming-flagged frame with `schema` — the no-change
    * micro-batch. */
  def emptyStreamingFrame(spark: org.apache.spark.sql.SparkSession,
      schema: StructType): org.apache.spark.sql.DataFrame = {
    val s = spark.asInstanceOf[SparkSession]
    s.internalCreateDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
