package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.connector.{CheckResult, EtlpSink}

/** Bucketed table sink: co-locates data by join key at WRITE time so
  * repeated joins/aggregations on that key skip their shuffle entirely.
  *
  * At 100 TB the same fact↔fact join runs daily; paying one bucketed
  * write turns every subsequent join on `bucketCols` into a zip of
  * pre-partitioned buckets (SortMergeJoin with NO Exchange — verified
  * by plan assertion in ScaleOpsSpec). Bucket count should match the
  * cluster's target parallelism for the table (e.g. table-size /
  * 256 MB), and both join sides must agree on it.
  *
  * Spark constraint: bucketing metadata lives in the catalog, so this
  * sink writes a managed table (`saveAsTable`), not a bare path.
  */
final case class BucketedParquetSink(
    table: String,
    bucketCols: Seq[String],
    numBuckets: Int,
    sortCols: Seq[String] = Nil,
    mode: SaveMode = SaveMode.Overwrite) extends EtlpSink {
  require(bucketCols.nonEmpty && numBuckets > 0)

  def spec: Map[String, String] = Map(
    "type" -> "parquet-bucketed", "table" -> table,
    "buckets" -> numBuckets.toString, "by" -> bucketCols.mkString(","))

  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")

  def write(df: DataFrame): Long =
    SinkMetrics.writeCounted(df) { observed =>
      val w = observed.write.mode(mode).format("parquet")
        .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
        .saveAsTable(table)
    }
}
