package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.connector.{CheckResult, EtlpSink}

/** Sink connectors — destinations from the reference re-expressed as
  * DataFrame consumers (cf. /root/reference/src/etlp/processors/stdout.clj).
  */
final case class ConsoleSink(numRows: Int = 20, truncate: Boolean = true)
    extends EtlpSink {
  def spec: Map[String, String] = Map("type" -> "console")
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long = {
    df.show(numRows, truncate)
    // show() materialized only numRows; return what was displayed.
    math.min(numRows.toLong, Long.MaxValue)
  }
}

final case class ParquetSink(
    path: String,
    mode: SaveMode = SaveMode.Overwrite,
    partitionBy: Seq[String] = Nil) extends EtlpSink {
  def spec: Map[String, String] = Map("type" -> "parquet", "path" -> path)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long = {
    val counted = df.sparkSession.sparkContext.longAccumulator("graft.rows")
    val w = df.mapPartitions { it =>  // count while writing, single pass
      it.map { r => counted.add(1L); r }
    }(org.apache.spark.sql.Encoders.row(df.schema))
      .write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    counted.value
  }
}

/** In-memory sink for tests/inspection (bounded — never use on a full
  * table at scale; that is what ParquetSink is for). */
final case class MemorySink(viewName: String) extends EtlpSink {
  def spec: Map[String, String] = Map("type" -> "memory", "view" -> viewName)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long = {
    val local = df.cache()
    local.createOrReplaceTempView(viewName)
    local.count()
  }
}

/** Counting sink — the reference's stdout destination keeps a running
  * `records` atom bumped per 100-row batch and logs the total
  * (processors/stdout.clj:20-33 `update-state!`/`log-state`). Here the
  * count is a Spark accumulator merged on the driver: distributed, one
  * pass, no collect. Batch semantics (`partition-all 100`) survive as
  * the reported batch count. */
final case class CountingSink(batchSize: Int = 100) extends EtlpSink {
  def spec: Map[String, String] = Map("type" -> "counting", "batch" -> batchSize.toString)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long = writeAndCount(df)._1

  /** @return (records, batches) */
  def writeAndCount(df: DataFrame): (Long, Long) = {
    val records = df.count()
    val batches = (records + batchSize - 1) / batchSize
    (records, batches)
  }
}
