package graft.sinks

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
import graft.connector.{CheckResult, EtlpSink}

private[graft] object SinkMetrics {
  /** Count rows while writing, in the SAME job: an `observe()` node
    * (CollectMetrics) rides the write's execution, so there is no second
    * pass over the input and the value comes from the completed query —
    * not from per-task accumulator updates, which task retries and
    * speculative execution can double-count (transform-side accumulators
    * have at-least-once semantics; at 100 TB retries are routine). */
  def writeCounted(df: DataFrame)(write: DataFrame => Unit): Long = {
    val obs = Observation()
    write(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }
}

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

/** Transactional table sink: every write is one ATOMIC manifest commit
  * ([[graft.operators.Txn]]) — readers mid-write see the previous
  * snapshot, versions stay time-travelable, and `append` mode gets the
  * commit-point schema gate. The connector-registry route into the
  * lakehouse layer: `source → xform → TxnSink` makes any registered
  * flow's output a versioned table instead of a bare directory. */
final case class TxnSink(
    root: String,
    mode: SaveMode = SaveMode.Overwrite,
    partitionBy: Seq[String] = Nil,
    statsCol: Option[String] = None) extends EtlpSink {
  require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
    s"TxnSink supports Overwrite/Append, got $mode")
  def spec: Map[String, String] =
    Map("type" -> "txn", "root" -> root, "mode" -> mode.toString)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long =
    SinkMetrics.writeCounted(df) { observed =>
      if (mode == SaveMode.Overwrite)
        graft.operators.Txn.commitOverwrite(observed.sparkSession, root,
          observed, partitionBy, statsCol = statsCol)
      else
        graft.operators.Txn.commitAppend(observed.sparkSession, root,
          observed, partitionBy, statsCol = statsCol)
      ()
    }
}

final case class ParquetSink(
    path: String,
    mode: SaveMode = SaveMode.Overwrite,
    partitionBy: Seq[String] = Nil) extends EtlpSink {
  def spec: Map[String, String] = Map("type" -> "parquet", "path" -> path)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long =
    SinkMetrics.writeCounted(df) { observed =>
      val w = observed.write.mode(mode)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(path)
    }
}

/** Dynamic-partition-overwrite sink — INSERT OVERWRITE of only the
  * partitions present in the batch: the write-side sibling of the
  * changelog family (upsert/CDC/SCD2). A daily re-run replaces just the
  * recomputed day's directory and leaves every other partition's files
  * untouched — at 100 TB the difference between rewriting a table and
  * rewriting 1/365th of it. Implemented with Spark's
  * `partitionOverwriteMode=dynamic` (set for this write only, previous
  * value restored), so concurrent readers of untouched partitions are
  * never disturbed. `maxRecordsPerFile` bounds output file size; the
  * input should arrive repartitioned by the partition columns for
  * file-count control (see Corpus.exportShards for the same
  * discipline). */
final case class PartitionOverwriteSink(
    path: String,
    partitionBy: Seq[String],
    maxRecordsPerFile: Long = 0L) extends EtlpSink {
  require(partitionBy.nonEmpty,
    "PartitionOverwriteSink needs partition columns (for a full-table " +
      "overwrite use ParquetSink)")
  def spec: Map[String, String] =
    Map("type" -> "parquet-partition-overwrite", "path" -> path,
      "partitions" -> partitionBy.mkString(","))
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try SinkMetrics.writeCounted(df) { observed =>
      observed.write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(partitionBy: _*).parquet(path)
    } finally spark.conf.set(key, prev)
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
  * `partition-all` batching analogue). No Postgres exists in this
  * zero-egress container, but the write path IS exercised end-to-end
  * against embedded Derby (ships with Spark) in ConnectorSpec —
  * create-table, batched inserts, append/overwrite modes, and the
  * observe()-metric row count all run for real. */
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
    // single pass: the observe() metric rides the insert job — no
    // re-computation of the upstream plan to report rows written
    SinkMetrics.writeCounted(df)(_.write.mode(mode).jdbc(url, table, props))
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
  * count is one distributed `count()` action (Catalyst collapses it to
  * partial counts merged on the driver — no collect of rows). Batch
  * semantics (`partition-all 100`) survive as the reported batch count. */
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
