package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.connector.{CheckResult, EtlpSource}

/** Source connectors — the reference's processors re-expressed as lazy
  * DataFrame producers (cf. /root/reference/src/etlp/processors/stdin.clj,
  * utils/reducers.clj). Every source keeps the scan declarative so
  * Catalyst retains column pruning + predicate pushdown; none of them
  * collect to the driver.
  */
private[sources] trait PathSource extends EtlpSource {
  def path: String
  def check(spark: SparkSession): CheckResult = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) CheckResult(valid = true, "ok")
    else CheckResult(valid = false, s"path not found: $path")
  }
  def discover(spark: SparkSession): StructType = read(spark).schema
}

/** Columnar lake source (the 100 TB workhorse). `path` is any
  * Hadoop-filesystem URI — `s3a://bucket/prefix` covers the reference's
  * S3 source (README `create-s3-source!`) with zero extra code: listing,
  * split planning and reads all go through the FileSystem API. */
final case class ParquetSource(path: String) extends PathSource {
  def spec: Map[String, String] = Map("type" -> "parquet", "path" -> path)
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

final case class CsvSource(
    path: String,
    header: Boolean = true,
    inferSchema: Boolean = false,
    schema: Option[StructType] = None,
    delimiter: String = ",") extends PathSource {
  def spec: Map[String, String] =
    Map("type" -> "csv", "path" -> path, "header" -> header.toString)
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read
      .option("header", header)
      .option("delimiter", delimiter)
      .option("inferSchema", inferSchema)
    schema.fold(r)(r.schema).csv(path)
  }
}

/** Line-oriented text source — the reference's `lines-reducible`
  * (utils/reducers.clj:18): each line is one record, with the
  * originating file kept alongside (reducers.clj `parse-line` merges
  * `{:file f}`). */
final case class TextLineSource(path: String, recursive: Boolean = false)
    extends PathSource {
  def spec: Map[String, String] = Map("type" -> "text-lines", "path" -> path)
  def read(spark: SparkSession): DataFrame =
    spark.read
      .option("recursiveFileLookup", recursive)
      .text(path)
      .select(col("value").as("line"), input_file_name().as("file"))
}

/** JSONL source — the reference's `json-reducer` (utils/reducers.clj:44):
  * parse each line as JSON, merged with its source file. With an explicit
  * schema the parse is a single codegen'd `from_json`; without one we use
  * the DataFrameReader's schema inference (sampled). */
final case class JsonlSource(path: String, schema: Option[StructType] = None,
    recursive: Boolean = false) extends PathSource {
  def spec: Map[String, String] = Map("type" -> "jsonl", "path" -> path)
  def read(spark: SparkSession): DataFrame = schema match {
    case Some(s) =>
      graft.functions.Jsonl.parseLines(
        TextLineSource(path, recursive).read(spark), "line", s)
    case None =>
      spark.read.option("recursiveFileLookup", recursive).json(path)
        .withColumn("file", input_file_name())
  }
}

/** Whole-directory source — the reference's `parallel-directory-reducer`
  * (utils/reducers.clj:52): every file under a directory processed in
  * parallel. On Spark the file listing itself is distributed and the
  * per-file parallelism is the scan's split planning — no thread pool. */
final case class DirectorySource(
    path: String, format: String = "text", recursive: Boolean = true)
    extends PathSource {
  def spec: Map[String, String] =
    Map("type" -> "directory", "path" -> path, "format" -> format)
  def read(spark: SparkSession): DataFrame = format match {
    case "text"    => TextLineSource(path, recursive).read(spark)
    case "jsonl"   => JsonlSource(path, None, recursive).read(spark)
    case "parquet" => spark.read.option("recursiveFileLookup", recursive).parquet(path)
    case "csv"     => spark.read.option("recursiveFileLookup", recursive)
                        .option("header", "true").csv(path)
    case other     => throw new IllegalArgumentException(s"format: $other")
  }
}

/** Async HTTP bulk-export source — protocol port of the reference's
  * AsyncHTTPResource (processors/http.clj:19-95: start → poll check →
  * list → download). This environment is zero-egress, so transport is
  * pluggable: `fetch` maps a resource URL to a local staging path, and
  * the default stub treats the URL as a path. The Spark-side shape is
  * the real design: the *listing* becomes a DataFrame, and each listed
  * resource is read by a distributed scan — the driver never downloads
  * payload bytes (at 100 TB the driver only sees metadata).
  */
final case class HttpBulkSource(
    apiUrl: String,
    format: String = "jsonl",
    fetch: String => String = identity) extends EtlpSource {
  def spec: Map[String, String] = Map("type" -> "http-bulk", "url" -> apiUrl)
  /** start+poll collapse to a single readiness probe in the stub. */
  def check(spark: SparkSession): CheckResult =
    DirectorySource(fetch(apiUrl), format).check(spark)
  def discover(spark: SparkSession): StructType = read(spark).schema
  def read(spark: SparkSession): DataFrame =
    DirectorySource(fetch(apiUrl), format).read(spark)
}
