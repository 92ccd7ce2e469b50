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
final case class ParquetSource(path: String, mergeSchema: Boolean = false)
    extends PathSource {
  def spec: Map[String, String] =
    Map("type" -> "parquet", "path" -> path,
      "mergeSchema" -> mergeSchema.toString)
  // mergeSchema: reconcile files written under evolving schemas (new
  // nullable columns arrive as NULL in old files). Off by default — the
  // merge pass reads every file's footer up front, which a fixed-schema
  // 100 TB scan shouldn't pay.
  def read(spark: SparkSession): DataFrame =
    spark.read.option("mergeSchema", mergeSchema.toString).parquet(path)
}

/** ORC source — the other first-class columnar lake format (vectorized
  * reader, predicate pushdown and column pruning like parquet; the right
  * interchange point for Hive-era estates migrating to this engine). */
final case class OrcSource(path: String) extends PathSource {
  def spec: Map[String, String] = Map("type" -> "orc", "path" -> path)
  def read(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** CSV source with first-class malformed-row handling. `mode` is the
  * standard reader policy — PERMISSIVE (default: bad rows surface with
  * nulls and, when `corruptColumn` is set, the raw line in that
  * column), DROPMALFORMED (silently drop), FAILFAST (abort the scan on
  * the first bad row). With `corruptColumn` set under PERMISSIVE the
  * source becomes an error-channel feed: `where(col(c).isNotNull)` is
  * the dead-letter stream, `where(col(c).isNull)` the clean one (the
  * reference's wrap-error routing, cf. /root/reference/src/etlp/
  * core.clj) — all three policies stay one distributed scan, nothing
  * driver-side. The corrupt column requires an explicit `schema` (it is
  * appended automatically; Spark only populates it when the schema
  * declares it). */
final case class CsvSource(
    path: String,
    header: Boolean = true,
    inferSchema: Boolean = false,
    schema: Option[StructType] = None,
    delimiter: String = ",",
    mode: String = "PERMISSIVE",
    corruptColumn: Option[String] = None) extends PathSource {
  require(Set("PERMISSIVE", "DROPMALFORMED", "FAILFAST")(mode.toUpperCase),
    s"mode must be PERMISSIVE|DROPMALFORMED|FAILFAST: $mode")
  require(corruptColumn.isEmpty || schema.nonEmpty,
    "corruptColumn needs an explicit schema (Spark populates " +
      "columnNameOfCorruptRecord only when the schema declares it)")
  def spec: Map[String, String] =
    Map("type" -> "csv", "path" -> path, "header" -> header.toString,
      "mode" -> mode.toUpperCase) ++
      corruptColumn.map("corruptColumn" -> _)
  def read(spark: SparkSession): DataFrame = {
    val r0 = spark.read
      .option("header", header)
      .option("delimiter", delimiter)
      .option("inferSchema", inferSchema)
      .option("mode", mode.toUpperCase)
    val r = corruptColumn.fold(r0)(c =>
      r0.option("columnNameOfCorruptRecord", c))
    val withCorrupt = (schema, corruptColumn) match {
      case (Some(s), Some(c)) => Some(s.add(c,
        org.apache.spark.sql.types.StringType, nullable = true))
      case _ => schema
    }
    withCorrupt.fold(r)(r.schema).csv(path)
  }
}

/** Object-store source — the reference README's headline example reads
  * S3 (`create-s3-source!` with s3-config/bucket/prefix). On Spark an
  * object store is just another Hadoop filesystem: `s3a://bucket/prefix`
  * (or gs://, abfss://, file://) flows through the same listing / split
  * planning / scan machinery as HDFS, so this source adds exactly what
  * the reference's config surface has — bucket+prefix addressing and a
  * per-source reader-options map (credentials and endpoint belong in
  * the cluster's Hadoop conf, e.g. `fs.s3a.*`; per-source OPTIONS here
  * are format-reader options like mergeSchema/header). Zero-egress
  * environments exercise it against `file://` — the code path is
  * identical, only the scheme differs. */
final case class ObjectStoreSource(
    bucket: String,
    prefix: String,
    scheme: String = "s3a",
    format: String = "parquet",
    options: Map[String, String] = Map.empty) extends PathSource {
  require(bucket.nonEmpty, "empty bucket")
  def path: String = {
    val p = prefix.stripPrefix("/")
    // file:// has no bucket authority — the "bucket" is the root dir
    if (scheme == "file") s"file:///${bucket.stripPrefix("/")}/$p"
    else s"$scheme://$bucket/$p"
  }
  def spec: Map[String, String] =
    Map("type" -> "object-store", "scheme" -> scheme, "bucket" -> bucket,
      "prefix" -> prefix, "format" -> format) ++ options
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.options(options)
    format match {
      case "parquet" => r.parquet(path)
      case "orc"     => r.orc(path)
      case "csv"     => r.csv(path)
      case "jsonl" | "json" => r.json(path)
      case "text"    => r.text(path)
      case other     => throw new IllegalArgumentException(s"format: $other")
    }
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

/** Fixed-width text source — the mainframe/EDI wire format CSV-era
  * estates still ship (COBOL copybook layouts). Each field is
  * (name, start 1-based, width, sqlType); parsing is
  * SUBSTRING + TRIM + CAST — all codegen'd into the scan stage, no
  * per-record interpreter, column pruning intact (unreferenced fields
  * are dropped before the substring ever runs). Blank-padded fields
  * become NULL via NULLIF; malformed values go NULL via TRY_CAST (the
  * CSV source's PERMISSIVE default — route rows through an
  * ErrorChannel guard upstream when they must fail loudly). */
final case class FixedWidthSource(path: String,
    fields: Seq[(String, Int, Int, String)]) extends PathSource {
  require(fields.nonEmpty, "fixed-width layout needs at least one field")
  fields.foreach { case (n, s, w, _) =>
    require(s >= 1 && w >= 1, s"field $n: start must be >= 1, width >= 1") }
  def spec: Map[String, String] =
    Map("type" -> "fixed-width", "path" -> path,
      "layout" -> fields.map { case (n, s, w, t) => s"$n:$s:$w:$t" }
        .mkString(","))
  def read(spark: SparkSession): DataFrame =
    spark.read.text(path).select(fields.map { case (n, st, w, t) =>
      expr(s"TRY_CAST(NULLIF(TRIM(SUBSTRING(value, $st, $w)), '') AS $t)").as(n)
    }: _*)
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

/** Process-stdin source — the reference's stdin processor
  * (/root/reference/src/etlp/processors/stdin.clj: `lines-reducible`
  * over `*in*`). Driver-side by nature: stdin exists only on the
  * submitting process, so lines are read once there and parallelized
  * out; `maxLines` bounds driver memory. On a cluster, land stdin to
  * files and use [[TextLineSource]] — this source exists for parity
  * with the reference's pipe-into-the-process dev workflow. Reads via
  * `Console.in` so tests can inject input with `Console.withIn`. */
final case class StdinSource(maxLines: Int = 1000000) extends EtlpSource {
  def spec: Map[String, String] = Map("type" -> "stdin")
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def discover(spark: SparkSession): StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("line",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType)))
  def read(spark: SparkSession): DataFrame = {
    val lines = Iterator.continually(Console.in.readLine())
      .takeWhile(_ != null).take(maxLines).toSeq
    import spark.implicits._
    lines.toDF("line").select(col("line"), lit("stdin").as("file"))
  }
}

/** Source defined by a producer function — the registry's `process-fn`
  * closure analogue (a processor may close over config/mappings and
  * synthesize its frame however it likes). */
final case class FnSource(
    spec: Map[String, String],
    producer: SparkSession => DataFrame) extends EtlpSource {
  def check(spark: SparkSession): CheckResult =
    try { producer(spark).schema; CheckResult(valid = true, "ok") }
    catch { case e: Exception => CheckResult(valid = false, String.valueOf(e.getMessage)) }
  def discover(spark: SparkSession): StructType = producer(spark).schema
  def read(spark: SparkSession): DataFrame = producer(spark)
}

/** Transport verbs of the reference's async bulk-export protocol
  * (processors/http.clj:12-16 `AsyncHTTP`: start / check / list! /
  * download). Implementations own the wire; the source owns the state
  * machine. Zero-egress environment: [[FsBulkTransport]] is the
  * reference implementation (a filesystem-backed job), and a real HTTP
  * transport would implement the same four verbs with a client —
  * download is intentionally NOT a transport verb here, because at
  * 100 TB payload bytes must flow executor-side (a distributed scan of
  * the listed resources), never through the driver.
  */
trait BulkTransport extends Serializable {
  /** Kick off the export job (`prefer: respond-async` POST in the
    * reference); returns the job's status location (Content-Location). */
  def start(apiUrl: String): String
  /** One status poll: (httpStatus, progress) — 202 while running
    * (X-Progress header), 200 when the export is complete. */
  def check(location: String): (Int, String)
  /** List the completed job's output resources. */
  def list(location: String): Seq[String]
}

/** Filesystem-backed bulk "server": the job is a directory of staged
  * resource files; readiness is simulated by requiring `readyAfterPolls`
  * status probes before reporting 200 — which exercises the real
  * poll loop (the reference polls every 5 s on status 202,
  * processors/http.clj:42-61) without a network. */
final class FsBulkTransport(readyAfterPolls: Int = 0) extends BulkTransport {
  private val polls = new java.util.concurrent.atomic.AtomicInteger(0)
  def pollCount: Int = polls.get()
  def start(apiUrl: String): String = apiUrl
  def check(location: String): (Int, String) = {
    val n = polls.incrementAndGet()
    if (n > readyAfterPolls) (200, "complete")
    else (202, s"${(n * 100) / (readyAfterPolls + 1)}%")
  }
  def list(location: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(location)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
      .filterNot(_.split('/').last.startsWith("_")).sorted
  }
}

/** Async HTTP bulk-export source — the reference's AsyncHTTPResource
  * flow (processors/http.clj:19-95): start → poll check until 200 →
  * list → read. Spark-first split of responsibilities: the driver runs
  * only the *control* loop (start/poll/list — metadata), and the
  * *data* path is a distributed scan over the listed resources, so
  * payload never transits the driver (the reference's `download` slurps
  * the body into driver memory — a non-starter at 100 TB).
  */
final case class HttpBulkSource(
    apiUrl: String,
    format: String = "jsonl",
    transport: BulkTransport,
    pollIntervalMs: Long = 5000,
    maxPolls: Int = 120) extends EtlpSource {
  def spec: Map[String, String] = Map("type" -> "http-bulk", "url" -> apiUrl)

  /** The export job is started AT MOST ONCE per source instance while
    * it stays alive — `check`, `discover` and `read` all poll the same
    * job location (the reference's verbs operate on one
    * Content-Location too); without this, a routine check→discover→read
    * flow would kick off three server-side export jobs. A 404 (job
    * expired/GC'd server-side) clears the memo so the next verb starts
    * a FRESH job instead of failing forever. Driver-only state
    * (`@transient`): executors never talk to the control plane. */
  @transient private var memoLocation: Option[String] = None
  private def location: String = synchronized {
    memoLocation.getOrElse {
      val l = transport.start(apiUrl)
      memoLocation = Some(l)
      l
    }
  }

  /** Drive the control-plane state machine to completion; returns the
    * listed resource paths. Fails (rather than hangs) after `maxPolls`. */
  def awaitListing(): Seq[String] = {
    val loc = location
    var status = 0
    var n = 0
    while (status != 200) {
      val (s, progress) = transport.check(loc)
      status = s
      n += 1
      if (status == 404) {
        synchronized { memoLocation = None } // expired job: restart next call
        throw new java.io.FileNotFoundException(loc)
      }
      if (status != 200) {
        if (n >= maxPolls) throw new IllegalStateException(
          s"bulk job not ready after $n polls (last: $status $progress)")
        Thread.sleep(pollIntervalMs)
      }
    }
    transport.list(loc)
  }

  def check(spark: SparkSession): CheckResult = {
    val (s, progress) = transport.check(location)
    if (s == 200 || s == 202) CheckResult(valid = true, s"$s $progress")
    else CheckResult(valid = false, s"status $s")
  }
  def discover(spark: SparkSession): StructType = read(spark).schema
  def read(spark: SparkSession): DataFrame = {
    val resources = awaitListing()
    require(resources.nonEmpty, s"bulk job listed no resources: $apiUrl")
    val r = spark.read
    format match {
      case "jsonl"   => r.json(resources: _*).withColumn("file", input_file_name())
      case "text"    => r.text(resources: _*)
                          .select(col("value").as("line"), input_file_name().as("file"))
      case "csv"     => r.option("header", "true").csv(resources: _*)
      case "parquet" => r.parquet(resources: _*)
      case other     => throw new IllegalArgumentException(s"format: $other")
    }
  }
}

/** JDBC table source — the reference's Postgres SOURCE half (README
  * `create-postgres-source!`: pg-config + table), completing the JDBC
  * round-trip whose sink half is [[graft.sinks.JdbcSink]]. Spark-first:
  * `spark.read.jdbc` keeps the scan declarative, so two scale
  * properties come free and are spec-asserted against embedded Derby:
  *
  *  - **predicate/column pushdown**: filters and projections on the
  *    returned frame compile into the remote `WHERE`/`SELECT` — the
  *    DATABASE prunes rows before they cross the wire (the scan node
  *    shows `PushedFilters`), instead of Spark filtering after a full
  *    table fetch;
  *  - **partitioned reads**: with `partitionColumn` + bounds, the scan
  *    becomes `numPartitions` parallel range-predicate queries — N
  *    executors each own a slice, the 100 TB shape (a single-connection
  *    read caps at one machine's wire speed). Bounds only steer the
  *    split points; rows outside them are still read (Spark's
  *    first/last-partition semantics), so the split is never lossy.
  *
  * `fetchSize` is the per-round-trip row batch (the read-side analogue
  * of the sink's `batchSize`). */
final case class JdbcSource(
    url: String,
    table: String,
    properties: Map[String, String] = Map.empty,
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Int = 1,
    fetchSize: Int = 1000) extends EtlpSource {
  require(partitionColumn.isEmpty ||
    (lowerBound.nonEmpty && upperBound.nonEmpty && numPartitions >= 1),
    "partitionColumn needs lowerBound, upperBound and numPartitions")
  def spec: Map[String, String] =
    Map("type" -> "jdbc", "url" -> url, "table" -> table) ++
      partitionColumn.map("partitionColumn" -> _) +
      ("numPartitions" -> numPartitions.toString)
  def check(spark: SparkSession): CheckResult =
    if (!url.startsWith("jdbc:"))
      CheckResult(valid = false, s"not a jdbc url: $url")
    else if (table.isEmpty) CheckResult(valid = false, "empty table name")
    else CheckResult(valid = true, "ok")
  def discover(spark: SparkSession): StructType = read(spark).schema
  def read(spark: SparkSession): DataFrame = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("fetchsize", fetchSize.toString)
    partitionColumn match {
      case Some(c) => spark.read.jdbc(url, table, c,
        lowerBound.get, upperBound.get, numPartitions, props)
      case None => spark.read.jdbc(url, table, props)
    }
  }
}
