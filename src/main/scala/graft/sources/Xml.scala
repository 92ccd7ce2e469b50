package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.connector.{CheckResult, EtlpSink}

/** XML connector over Spark 4's BUILT-IN `xml` data source (the
  * spark-xml lineage merged into core SQL): one row per `rowTag`
  * element, distributed parse, schema inferred from the elements or
  * supplied explicitly. Rounds out the record-container formats the
  * engine lands (CSV / JSONL / fixed-width / ORC / Avro / XML) — the
  * reference's record processors are format-agnostic channels
  * (/root/reference/src/etlp/utils/reducers.clj parses whatever the
  * reducer yields), so an etlp user's XML feeds need a first-class
  * landing path here too.
  *
  * Pass `schema` for production reads: inference scans the data once
  * extra and can narrow types on skewed samples; with a schema the
  * read is single-pass and column-pruned like any file scan. */
final case class XmlSource(path: String, rowTag: String,
    schema: Option[StructType] = None) extends PathSource {
  def spec: Map[String, String] =
    Map("type" -> "xml", "path" -> path, "rowTag" -> rowTag)
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.option("rowTag", rowTag).format("xml")
    schema.fold(r)(s => r.schema(s)).load(path)
  }
}

/** Writes one XML document per partition (`rootTag` wrapping `rowTag`
  * elements) through the built-in writer. */
final case class XmlSink(path: String, rowTag: String,
    rootTag: String = "rows") extends EtlpSink {
  def spec: Map[String, String] =
    Map("type" -> "xml", "path" -> path, "rowTag" -> rowTag,
      "rootTag" -> rootTag)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")
  def write(df: DataFrame): Long =
    graft.sinks.SinkMetrics.writeCounted(df) { observed =>
      observed.write.mode("overwrite")
        .option("rowTag", rowTag).option("rootTag", rootTag)
        .format("xml").save(path)
    }
}
