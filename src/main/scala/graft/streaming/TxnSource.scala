package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.operators.Txn

/** ENGINE-NATIVE streaming source over a [[Txn]] table —
  * `spark.readStream.format("graft-txn").option("path", root).load()`
  * — the API skin [[TxnTail]]'s caller-driven drain loop leaves open:
  * real pipelines expect Spark's OWN offset log (checkpointed,
  * kill-and-resume through `checkpointLocation`), trigger semantics
  * (ProcessingTime / AvailableNow), and rate limiting — not a
  * hand-rolled cursor. This is Delta's streaming-source shape: the
  * commit VERSION is the offset, each micro-batch is the change feed
  * of a commit span.
  *
  *  - OFFSETS are commit versions ([[LongOffset]]); batch (start,
  *    end] reads [[Txn.readChangesCdf]] over exactly that span — cost
  *    bounded by the span's touched files (manifest-delta CDF), never
  *    a table rescan, and rewrite commits feed their self-cancelling
  *    delete+insert instead of silently re-feeding rows.
  *  - `maxCommitsPerTrigger` bounds a micro-batch (default 100): the
  *    available offset advances at most that many versions past the
  *    last batch, so a consumer attaching to a deep history pages
  *    through it instead of reading the whole log as batch 0.
  *  - The rows carry the table's CURRENT schema plus `_change_type`
  *    ('insert' | 'delete') and `_commit_version` — the CDF contract;
  *    batches PROJECT onto the schema captured at stream start, so an
  *    upstream schema evolution mid-stream NULL-fills (add-column)
  *    instead of shifting columns under the consumer.
  *  - Exactly-once is Spark's: the offset log records the span before
  *    the batch commits, and a replayed batch re-reads the SAME span
  *    (CDF over manifests is deterministic). Pair with an idempotent
  *    sink (e.g. [[graft.sinks]]' TxnSink / foreachBatch +
  *    commitAppendIdempotent) for end-to-end exactly-once.
  *
  * Retention caveat (Delta draws the same line): [[Txn
  * .expireManifests]] must keep the stream's cursor version readable —
  * expiring below an active checkpoint's offset fails the next batch
  * loudly.
  *
  * V1 `Source` rather than a DSv2 `MicroBatchStream` by design: a DSv2
  * reader must produce `InternalRow`s per input partition — i.e.
  * re-implement a parquet reader — while `getBatch`'s DataFrame
  * contract lets the span's files plan through Spark's own parquet
  * scan exactly like the batch CDF read (FileStreamSource and
  * DeltaSource make the same choice; the one internal seam this
  * needs is documented at [[org.apache.spark.sql.graft.SqlShims]]). */
final class TxnSource(spark: SparkSession, root: String,
    maxCommitsPerTrigger: Int) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  require(maxCommitsPerTrigger >= 1,
    s"maxCommitsPerTrigger must be >= 1: $maxCommitsPerTrigger")

  import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit}

  override val schema: StructType = TxnSource.schemaFor(spark, root)

  // Trigger.AvailableNow fixes its target head at prepare time (the
  // FileStreamSource discipline): batches page up to THIS head and the
  // query stops, even if commits keep landing mid-drain.
  private var fixedHead: Option[Long] = None

  private def versionOf(o: OffsetV2): Long = o match {
    case LongOffset(v) => v
    case other => other.json().trim.toLong // SerializedOffset replay
  }

  override def prepareForTriggerAvailableNow(): Unit =
    fixedHead = Some(Txn.currentVersion(spark, root).toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: the next batch ends at most
    * `maxCommitsPerTrigger` versions past the last committed offset,
    * capped at the AvailableNow-fixed head when one is set. */
  override def latestOffset(startOffset: OffsetV2,
      limit: ReadLimit): OffsetV2 = {
    val start =
      if (startOffset == null) 0L else versionOf(startOffset)
    val head = fixedHead.getOrElse(Txn.currentVersion(spark, root).toLong)
    LongOffset(math.min(head, start + maxCommitsPerTrigger))
  }

  override def initialOffset(): OffsetV2 = LongOffset(0L)

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source " +
        "(SupportsAdmissionControl)")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val since = start.map(versionOf(_)).getOrElse(0L)
    val until = versionOf(end)
    val steps =
      if (until <= since) Nil
      else Txn.cdfStepFrames(spark, root, since.toInt, until.toInt)
    if (steps.isEmpty)
      return org.apache.spark.sql.graft.SqlShims
        .emptyStreamingFrame(spark, schema)
    val cdf = steps.reduce(_.unionByName(_, allowMissingColumns = true))
    // project onto the STREAM's fixed schema: columns added upstream
    // mid-stream NULL-fill, renames/retypes fail loudly at the cast
    val projected = cdf.select(schema.fields.map { f =>
      if (cdf.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    org.apache.spark.sql.graft.SqlShims.asStreamingFrame(spark, projected)
  }

  override def stop(): Unit = ()
}

object TxnSource {
  /** The stream schema: the table's committed schema at attach time
    * plus the CDF meta columns. ONE small manifest read
    * ([[Txn.committedSchema]]) — never a snapshot-scan construction;
    * `read().schema` remains only as the pre-schema-manifest fallback.
    * (Attachment reads this twice — sourceSchema and createSource —
    * so a mergeSchema commit racing that window can, like
    * FileStreamSource's own double-resolve, surface as an analysis
    * error at batch 0; re-attach picks up the evolved schema.) */
  def schemaFor(spark: SparkSession, root: String): StructType = {
    val head = Txn.currentVersion(spark, root)
    require(head >= 1,
      s"graft-txn source: no committed version at $root — create the " +
        "table (one commit) before attaching a stream")
    val committed = Txn.committedSchema(spark, root, head)
      .getOrElse(Txn.read(spark, root, Some(head)).schema)
    StructType(committed.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", IntegerType)))
  }
}

/** `format("graft-txn")` registration (service-loaded through
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister). */
final class TxnSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-txn"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "graft-txn source requires .option(\"path\", <txn table root>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      schema.getOrElse(
        TxnSource.schemaFor(sqlContext.sparkSession, rootOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxnSource(sqlContext.sparkSession, rootOf(parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toInt).getOrElse(100))
}
