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
    // mid-stream NULL-fill; a renamed column NULL-fills too (its old
    // name vanished); a mid-stream WIDENING (int → long) is cast back
    // down to the attach-time type — in-range values narrow silently,
    // and only an actually-overflowing value throws under ANSI.
    // Consumers wanting the evolved shape restart the query (the
    // restart re-resolves the schema; spec-pinned).
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

/** ENGINE-NATIVE streaming SINK over a [[Txn]] table —
  * `writeStream.format("graft-txn").option("path", root)` — the write
  * half of the source above, completing the pair so a Txn → transform
  * → Txn pipeline is pure engine API with zero hand-rolled foreachBatch
  * loops. Each micro-batch is ONE [[Txn.commitAppendIdempotent]] with
  * tag `<appId>-<batchId>`: Spark's offset log prevents re-DELIVERY of
  * a committed batch, and the manifest's `#txn` tag set prevents
  * re-COMMIT of a delivered-then-crashed one (the write could land
  * before the sink's progress does), so the pair is exactly-once end
  * to end — Delta's DeltaSink txnVersion/appId discipline. `appId`
  * comes from `.option("txnAppId", ...)` (falling back to the query's
  * checkpointLocation, which is exactly as stable as the batch-id
  * sequence itself); distinct queries writing one table need distinct
  * appIds. Append output mode only — Update/Complete would need
  * merge/overwrite semantics a log-structured table sink should get
  * from an explicit foreachBatch + commitMerge instead. */
final class TxnStreamSink(spark: SparkSession, root: String,
    appId: String, partitionBy: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incremental frame re-wraps as a batch frame (SqlShims — the
    // sink-side twin of the source's isStreaming re-flag)
    val batch = org.apache.spark.sql.graft.SqlShims
      .asBatchFrame(spark, data)
    Txn.commitAppendIdempotent(spark, root, batch,
      s"$appId-$batchId", partitionBy)
    ()
  }
  override def toString: String = s"TxnStreamSink[$root]"
}

/** `format("graft-txn")` registration (service-loaded through
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister). */
final class TxnSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-txn"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "graft-txn source requires .option(\"path\", <txn table root>)"))

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-txn sink supports Append output mode only, got $outputMode " +
        "— aggregating queries should land through foreachBatch + " +
        "commitMerge (a log-structured append sink cannot upsert)")
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(sys.error("graft-txn sink requires a stable identity " +
        "for its idempotence tags: .option(\"txnAppId\", <id>) or a " +
        "checkpointLocation"))
    new TxnStreamSink(sqlContext.sparkSession, rootOf(parameters),
      appId, partitionColumns)
  }

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
