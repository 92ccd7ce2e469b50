package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Record/log/error envelopes — the reference wraps every emitted record
  * in an Airbyte-ish JSON envelope `{type, timestamp, version, schema,
  * source_stream, data}` (/root/reference/src/etlp/utils/core.clj:4-20).
  *
  * Two encodings:
  *  - [[wrap]]: a typed struct + `to_json` — the idiomatic Spark form
  *    (schema'd, codegen'd, columnar until the final serialization).
  *  - [[canonicalJson]]: byte-stable JSON via string concat with a FIXED
  *    key order, for cross-engine comparison and content-hash dedup of
  *    envelopes. Both are pure Catalyst expressions — no UDF.
  *
  * The reference stamps wall-clock `System/currentTimeMillis`; that is
  * hostile to replayability (and to any content-addressed downstream), so
  * the event-time column is a parameter instead.
  */
object Envelope {
  val Version = "0.1.0"
  val Schema  = "etlp_raw"

  private def envelope(kind: String, timestampMs: Column, sourceStream: String,
      data: Column): Column =
    struct(
      lit(kind).as("type"),
      timestampMs.cast("long").as("timestamp"),
      lit(Version).as("version"),
      lit(Schema).as("schema"),
      lit(sourceStream).as("source_stream"),
      data.as("data"))

  def wrapRecord(timestampMs: Column, sourceStream: String, data: Column): Column =
    to_json(envelope("record", timestampMs, sourceStream, data))
  def wrapLog(timestampMs: Column, sourceStream: String, data: Column): Column =
    to_json(envelope("log", timestampMs, sourceStream, data))
  def wrapError(timestampMs: Column, sourceStream: String, data: Column): Column =
    to_json(envelope("error", timestampMs, sourceStream, data))

  /** Canonical (byte-stable, fixed key order) envelope JSON. `dataJson`
    * must already be a JSON fragment (object or scalar). */
  def canonicalJson(kind: String, timestampMs: Column, sourceStream: String,
      dataJson: Column): Column =
    concat(
      lit("{\"type\":\"" + kind + "\",\"timestamp\":"),
      timestampMs.cast("long").cast("string"),
      lit(",\"version\":\"" + Version + "\",\"schema\":\"" + Schema +
          "\",\"source_stream\":\"" + sourceStream + "\",\"data\":"),
      dataJson,
      lit("}"))
}
