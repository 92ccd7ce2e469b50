package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HL7 v2 pipe-and-hat parsing — the reference's flagship use case is an
  * S3→HL7 connector whose `hl7-xform` splits raw messages into segments
  * (/root/reference/README.md: `(hl7-xform {})` composed with
  * `(s/join "\r" segments)`).
  *
  * Everything here is `functions._` composition (split/posexplode/
  * element_at) — fully codegen'd, no UDF, so parsing fuses into the scan
  * stage and scales linearly with input bytes.
  *
  * HL7 structure: message = CR-separated segments; segment = `|`-separated
  * fields (field 0 is the segment id); field = `^`-separated components.
  */
object Hl7 {
  val SegmentSep   = "\r"
  private val FieldRe = "\\|"  // regex-escaped for split()
  private val CompRe  = "\\^"

  /** message column → array<string> of segments. */
  def segments(msg: Column): Column = split(msg, SegmentSep)

  /** segment column → array<string> of fields. */
  def fields(segment: Column): Column = split(segment, FieldRe)

  /** field column → array<string> of components. */
  def components(field: Column): Column = split(field, CompRe)

  /** field column → array<string> of repetitions (`~`-separated). */
  def repetitions(field: Column): Column = split(field, "~")

  /** message → MSH-9 message type code (e.g. "ADT^A01" → "ADT").
    * MSH numbering is shifted: MSH-1 is the field separator itself, so
    * MSH-9 is the 9th `|`-delimited token (index 8 after the id). */
  def messageType(msg: Column): Column =
    element_at(components(field(element_at(segments(msg), 1), 8)), 1)

  /** segment id (MSH/PID/OBX/...). */
  def segmentId(segment: Column): Column = element_at(fields(segment), 1)

  /** 1-based field accessor (HL7 numbering: field 1 follows the id). */
  def field(segment: Column, i: Int): Column = element_at(fields(segment), i + 1)

  /** Explode a message column into one row per segment with its 0-based
    * index: adds (segIdxCol, segCol). Row-local: no shuffle. */
  def explodeSegments(df: DataFrame, msg: Column,
      segIdxCol: String = "seg_idx", segCol: String = "seg"): DataFrame =
    df.select(df.columns.map(col) :+
      posexplode(segments(msg)).as(Seq(segIdxCol, segCol)): _*)
}
