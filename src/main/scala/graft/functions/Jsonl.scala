package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL record parsing — the reference's `json-reducer`
  * (/root/reference/src/etlp/utils/reducers.clj:44-50): each line parsed
  * as JSON, merged with the originating file (`parse-line` merges
  * `{:file f}`).
  *
  * With a known schema the parse is one codegen'd `from_json` fused into
  * the scan; schema-less parsing should happen ONCE at ingest (infer,
  * then pin the schema) — never per-query at 100 TB.
  */
object Jsonl {
  /** Parse a JSON-line column against a schema; malformed lines yield a
    * null struct (pair with ErrorChannel.split for the error side). */
  def parseLine(line: Column, schema: StructType): Column =
    from_json(line, schema)

  /** json-reducer shape: parse `lineCol` and flatten its fields next to
    * the source-file column. */
  def parseLines(df: DataFrame, lineCol: String, schema: StructType,
      fileCol: String = "file"): DataFrame =
    df.select(parseLine(col(lineCol), schema).as("rec"), col(fileCol))
      .select(col("rec.*"), col(fileCol))

  /** Single-field JSON path extraction (`get_json_object`), typed. */
  def extract(json: Column, path: String, castTo: String = "string"): Column =
    get_json_object(json, path).cast(castTo)
}
