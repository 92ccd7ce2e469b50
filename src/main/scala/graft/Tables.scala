package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated testdata layout: one parquet per table
  * under an sf directory.
  *
  * Timestamp normalization — the driver's generator has shipped two
  * physical encodings across rounds, and the loaders accept both:
  *  - INT64 TIMESTAMP(NANOS) (pandas datetime64[ns]), which Spark's
  *    parquet reader rejects by default (PARQUET_TYPE_ILLEGAL). We flip
  *    `spark.sql.legacy.parquet.nanosAsLong` (runtime-settable session
  *    conf) so those columns arrive as epoch-nanos LONGs, then rebuild
  *    TimestampType via `timestamp_micros(ns div 1000)` — lossless (no
  *    sub-microsecond residue in the data).
  *  - TIMESTAMP(MICROS) without the UTC-adjusted flag, which Spark 4
  *    infers as TIMESTAMP_NTZ. Half the engine rejects NTZ where it
  *    requires session-zoned TIMESTAMP (`unix_millis`, stream
  *    watermarks), so we cast NTZ → TIMESTAMP at load. Under the fixed
  *    UTC session timezone the wall-clock fields are preserved
  *    verbatim, which is exactly how the DuckDB oracle reads the same
  *    files (its TIMESTAMP is zoneless).
  *
  * Scale note: both conversions are row-local projections fused into the
  * scan stage; column pruning and predicate pushdown on the remaining
  * columns are unaffected.
  */
object Tables {
  /** timestamp-typed columns per table (stored as ns in the parquet). */
  private val tsCols: Map[String, Seq[String]] = Map(
    "orders"   -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events"   -> Seq("ts")
  )

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    tsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      df.schema(c).dataType match {
        case LongType =>
          df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
        case TimestampNTZType =>
          df.withColumn(c, expr(s"CAST($c AS TIMESTAMP)"))
        case _ => df
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
