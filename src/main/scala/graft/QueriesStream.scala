package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.E Structured Streaming — CSP/channel analogue of the reference.
  * Placeholder round-1 scaffold; filled in as operators land. */
object QueriesStream {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
