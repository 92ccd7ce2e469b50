package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.C ETL surface — the reference's identity re-expressed Spark-first.
  * Placeholder round-1 scaffold; filled in as operators land. */
object QueriesEtl {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
