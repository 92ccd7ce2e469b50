package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.D LLM-training-data operators (dedup / ANN / text / multimodal).
  * Placeholder round-1 scaffold; filled in as operators land. */
object QueriesLlm {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
