package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full §2 capability inventory; `oracleSql` holds the
  * DuckDB-equivalent SQL for every oracle-checkable key (same column
  * names + types both sides — see QueriesCore's numeric-exactness note).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.queries("q_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesEtl.queries ++ QueriesLlm.queries ++
      QueriesCorpus.queries ++ QueriesStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracle ++ QueriesEtl.oracle ++ QueriesLlm.oracle ++
      QueriesCorpus.oracle ++ QueriesStream.oracle
}
