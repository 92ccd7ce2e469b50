package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog/CDC compaction: the two standard ways an ETL system turns
  * an append-only change stream into a queryable state — upsert (latest
  * record per key) and SCD type-2 (validity intervals per key). The
  * reference's connectors ship records into append-only destinations
  * (cf. /root/reference/src/etlp/core.clj:115-146 — sinks only append);
  * compaction-on-read is how downstream queries see "current state"
  * without a mutable store.
  *
  * Scale: both operators are ONE key-partitioned window each — a single
  * hash shuffle on the key columns, no joins, no driver state. Spark
  * plans `row_number() <= 1` with WindowGroupLimit, so the upsert keeps
  * only each partial group's head on the map side before the exchange;
  * at 100 TB the shuffle carries ~one row per key per input partition,
  * not the full changelog.
  */
object Changelog {
  /** Latest record per key: keep the row ranked first by `ordering`
    * (pass descending columns, e.g. `Seq(col("ts").desc, col("id").desc)`
    * — include a unique tie-breaker so the winner is deterministic). */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply a CDC changelog with tombstones: the latest operation per
    * key wins, and a key whose latest operation is a delete disappears
    * from the materialized state. `isDelete` is evaluated on the
    * winning row only — a delete followed by a later re-insert
    * resurrects the key, matching MERGE semantics. A NULL `isDelete`
    * result (e.g. a NULL op column) counts as NOT-a-delete — an
    * ambiguous row must not silently erase a key. Same single-window
    * plan as [[latestByKey]]; the tombstone filter is row-local. */
  def applyCdc(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column],
      isDelete: Column): DataFrame =
    latestByKey(df, keyCols, ordering)
      .where(!coalesce(isDelete, lit(false)))

  /** SCD type-2 intervals: each change row becomes a version with
    * `version` (1-based per key), `valid_from` = its `tsCol`,
    * `valid_to` = the next version's `tsCol` (NULL while current) and
    * `is_current`. `tieBreak` orders simultaneous changes (same ts)
    * deterministically. */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc +: tieBreak: _*)
    df.withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Bitemporal as-of: reconstruct, per key, the version that was
    * EFFECTIVE at valid time `asOfValid` AS KNOWN AT transaction time
    * `asOfTx`, from an append-only bitemporal ledger (each row = one
    * assertion `(key, validFrom, txFrom, payload)`; corrections re-
    * assert the same validFrom at a later txFrom — rows are never
    * mutated, matching the append-only sink model above).
    *
    * Two nested latest-by-key reductions, both as key-partitioned
    * MAX_BY-style aggregates (not windows — a two-phase aggregate
    * combines map-side, so the shuffle carries one row per key per
    * input partition): (1) among assertions visible at `asOfTx`, the
    * latest txFrom wins per (key, validFrom); (2) among surviving
    * versions, the latest validFrom ≤ `asOfValid` wins per key. The
    * ledger must not contain two rows with equal (key, validFrom,
    * txFrom) — assert upstream; with that, both argmaxes are unique
    * and the result is deterministic on any engine and partitioning. */
  def bitemporalAsOf(ledger: DataFrame, keyCols: Seq[String],
      validFromCol: String, txFromCol: String,
      asOfValid: Column, asOfTx: Column): DataFrame = {
    val payload = ledger.columns
      .filterNot(c => keyCols.contains(c) || c == validFromCol || c == txFromCol)
    val latestTx = ledger
      .where(col(txFromCol) <= asOfTx)
      .groupBy((keyCols :+ validFromCol).map(col): _*)
      .agg(max(col(txFromCol)).as(txFromCol),
        payload.map(c => max_by(col(c), col(txFromCol)).as(c)): _*)
    latestTx
      .where(col(validFromCol) <= asOfValid)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col(validFromCol)).as(validFromCol),
        (txFromCol +: payload).map(c =>
          max_by(col(c), col(validFromCol)).as(c)): _*)
  }
}
