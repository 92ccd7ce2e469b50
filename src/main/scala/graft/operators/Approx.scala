package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate analytics — at 100 TB, exact `COUNT(DISTINCT)` and exact
  * quantiles force full shuffles of the distinct values; these sketches
  * keep fixed-size state per group and merge associatively (one partial
  * pass + tiny final merge — same shape as any partial aggregate).
  *
  * These are deliberately NOT in the DuckDB-oracle set: sketch estimates
  * are engine-specific. Correctness is spec-checked against exact
  * answers within the configured error (ApproxSpec).
  */
object Approx {
  /** HyperLogLog++ distinct count per group (relative error `rsd`). */
  def distinctCount(df: DataFrame, groupCols: Seq[String], countCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(countCol), rsd).as("approx_distinct"))

  /** Approximate quantiles per group (Greenwald-Khanna style sketch;
    * `accuracy` = 1/relative-rank-error). One output row per
    * (group, prob) — scalar columns, so downstream consumers (and the
    * correctness gate's sort-then-hash compare) never handle arrays. */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val probsSql = probs.mkString("array(", ", ", ")")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile_approx($valueCol, $probsSql, $accuracy)").as("qs"))
      // _outer: a group whose values are all NULL has a NULL sketch —
      // keep it as one (group, NULL, NULL) row instead of dropping the
      // group from the output entirely
      .select(groupCols.map(col) :+
        posexplode_outer(col("qs")).as(Seq("pi", "q_approx")): _*)
      .select(groupCols.map(col) :+
        element_at(lit(probs.toArray), col("pi") + 1).as("prob") :+
        col("q_approx"): _*)
  }

  /** Heavy hitters: values of `itemCol` with frequency >= `support`. */
  def frequentItems(df: DataFrame, itemCol: String,
      support: Double = 0.01): DataFrame =
    df.stat.freqItems(Seq(itemCol), support)

  /** Mergeable distinct-count sketches (Apache DataSketches HLL): one
    * BINARY sketch per group that [[unionEstimate]] can merge later.
    * This is the incremental-stats pattern a 100 TB pipeline lives on:
    * sketch each day's partition once, PERSIST the kilobyte sketches,
    * and answer "distinct users this quarter?" by unioning 90 stored
    * sketches — history is never rescanned. Union is exact over the
    * sketch lattice: merging per-day sketches yields byte-identical
    * estimates to sketching the concatenated data (spec-pinned). */
  def distinctSketches(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg(`$valueCol`)").as("sketch"))

  /** Merge persisted sketches down to `groupCols` and estimate. */
  def unionEstimate(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_estimate(hll_union_agg(`$sketchCol`))")
        .as("est_distinct"))
}
