package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators: histogram, time-series gap filling,
  * ordered-stage funnels, cohort retention — the reporting queries an
  * events pipeline feeds (the reference's destinations are exactly such
  * consumers; cf. /root/reference/README.md's aggregation examples).
  * All four are compositions of key-partitioned aggregates — no
  * operator here shuffles anything wider than (key, bucket) rows.
  */
object Analytics {
  /** Fixed-width histogram of `valueCol`: bucket i covers
    * [lo + i·width, lo + (i+1)·width); values below `lo` clamp into
    * bucket 0, values at/above `lo + buckets·width` into the last
    * bucket (standard edge-clamping, keeps the row count bounded).
    * Only non-empty buckets return. ONE two-phase aggregate. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, width: Double,
      buckets: Int): DataFrame = {
    require(width > 0 && buckets > 0)
    val b = least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int")
    df.where(col(valueCol).isNotNull)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        expr(s"CAST($lo + bucket * $width AS DOUBLE)").as("bucket_lo"),
        col("n"))
  }

  /** Gap-filled per-key time series: bucket `tsCol` to `unit`
    * ('HOUR'/'DAY'), aggregate per (key, bucket), then complete each
    * key's own [min, max] bucket range with zero rows.
    *
    * The calendar builds from a per-key `sequence()` explode — a
    * row-local generate off the per-key aggregate, NOT a cross join of
    * a global calendar against the key dimension (which would be an
    * unbounded all-pairs shape). Each key fills only its own active
    * range, which is also the semantically honest choice (a key that
    * appeared in March shouldn't backfill zeros to January). */
  def fillGaps(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      unit: String = "HOUR"): DataFrame = {
    require(Set("HOUR", "DAY")(unit.toUpperCase), s"unsupported unit $unit")
    val u = unit.toUpperCase
    // explicit: a NULL timestamp belongs to no bucket, and a NULL key
    // owns no series (they would otherwise aggregate normally but
    // never re-match the grid's null-rejecting equi-join — every
    // bucket of the NULL key would report 0 instead of its real count)
    val bucketed = df.where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("k"),
        date_trunc(u, col(tsCol)).as("bucket"),
        col(valueCol).as("v"))
      .groupBy("k", "bucket")
      .agg(count(lit(1)).as("n"),
        expr("CAST(ROUND(SUM(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)").as("sum_v"))
    val grid = bucketed.groupBy("k")
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("k"), explode(
        expr(s"sequence(b0, b1, INTERVAL 1 $u)")).as("bucket"))
    grid.join(bucketed, Seq("k", "bucket"), "left")
      .select(col("k").as(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_v"), lit(0.0)).as("sum_v"))
  }

  /** Ordered-stage funnel: stage k counts users whose earliest
    * qualifying stage-k event is STRICTLY AFTER their earliest
    * qualifying stage-(k-1) event (classic strict-order funnel).
    * `maxGapUs` bounds each step: with it set, stage k's event must
    * also land within that horizon of the stage-(k-1) entry — the
    * "converted within N hours per step" product-analytics form.
    * Returns (stage_idx, stage, n_users).
    *
    * One key-partitioned aggregate per stage, chained by equi-joins on
    * the user — stage k's frontier is (user, ts of entry), so each join
    * carries one row per surviving user. */
  def funnel(df: DataFrame, userCol: String, tsCol: String, stageCol: String,
      stages: Seq[String], maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size)
    maxGapUs.foreach(g => require(g > 0, "maxGapUs must be positive"))
    val ev = df.select(col(userCol).as("u"), col(tsCol).as("t"),
      col(stageCol).as("s"))
    // cast: TIMESTAMP_NTZ columns (native parquet reads) aren't accepted
    // by unix_micros; session tz is UTC so the cast is exact (same
    // discipline as AsOf.join)
    def inWindow(t: Column, ft: Column): Column =
      maxGapUs.fold(t > ft)(g =>
        t > ft && unix_micros(t.cast("timestamp")) <=
          unix_micros(ft.cast("timestamp")) + g)
    // one lazily-built frontier per stage; the result is a UNION of
    // their counts — a single plan, no driver-side actions while
    // composing (stage counts per level, not per row)
    val frontiers = stages.drop(1).scanLeft(
      ev.where(col("s") === stages.head)
        .groupBy("u").agg(min(col("t")).as("ft"))) { (front, stage) =>
      ev.where(col("s") === stage)
        .join(front, "u")
        .where(inWindow(col("t"), col("ft")))
        .groupBy("u").agg(min(col("t")).as("ft"))
    }
    frontiers.zip(stages).zipWithIndex.map { case ((front, stage), i) =>
      front.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Cohort retention: cohort = day of the user's first event; a user
    * counts in (cohort_day, week_offset) when active in that week
    * relative to their own cohort day. Two aggregates and one
    * broadcast-friendly join on the user key. */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = df.select(col(userCol).as("u"),
      date_trunc("DAY", col(tsCol)).as("day"))
    val cohort = ev.groupBy("u").agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "u")
      .select(col("u"), col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("int")
          .as("week_offset"))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
