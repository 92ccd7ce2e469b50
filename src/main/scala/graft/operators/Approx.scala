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
    * REGISTER lattice (the merged registers equal the registers of
    * sketching the concatenated data), so merging loses no accuracy;
    * the reported ESTIMATE can still differ from a one-pass sketch's
    * because a merged result reads those registers through the
    * composite estimator while an unmerged stream keeps HIP — both
    * stay within the sketch's error bound ([[evalReport]] scores
    * exactly this; ApproxSpec pins estimate equality on a fixture
    * where both paths merge). */
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

  /** QA report scoring every sketch family against its EXACT sibling —
    * the [[graft.operators.Dedup]] `dedup_eval` pattern applied to the
    * approx group (r9 verdict #3), so the four estimate queries stop
    * being rows-only: the report's exact counts and its `ok = true`
    * expectations ARE cross-engine reproducible, and a sketch drifting
    * past its declared bound flips `ok` to false and hash-fails the
    * gate. One row per (family, group):
    *
    *  - `hll_distinct`: [[distinctCount]] (rsd 0.05) vs exact
    *    `COUNT(DISTINCT)` — ok iff relative error ≤ 3·rsd.
    *  - `hll_merge`: [[unionEstimate]] over per-day [[distinctSketches]]
    *    AND over the same data sketched in one pass — BOTH within 5%
    *    of exact (DataSketches lgK=12 → rsd ≈ 1.6%). Estimate
    *    byte-equality is deliberately NOT asserted: a merged union
    *    reports the composite estimator while an unmerged stream keeps
    *    HIP, so the two paths read the SAME registers through
    *    different estimators once the direct sketch leaves coupon mode
    *    (measured at sf0.1: merged 1488 vs direct 1480–1499, exact
    *    1500 — all in bound, none equal).
    *  - `quantile`: [[quantiles]] (accuracy 10⁴ → rank error ≤ 10⁻⁴)
    *    — ok iff the returned element's exact-rank interval
    *    [r_lt+1, r_le] intersects p·n ± (10⁻³·n + 1): a pure integer
    *    rank check, no float quantile value crosses engines. The +1 is
    *    discreteness slack — the sketch's query targets ⌈p·n⌉, one off
    *    from p·n itself on small groups.
    *  - `freq_items`: [[frequentItems]] at support 0.05 over a skewed
    *    key — ok iff every key whose TRUE frequency ≥ support appears
    *    in the sketch's list (the sketch's recall guarantee; false
    *    positives are allowed by contract and not scored).
    *
    * All comparison work is aggregate-shaped (group-keyed counts, a
    * 1-row broadcast total, a broadcast k-item frequent list) — the
    * report costs two scans of each scored table at any scale. */
  def evalReport(events: DataFrame, orders: DataFrame): DataFrame = {
    val rsd = 0.05
    // -- hll_distinct ------------------------------------------------
    val exact = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val hll = distinctCount(events, Seq("event_type"), "user_id", rsd)
      .join(exact, "event_type")
      .select(lit("hll_distinct").as("family"),
        col("event_type").cast("string").as("grp"),
        col("n_exact").cast("long").as("n_exact"),
        (abs(col("approx_distinct").cast("double") / col("n_exact") - 1.0)
          <= 3 * rsd).as("ok"))
    // -- hll_merge ---------------------------------------------------
    val daily = distinctSketches(
      events.withColumn("day", date_trunc("DAY", col("ts"))),
      Seq("event_type", "day"), "user_id")
    val merged = unionEstimate(daily, Seq("event_type"))
    val direct = unionEstimate(
      distinctSketches(events, Seq("event_type"), "user_id"),
      Seq("event_type"))
      .withColumnRenamed("est_distinct", "est_direct")
    val merge = merged.join(direct, "event_type").join(exact, "event_type")
      .select(lit("hll_merge").as("family"),
        col("event_type").cast("string").as("grp"),
        col("n_exact").cast("long").as("n_exact"),
        (abs(col("est_distinct").cast("double") / col("n_exact") - 1.0)
            <= 0.05 &&
          abs(col("est_direct").cast("double") / col("n_exact") - 1.0)
            <= 0.05).as("ok"))
    // -- quantile ----------------------------------------------------
    val probs = Seq(0.5, 0.9)
    val eps = 0.001
    val q = quantiles(orders, Seq("o_orderpriority"), "o_totalprice", probs)
    val grpN = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_exact"))
    val ranks = q
      .join(orders.select(col("o_orderpriority"), col("o_totalprice")),
        "o_orderpriority")
      .groupBy("o_orderpriority", "prob", "q_approx")
      .agg(sum(when(col("o_totalprice") <= col("q_approx"), 1L)
          .otherwise(0L)).as("r_le"),
        sum(when(col("o_totalprice") < col("q_approx"), 1L)
          .otherwise(0L)).as("r_lt"))
    val quant = ranks.join(grpN, "o_orderpriority")
      .select(lit("quantile").as("family"),
        concat_ws(":", col("o_orderpriority"),
          col("prob").cast("string")).as("grp"),
        col("n_exact").cast("long").as("n_exact"),
        ((col("r_lt") + 1).cast("double")
            <= col("prob") * col("n_exact") + lit(eps) * col("n_exact") + 1 &&
          col("r_le").cast("double")
            >= col("prob") * col("n_exact") - lit(eps) * col("n_exact") - 1)
          .as("ok"))
    // -- freq_items --------------------------------------------------
    val support = 0.05
    val hot = events.select(
      when(col("user_id") % 5 === 0, lit(0L))
        .otherwise(col("user_id") % 50).as("hot_key"))
    val fi = frequentItems(hot, "hot_key", support)
    val cnts = hot.groupBy("hot_key").agg(count(lit(1)).as("c"))
    val tot = hot.agg(count(lit(1)).as("tot"))
    val freq = cnts.crossJoin(broadcast(tot)) // 1-row scalar attach
      .where(col("c").cast("double") / col("tot") >= support)
      .crossJoin(broadcast(fi)) // 1-row k-item list attach
      .select(array_contains(col("hot_key_freqItems"), col("hot_key"))
        .as("hit"))
      .agg(count(lit(1)).as("n_exact"), min(col("hit")).as("ok"))
      .select(lit("freq_items").as("family"), lit("hot_key").as("grp"),
        col("n_exact").cast("long").as("n_exact"),
        coalesce(col("ok"), lit(true)).as("ok"))
    hll.unionByName(merge).unionByName(quant).unionByName(freq)
  }
}
