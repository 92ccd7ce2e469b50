package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Peak concurrency per key (sweep line): each row opens an interval
    * [ts, ts + `durationUs` µs); the result is the maximum number of
    * simultaneously open intervals per key. Classic +1/−1 boundary
    * walk: union the start (+1) and end (−1) points, running-sum in
    * time order, take the max.
    *
    * Half-open semantics: an interval ending exactly when another
    * starts does NOT overlap it — the (t, delta) sort puts −1 before
    * +1 at equal t. The running frame is the default RANGE frame, so
    * every row in a (t, delta) tie group reads the sum AFTER the whole
    * group — the max is well-defined with no dependence on intra-group
    * order (within a group all deltas share a sign, so the extremum
    * sits at a group boundary either way).
    *
    * Scale: the window partitions by the key — per-key time sort, no
    * global ordering, 2 rows per input row. A global (keyless)
    * concurrency count would need a cross-partition prefix sum; keyed
    * is the shape that holds at 100 TB. */
  def maxConcurrent(df: DataFrame, keyCol: String, tsCol: String,
      durationUs: Long): DataFrame = {
    require(durationUs > 0, "durationUs must be positive")
    val base = df.select(col(keyCol).as("k"),
      unix_micros(col(tsCol).cast("timestamp")).as("t"))
    val pts = base.select(col("k"), col("t"), lit(1).as("d"))
      .unionByName(base.select(col("k"),
        (col("t") + durationUs).as("t"), lit(-1).as("d")))
    val w = Window.partitionBy("k").orderBy(col("t").asc, col("d").asc)
    pts.withColumn("run", sum(col("d")).over(w))
      .groupBy(col("k").as(keyCol))
      .agg(max(col("run")).cast("int").as("max_concurrent"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
  }

  /** Longest consecutive-day activity streak per user (gaps and
    * islands): distinct active days, then `day − row_number` is
    * constant within a consecutive run — count per island, max per
    * user. All shuffles keyed by the user; nothing global. */
  def streaks(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val du = df.where(col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        date_trunc("DAY", col(tsCol)).cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy("u").orderBy(col("day"))
    du.withColumn("isl", date_sub(col("day"), row_number().over(w)))
      .groupBy("u", "isl").agg(count(lit(1)).as("len"))
      .groupBy(col("u").as(userCol))
      .agg(sum(col("len")).cast("long").as("n_active_days"),
        max(col("len")).cast("int").as("max_streak"))
  }

  /** First-/last-touch revenue attribution: each conversion's value is
    * credited to the earliest (first-touch) and latest (last-touch)
    * non-conversion event at-or-before it for the same user, then
    * revenue aggregates per (model, channel). Conversions with no
    * prior touch credit the sentinel channel `(none)`.
    *
    * ONE key-partitioned window pass computes both candidates — the
    * running first/last over (unboundedPreceding, 1 preceding) with
    * touches ordered before conversions at equal timestamps (the
    * "touch at conversion instant still counts" rule) — then one
    * two-phase aggregate. No join, no per-conversion probe. The
    * revenue sum follows the repo's decimal-exact money policy. */
  def attribution(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, conversionType: String,
      tieBreak: String): DataFrame = {
    val isConv = (col(typeCol) === conversionType).cast("int")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, isConv.asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(isConv === 0, col(typeCol))
    val tagged = df
      .withColumn("graft_ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("graft_lt", last(touch, ignoreNulls = true).over(w))
      .where(isConv === 1)
    def side(model: String, c: Column): DataFrame = tagged.select(
      lit(model).as("model"),
      coalesce(c, lit("(none)")).as("channel"),
      col(valueCol).as("v"))
    side("first_touch", col("graft_ft"))
      .unionByName(side("last_touch", col("graft_lt")))
      .groupBy("model", "channel")
      .agg(count(lit(1)).as("n_conversions"),
        expr("CAST(ROUND(SUM(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)")
          .as("revenue"))
  }

  /** Bounded-lookback EWMA per key with α = 1/2: the weighted mean of
    * the last `lookback` values in (orderCols) order, weights
    * (1/2)^age — newest weight 1. α is FIXED at the exactly-
    * representable 1/2 so every weight is a power of two and the
    * result depends only on summation order, which is pinned: the
    * window frame collects IN WINDOW ORDER and the fold runs
    * left-to-right — bit-identical on any engine with a sequential
    * list fold (DuckDB's list_sum is).
    *
    * One keyed window over the scan — no self-join, no shuffle beyond
    * the key partitioning; the per-row state is `lookback` doubles.
    * NULL values contribute 0 (and still occupy a slot), keeping the
    * frame aligned with the row count.
    *
    * Output: (idCol, keyCol, ewma_r = ROUND(·, 4) + 0.0). */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
      idCol: String, valueCol: String, lookback: Int = 8): DataFrame = {
    require(lookback >= 1 && lookback <= 64, "lookback must be in [1,64]")
    require(orderCols.nonEmpty,
      "ewma needs a deterministic ordering — pass at least one order column")
    val w = Window.partitionBy(keyCol)
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(-(lookback - 1), 0)
    df.withColumn("graft_vals", collect_list(
        expr(s"COALESCE(CAST($valueCol AS DOUBLE), CAST(0.0 AS DOUBLE))"))
        .over(w))
      .select(col(idCol), col(keyCol),
        expr("""CAST(ROUND(
          aggregate(sequence(0, size(graft_vals)-1), CAST(0.0 AS DOUBLE),
            (acc, j) -> acc + element_at(graft_vals, j+1)
              * power(CAST(0.5 AS DOUBLE), size(graft_vals)-1-j)) /
          aggregate(sequence(0, size(graft_vals)-1), CAST(0.0 AS DOUBLE),
            (acc, j) -> acc + power(CAST(0.5 AS DOUBLE), size(graft_vals)-1-j)),
        4) + 0.0 AS DOUBLE)""").as("ewma_r"))
  }

  /** Z-score outliers per key: rows where |value − mean| > `z` σ of
    * their key's distribution. Mean/stddev come from decimal-exact
    * sums (the q_stats discipline — order-independent, so the flagged
    * set is deterministic and cross-engine identical); the per-key
    * stats table is tiny and broadcast-joins back to the rows. One
    * scan + one two-phase aggregate + one broadcast join. */
  def outliers(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String, z: Double = 3.0): DataFrame = {
    require(z > 0, "z must be positive")
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(idCol).as("id"),
        col(valueCol).cast("double").as("v"))
    val stats = rows.groupBy("k").agg(
        count(lit(1)).as("n"),
        expr("SUM(CAST(v AS DECIMAL(18,6)))").as("sx"),
        expr("SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)))").as("sxx"))
      .where(col("n") > 1)
      .selectExpr("k", "CAST(sx AS DOUBLE) / n AS mean",
        "SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS sd")
      .where(col("sd") > 0)
    rows.join(broadcast(stats), "k")
      .withColumn("zs", (col("v") - col("mean")) / col("sd"))
      .where(abs(col("zs")) > z)
      .select(col("k").as(keyCol), col("id").as(idCol), col("v").as(valueCol),
        expr("CAST(ROUND(zs, 4) AS DOUBLE)").as("z_score"))
  }

  /** Trailing-window distinct actors: for each day present in the
    * data, the count of distinct users active in the trailing `days`-
    * day window ending that day. Exact, with BOUNDED fan-out: each
    * distinct (user, day) row contributes to exactly `days` report
    * days (a row-local sequence explode), then one dedupe and one
    * count — never a collect_set over a sliding frame, whose buffer
    * would hold a window's whole distinct set per row. For windows too
    * wide to fan out, the mergeable-HLL path ([[graft.operators.Approx]])
    * is the documented alternative. */
  def trailingDistinct(df: DataFrame, userCol: String, tsCol: String,
      days: Int = 7): DataFrame = {
    require(days >= 1 && days <= 90, "days must be in [1, 90]")
    val du = df.where(col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        date_trunc("DAY", col(tsCol)).as("day"))
      .distinct()
    val contrib = du.select(col("u"), explode(expr(
        s"sequence(day, day + INTERVAL ${days - 1} DAYS, INTERVAL 1 DAY)"))
        .as("rday"))
      .distinct()
    contrib.groupBy("rday").agg(count(lit(1)).as("n_active"))
      .join(du.select(col("day")).distinct(), col("rday") === col("day"))
      .select(col("day"), col("n_active"))
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

  /** First-order Markov transition matrix over each key's ordered event
    * stream: for every (previous state, next state) pair, the count and
    * the row-normalized transition probability — "after viewing, 40% of
    * users purchase". The per-stream step extraction is one keyed
    * window (lag over (ts, tie)); the matrix itself is a tiny
    * states×states aggregate, so the normalizing window over
    * `prev_state` runs on result-sized data. `tieCol` makes the order
    * total when timestamps collide — without it, equal-ts rows would
    * make lag() partition-order-dependent. */
  def transitions(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    df.withColumn("graft_prev", lag(col(stateCol), 1).over(w))
      .where(col("graft_prev").isNotNull)
      .groupBy(col("graft_prev").as("prev_state"),
        col(stateCol).as("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", expr(
        """CAST(ROUND(CAST(n AS DOUBLE) /
          |  SUM(n) OVER (PARTITION BY prev_state), 6) AS DOUBLE)""".stripMargin))
  }

  /** Batch gap sessionization (the batch sibling of the streaming
    * session window): per key, a new session starts when the gap to
    * the previous event exceeds `gapUs`; sessions then roll up to one
    * row per key. All three passes — the lag window, the per-session
    * aggregate, the per-key aggregate — are keyed by the user column,
    * so the whole operator is ONE shuffle by key followed by local
    * aggregation (the session/user groupBys reuse the window's hash
    * partitioning). Durations stay in integral microseconds until the
    * final floor-divide to seconds: no fp drift across engines. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val base = df.where(col(tsCol).isNotNull)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("t"))
    val w = Window.partitionBy("u").orderBy(col("t").asc)
    // gap to previous event; ties (equal t) yield gap 0 regardless of
    // tie order, so no deterministic tiebreak column is needed
    val sess = base
      .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(w))
      .groupBy("u", "sid")
      .agg(count(lit(1)).as("len"), (max(col("t")) - min(col("t"))).as("dur_us"))
    sess.groupBy(col("u").as(userCol))
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        max(col("len")).cast("int").as("max_session_events"),
        floor(sum(col("dur_us")) / 1000000L).cast("long").as("total_session_s"))
  }

  /** 2-D Pareto skyline per key group: the rows of `df` not STRICTLY
    * dominated within their `keyCol` group on (`xCol`, `yCol`), both
    * maximized — q dominates p iff q.x ≥ p.x ∧ q.y ≥ p.y with at least
    * one strict; rows tied on both dims all survive. Rows with a null
    * dimension are excluded (dominance is undefined on null).
    *
    * Distributed O(n log n) shape — never the all-pairs self-join:
    * (1) two-phase aggregate to one row per (key, x): ymax;
    * (2) ONE window per key over the x-groups (x desc, distinct per
    *     key so the order is total): running max of ymax over
    *     strictly-higher x — a group is on the frontier iff its ymax
    *     beats every higher-x group's;
    * (3) equi-join the frontier (a small fraction of the input;
    *     broadcast-eligible at scale) back to `df` on
    *     (key, x, y = ymax) — each input row matches at most its own
    *     group's frontier row, so no row multiplication.
    * Exactness of the reduction: any dominator of p sits either in
    * p's own (key,x) group (higher y ⇒ p.y < ymax, dropped by the
    * join) or in a higher-x group (ymax there ≥ its y ≥ p.y ⇒ the
    * running max kills p's group or p.y < own ymax). */
  /** Sliding-window mean-shift changepoint detection per key: flag
    * rows where the mean of the next `w` values (current row included —
    * the changepoint is the first row of the new regime) differs from
    * the mean of the previous `w` values by more than `z` key-σ. Both
    * frames must be FULL (`w` rows) so edge rows never fire on a
    * partial mean. The window sums ride DECIMAL(18,6) so they are
    * exact and order-independent (the q_stats discipline); σ comes
    * from the same decimal-exact two-phase aggregate as [[outliers]]
    * and broadcast-joins back — one scan, two frames over ONE keyed
    * sort, one tiny broadcast. At 100 TB this is the cheap shape for
    * level-shift detection: no self-join, state bounded by 2·w rows
    * per frame, and the per-key stats table stays metadata-sized. */
  def meanShifts(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, w: Int = 8,
      z: Double = 1.5): DataFrame = {
    require(w >= 2 && w <= 256, "window must be in [2,256]")
    require(z > 0, "z must be positive")
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(idCol).as("id"),
        col(tsCol).as("t"), col(valueCol).cast("double").as("v"))
    val order = Window.partitionBy("k").orderBy(col("t").asc, col("id").asc)
    val before = order.rowsBetween(-w, -1)
    val after  = order.rowsBetween(Window.currentRow, w - 1)
    val stats = rows.groupBy("k").agg(
        count(lit(1)).as("n"),
        expr("SUM(CAST(v AS DECIMAL(18,6)))").as("sx"),
        expr("SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)))").as("sxx"))
      .where(col("n") > 1)
      .selectExpr("k",
        "SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS sd")
      .where(col("sd") > 0)
    rows
      .withColumn("n_b", count(col("v")).over(before))
      .withColumn("sb", expr("SUM(CAST(v AS DECIMAL(18,6)))").over(before))
      .withColumn("n_a", count(col("v")).over(after))
      .withColumn("sa", expr("SUM(CAST(v AS DECIMAL(18,6)))").over(after))
      .where(col("n_b") === w && col("n_a") === w)
      .join(broadcast(stats), "k")
      .withColumn("shift",
        col("sa").cast("double") / w - col("sb").cast("double") / w)
      .where(abs(col("shift")) > col("sd") * z)
      // means round from the DECIMAL quotient, not a double: sum/w can
      // land exactly on a .00005 boundary (integer-ish inputs, w a
      // power of two), where Spark's double ROUND (shortest-decimal
      // HALF_UP) and an engine rounding the binary value disagree by
      // one ulp of the 4th decimal; decimal-space rounding is exact
      // and engine-independent
      .select(col("k").as(keyCol), col("id").as(idCol), col("t").as(tsCol),
        expr("CAST(ROUND(sb / " + w + ", 4) AS DOUBLE)")
          .as("mean_before"),
        expr("CAST(ROUND(sa / " + w + ", 4) AS DOUBLE)")
          .as("mean_after"),
        expr("CAST(ROUND(shift / sd, 4) AS DOUBLE)").as("shift_z"))
  }

  /** Two-sample A/B read-out (Welch's t): per variant the EXACT
    * decimal moments (n, Σx, Σx²) — order-independent on any
    * engine — then the t statistic derived from them in one fixed
    * IEEE expression and rounded once (the σ-denominator is
    * irrational, so the rounding is boundary-safe; the means are NOT
    * emitted rounded precisely because sum/n CAN land on a round-4
    * boundary — consumers derive them from the exact sums). One
    * conditional two-phase aggregate; the whole read-out is a single
    * row. */
  def abTest(df: DataFrame, variantCol: String, valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull && col(variantCol).isNotNull)
      .select(col(variantCol).cast("int").as("g"),
        col(valueCol).cast("double").as("v"))
      .agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("g") =!= 0, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("g") === 0,
          expr("CAST(v AS DECIMAL(18,6))"))).as("sa"),
        sum(when(col("g") =!= 0,
          expr("CAST(v AS DECIMAL(18,6))"))).as("sb"),
        sum(when(col("g") === 0,
          expr("CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))")))
          .as("ssa"),
        sum(when(col("g") =!= 0,
          expr("CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))")))
          .as("ssb"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(sa AS DOUBLE)").as("sum_a"),
        expr("CAST(sb AS DOUBLE)").as("sum_b"),
        expr("""CAST(ROUND(
            (CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b) / SQRT(
              ((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / n_a) / (n_a - 1)) / n_a +
              ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / n_b) / (n_b - 1)) / n_b),
          4) AS DOUBLE)""").as("t_welch"))

  /** Benford first-digit audit (the classic fabricated-numbers
    * screen): observed leading-digit distribution of a positive
    * measure vs Benford's log₁₀(1 + 1/d) expectation, both in
    * parts-per-million — observed exactly (integer floor division),
    * expected rounded once from the closed form. Consumers chi-square
    * the dev_ppm column; values < 1 are excluded (no leading digit in
    * [1,9]). One digit-keyed aggregate + a 1-row total broadcast. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .where(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(expr(
        s"CAST(substring(CAST(CAST(FLOOR($valueCol) AS BIGINT) AS STRING), 1, 1) AS INT)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("tot"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        expr("CAST(n_obs * 1000000 div tot AS BIGINT)").as("obs_ppm"),
        expr("""CAST(ROUND(LOG10(CAST(1.0 AS DOUBLE) +
            CAST(1.0 AS DOUBLE) / digit) * 1000000, 0) AS BIGINT)""")
          .as("expected_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("expected_ppm"))
  }

  /** Market-basket association rules (pairwise): for item pairs
    * co-occurring in ≥ `minSupport` baskets, support plus
    * confidence(a→b), confidence(b→a) and lift as EXACT fixed-point
    * parts-per-million (integer floor division — every quantity is a
    * count, so there is no float in the operator at all and no
    * rounding surface between engines). The lift numerator and
    * denominator are widened to DECIMAL(38,0) before the floor
    * division (r9 advice): s_ab·nb·10⁶ and s1·s2 both clear 2⁶³ at
    * large-corpus counts (~3e12 baskets), and Long arithmetic would
    * silently wrap (or throw under ANSI) exactly where the "exact
    * fixed-point at 100 TB" claim matters; the quotient itself is a
    * ppm-scale value that always fits BIGINT. Pair generation is ONE
    * equi-self-join on the basket id: Σ|basket|² work, bounded by the
    * basket-size cap, never an item×item blow-up; item supports and
    * the basket total are a keyed join + a 1-row broadcast scalar. */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val it = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull).distinct()
    val nb = it.agg(count_distinct(col("b")).as("nb"))
    val sup = it.groupBy("i").agg(count(lit(1)).as("s"))
    val pr = it.as("x").join(it.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("i1"), col("y.i").as("i2"))
      .agg(count(lit(1)).as("s_ab"))
      .where(col("s_ab") >= minSupport)
    pr.join(sup.select(col("i").as("i1"), col("s").as("s1")), "i1")
      .join(sup.select(col("i").as("i2"), col("s").as("s2")), "i2")
      .crossJoin(broadcast(nb))
      .select(col("i1").as("item_a"), col("i2").as("item_b"),
        col("s_ab").as("support"),
        expr("CAST(s_ab * 1000000 div s1 AS BIGINT)").as("conf_ab_ppm"),
        expr("CAST(s_ab * 1000000 div s2 AS BIGINT)").as("conf_ba_ppm"),
        expr("""CAST(CAST(s_ab AS DECIMAL(38,0)) * nb * 1000000
            div (CAST(s1 AS DECIMAL(38,0)) * s2) AS BIGINT)""")
          .as("lift_ppm"))
  }

  /** Rolling DISCRETE median per key: the lower median element of the
    * trailing `n`-row frame (warm-up rows use their shorter prefix —
    * pandas' min_periods=1 convention). The window isn't expressible
    * as a native percentile frame, so the frame materializes as a
    * bounded collect_list (≤ n doubles — row-local memory is O(n), a
    * constant) and the median is element selection over the sorted
    * array: an ACTUAL input value, no interpolation, so cross-engine
    * equality is exact with zero rounding. One keyed sort; everything
    * after is row-local codegen. Keep n modest (≤ 256 enforced) — a
    * large-n rolling median wants a two-heap kernel, not a re-sort. */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, n: Int = 15): DataFrame = {
    require(n >= 1 && n <= 256, "frame length must be in [1,256]")
    val w = Window.partitionBy("k").orderBy(col("t").asc, col("id").asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.where(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(tsCol).as("t"), col(idCol).as("id"),
        col(valueCol).cast("double").as("v"))
      .withColumn("__win", collect_list(col("v")).over(w))
      .select(col("k").as(keyCol), col("id").as(idCol), col("t").as(tsCol),
        size(col("__win")).cast("int").as("n_window"),
        expr("element_at(sort_array(__win), CAST((size(__win) + 1) div 2 AS INT))")
          .as("rolling_median"))
  }

  /** Merge overlapping-or-touching [start, end] intervals per key into
    * maximal islands (uptime/coverage consolidation — the set-union
    * complement of [[graft.operators.RangeJoin]]'s pairwise overlap).
    * The classic one-sort shape: order by start, a row opens a NEW
    * island iff its start exceeds the running max of every earlier
    * end (touching endpoints merge), island id = running sum of those
    * openings, then one group-by for the island extents. O(n log n)
    * in ONE keyed sort — never the interval self-join; the pre-group,
    * both windows, and the aggregate reuse the same (key)
    * partitioning, so the whole operator is a single shuffle.
    * Degenerate rows (null bounds, end < start) drop at the scan.
    *
    * DETERMINISM (r13): intervals sharing a start ALWAYS co-island
    * (each spans its own start, so equal starts overlap at that
    * point), so they first collapse to one row per (key, start) —
    * max end + multiplicity. The window sort key (key, start) is
    * then UNIQUE, which makes the island running-sum order-free BY
    * CONSTRUCTION. The pre-r13 form ordered raw rows by (start, end):
    * ties carry DIFFERENT running-max values out of the first window,
    * and any engine that re-sorts between the two window passes
    * (DuckDB's parallel window over materialized CTEs does) may put
    * the non-opener first and split the island — caught as a
    * run-to-run oracle flip on regenerated sf0.1 data. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val in = df
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .select(col(keyCol).as("k"), col(startCol).as("s"), col(endCol).as("e"))
      .groupBy("k", "s")
      .agg(max(col("e")).as("e"), count(lit(1)).as("__cnt"))
    val w = Window.partitionBy("k").orderBy(col("s").asc)
    in
      .withColumn("__pm",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull || col("s") > col("__pm"), 1L).otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("k", "__isl")
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        sum(col("__cnt")).as("n_intervals"))
      .select(col("k").as(keyCol), col("island_start"), col("island_end"),
        col("n_intervals"))
  }

  /** Top user journeys: each key's first `k` step labels (by time,
    * id-tie-broken) joined into a path string, counted across keys,
    * top `topK` paths by frequency. The sankey/flow primitive: which
    * openings dominate, where do sessions start diverging.
    *
    * One keyed window prunes to k rows per key BEFORE any path
    * assembly (early row_number filter — state bounded by k·keys, the
    * tail of long histories never shuffles again); the path builds
    * row-locally from a sorted struct array (collect_list is
    * unordered across partitions — array_sort on the (rn, label)
    * struct restores the only order that exists); the final cut is
    * TakeOrderedAndProject over the path-count table, which is at
    * most label-alphabet^k rows regardless of input size. */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, labelCol: String, k: Int = 3,
      topK: Int = 20): DataFrame = {
    require(k >= 1 && k <= 16, "path length must be in [1,16]")
    require(topK >= 1, "topK must be positive")
    val w = Window.partitionBy("u")
      .orderBy(col("t").asc, col("i").asc)
    val paths = df.select(col(keyCol).as("u"), col(tsCol).as("t"),
        col(idCol).as("i"), col(labelCol).as("l"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy("u")
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(rn, l))), x -> x.l), '>')").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_users").desc, col("path").asc)).cast("int"))
      .select("rank", "path", "n_users")
  }

  def skyline(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val in = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val g = in.groupBy(col(keyCol), col(xCol)).agg(max(col(yCol)).as("__ymax"))
    val w = Window.partitionBy(keyCol).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = g.withColumn("__prev", max(col("__ymax")).over(w))
      .where(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(col(keyCol).as("__k"), col(xCol).as("__x"), col("__ymax"))
    in.join(frontier,
        col(keyCol) === col("__k") && col(xCol) === col("__x") &&
          col(yCol) === col("__ymax"))
      .drop("__k", "__x", "__ymax")
  }
}
