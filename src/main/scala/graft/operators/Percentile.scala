package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles without a per-group value buffer.
  *
  * Spark's exact `PERCENTILE` aggregate accumulates a value→count map
  * per group; over a ~continuous DOUBLE column the merge buffer holds
  * each group's full distinct-value set — a single-buffer memory cliff
  * on big groups. This operator computes the SAME interpolated order
  * statistics (position p·(n−1), linear interpolation between the two
  * straddling values — the PERCENTILE / quantile_cont definition) in
  * bounded memory via a classic binned two-pass plan:
  *
  *   1. per-group (count, min, max) — a two-phase aggregate, counters
  *      only;
  *   2. per-(group, bin) counts over a fixed `bins`-wide grid between
  *      the group's min and max — shuffle rows are (group, bin) pairs;
  *      a running sum over each group's ≤`bins` count rows locates the
  *      bin holding each target rank and the rank's offset inside it;
  *   3. a second scan re-bins only rows landing in target bins and
  *      picks the needed order statistics by within-bin `row_number`
  *      (sort-based, spillable — never an in-memory map).
  *
  * Every aggregation buffer is O(1); the widest shuffle is the
  * (group, bin) count table, bounded by groups × bins regardless of row
  * count — the plan survives groups of any size, which is exactly what
  * the value-map aggregate does not. Cost: two scans of the input plus
  * one scan-sized join, all key-partitioned.
  *
  * Returns one row per (group, percentile): (groupCol, p, pv) with pv
  * rounded to `roundTo` decimals (cross-engine float discipline — the
  * interpolation `lower + (upper − lower)·frac` is the same expression
  * DuckDB's quantile_cont evaluates, so rounded results hash-match).
  */
object Percentile {
  def binned(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], bins: Int = 4096, roundTo: Int = 2): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    require(bins > 0, "bins must be positive")
    val v = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
    val stats = v.groupBy("g").agg(count(lit(1)).as("n"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))

    // bin assignment, shared by pass 2 and pass 3; a degenerate group
    // (mn == mx) puts everything in bin 0 — the order statistic there
    // is still exact
    def binOf(value: org.apache.spark.sql.Column) =
      when(col("mx") === col("mn"), lit(0))
        .otherwise(least(
          greatest(floor((value - col("mn")) /
            ((col("mx") - col("mn")) / bins)), lit(0.0)),
          lit((bins - 1).toDouble))).cast("int")

    val withBin = v.join(stats, "g").withColumn("bin", binOf(col("v")))
    val counts = withBin.groupBy("g", "bin").agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy("g").orderBy("bin")))
      .withColumn("lo_cum", col("cum") - col("c"))

    // target ranks: rk = p·(n−1) (0-based), straddled by i0 = ⌊rk⌋ and
    // i1 = ⌈rk⌉; the fetch set is the DISTINCT (g, idx) pairs (i0 == i1
    // whenever frac == 0)
    val targets = stats
      .select(col("g"), col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("rk", col("p") * (col("n") - 1).cast("double"))
      .withColumn("i0", floor(col("rk")).cast("long"))
      .withColumn("i1", ceil(col("rk")).cast("long"))
    val needIdx = targets
      .select(col("g"), explode(array(col("i0"), col("i1"))).as("idx"))
      .distinct()
    // locate each needed rank's bin and its 0-based offset inside it.
    // Columns are alias-renamed to fresh names (fg/fidx/fbin/j): located
    // is an ancestor of the pass-3 scan below via needBins, so reusing
    // its exprIds on both join sides would trip DetectAmbiguousSelfJoin.
    val located = needIdx.join(cum, Seq("g"))
      .where(col("idx") >= col("lo_cum") && col("idx") < col("cum"))
      .select(col("g").as("fg"), col("idx").as("fidx"), col("bin").as("fbin"),
        (col("idx") - col("lo_cum")).as("j"))

    // pass 3: only rows in needed bins are re-read; the within-bin sort
    // is a window (spillable), never an aggregation buffer
    val needBins = located
      .select(col("fg").as("g"), col("fbin").as("bin")).distinct()
    val fetched = withBin.join(needBins, Seq("g", "bin"))
      .withColumn("rn", row_number()
        .over(Window.partitionBy("g", "bin").orderBy(col("v"))) - 1)
    val ordStats = fetched.join(located,
        col("g") === col("fg") && col("bin") === col("fbin") &&
          col("rn") === col("j"))
      .select(col("fg").as("sg"), col("fidx").as("sidx"), col("v").as("sv"))

    targets.as("t")
      .join(ordStats.as("lo"),
        col("t.g") === col("lo.sg") && col("t.i0") === col("lo.sidx"))
      .join(ordStats.as("hi"),
        col("t.g") === col("hi.sg") && col("t.i1") === col("hi.sidx"))
      .select(col("t.g").as(groupCol), col("t.p").as("p"),
        expr(s"CAST(ROUND(lo.sv + (hi.sv - lo.sv) * (t.rk - t.i0), $roundTo)" +
          " AS DOUBLE)").as("pv"))
  }
}
