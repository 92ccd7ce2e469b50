package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, made shuffle-joinable.
  *
  * `left.time BETWEEN right.start AND right.end` has no equi-condition,
  * so open-source Spark plans it as a BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts) — O(L·R) work that
  * cannot run at corpus scale. Binning recovers an equi-join: bucket
  * the time axis into fixed `binMicros` bins, explode each interval to
  * the bins it covers, and join on (key, bin). A point falls in exactly
  * ONE bin while the interval row is exploded to DISTINCT bins, so each
  * qualifying (left, right) pair meets exactly once — no post-join
  * dedup — and the residual BETWEEN filter inside the join condition
  * discards same-bin non-overlaps. Exact: identical result set to the
  * naive inequality join (the oracle for q_range_join IS the naive
  * form).
  *
  * Scale: shuffle keys are (join key, bin) — both narrow; the explode
  * factor is ceil(interval/binMicros)+1, so pick `binMicros` near the
  * typical interval length (30-day windows → 30-day bins ⇒ ≤2 bins per
  * interval). Skewed keys compose with [[Skew.saltedJoin]] the usual
  * way.
  */
object RangeJoin {

  /** Inner join `left ⋈ right` on `leftKey == rightKey AND
    * left.timeCol ∈ [right.startCol, right.endCol]` (inclusive ends). */
  def pointInInterval(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      timeCol: String, startCol: String, endCol: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive: $binMicros")
    require(!left.columns.contains("graft_bin") &&
      !right.columns.contains("graft_bin"),
      "inputs must not already carry a graft_bin column")
    val bin = lit(binMicros)
    // NTZ-tolerant epoch: unix_micros takes TIMESTAMP only; a cast from
    // TIMESTAMP_NTZ is stable under the fixed UTC session timezone
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    val lb = left.withColumn("graft_bin", floor(us(col(timeCol)) / bin))
    val rb = right.withColumn("graft_bin",
      explode(sequence(
        floor(us(col(startCol)) / bin),
        floor(us(col(endCol)) / bin))))
    lb.join(rb,
        lb("graft_bin") === rb("graft_bin") &&
          lb(leftKey) === rb(rightKey) &&
          lb(timeCol) >= rb(startCol) && lb(timeCol) <= rb(endCol))
      .drop("graft_bin")
  }

  /** Interval×interval OVERLAP join: `left ⋈ right` on key equality and
    * `[lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅` (half-open; touching
    * intervals do not overlap). The session-stitching / ad-exposure ∩
    * visit primitive — a different contract from [[pointInInterval]]
    * (both sides extended).
    *
    * Both sides explode to the bins they cover and meet on (key, bin).
    * An overlapping pair shares EVERY bin its intersection covers, so a
    * naive equi-join would duplicate it; instead of a post-join DISTINCT
    * (a second shuffle over the result), the join keeps a pair only in
    * the bin containing the LATER START — exactly one bin per pair, by
    * construction inside the intersection. Exact: same result set as
    * the naive inequality join (the oracle runs the naive form).
    * Explode factor and bin sizing follow [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive: $binMicros")
    require(!left.columns.contains("graft_bin") &&
      !right.columns.contains("graft_bin"),
      "inputs must not already carry a graft_bin column")
    val bin = lit(binMicros)
    def us(c: Column) = unix_micros(c.cast("timestamp"))
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("graft_bin",
        explode(sequence(floor(us(col(s)) / bin), floor(us(col(e)) / bin))))
    val lb = binned(left, lStart, lEnd)
    val rb = binned(right, rStart, rEnd)
    lb.join(rb,
        lb("graft_bin") === rb("graft_bin") &&
          lb(leftKey) === rb(rightKey) &&
          lb(lStart) < rb(rEnd) && rb(rStart) < lb(lEnd) &&
          floor(greatest(us(lb(lStart)), us(rb(rStart))) / bin) ===
            lb("graft_bin"))
      .drop("graft_bin")
  }
}
