package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single closest
  * right row within the same key: the greatest `rightTime <= leftTime`
  * (`direction = "backward"`, the default) or the smallest
  * `rightTime >= leftTime` (`"forward"`), optionally bounded by a
  * `toleranceUs` horizon (a match farther than the tolerance yields
  * NULL payload, the left row still emits — pandas merge_asof
  * semantics). The canonical time-series enrichment operator Spark's
  * API lacks.
  *
  * Spark-first implementation: NOT the naive
  * `join(key && rt <= lt) + rank` — that explodes every left row by its
  * full right history before pruning (quadratic in rows-per-key).
  * Instead the union+window trick: interleave both sides on one
  * timeline per key, sorted so right rows precede left rows at equal
  * timestamps, and carry the latest right payload forward with
  * `last(_, ignoreNulls = true)`. One shuffle by key, one sort — the
  * same cost envelope as any windowed aggregate, linear in rows. Ties
  * among right rows at one timestamp resolve to the largest
  * `tieBreak` (deterministic). The forward direction is the backward
  * algorithm on the NEGATED timeline — same plan, no second code path.
  *
  * The payload travels as ONE struct column through the window, so the
  * winning right row is selected atomically: a right row with NULL in
  * some payload column contributes that NULL (rather than letting an
  * older row's non-null value bleed through per-column), and the output
  * never mixes columns from different right rows. The struct also
  * carries the winner's timestamp, which is what the tolerance check
  * reads — it must test the WINNING row's distance, not "any row
  * existed within range".
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], tieBreak: String,
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward")(direction),
      s"direction must be backward|forward, got $direction")
    toleranceUs.foreach(t => require(t >= 0, "tolerance must be >= 0"))
    // forward = backward on the negated timeline
    val sign = if (direction == "backward") 1L else -1L
    val leftCols = left.columns.toSeq
    val payloadStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("graft_rt",
        org.apache.spark.sql.types.LongType) +:
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("graft_k", col(leftKey))
      .withColumn("graft_t",
        lit(sign) * unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("graft_isleft", lit(1))
      .withColumn("graft_tie", lit(0L))
      .withColumn("graft_payload", lit(null).cast(payloadStructType))
    val r = right
      .withColumn("graft_k", col(rightKey))
      // cast: TIMESTAMP_NTZ columns (native parquet reads) aren't
      // accepted by unix_micros; session tz is UTC so the cast is exact
      .withColumn("graft_t",
        lit(sign) * unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("graft_isleft", lit(0))
      .withColumn("graft_tie", col(tieBreak).cast("long"))
      // the whole winning row travels as one non-null struct
      .withColumn("graft_payload",
        struct(col("graft_t").as("graft_rt") +:
          rightPayload.map(c => col(c).as(c)): _*))
    val rAligned = leftCols.foldLeft(r)((df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = leftCols ++
      Seq("graft_k", "graft_t", "graft_isleft", "graft_tie", "graft_payload")
    val unioned = l.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    // right rows first at equal time (asof includes equality), then by
    // tiebreak so last() picks the winning right row; ignoreNulls skips
    // only LEFT rows (their payload struct is NULL) — a right row's
    // struct is always non-null, even when its fields are
    val w = Window.partitionBy("graft_k")
      .orderBy(col("graft_t").asc, col("graft_isleft").asc, col("graft_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("graft_payload",
      last(col("graft_payload"), ignoreNulls = true).over(w))
    // on the (possibly negated) timeline the winner's distance is
    // always graft_t - winner.graft_rt >= 0, for both directions
    val withinTol = toleranceUs.fold(lit(true))(t =>
      col("graft_t") - col("graft_payload.graft_rt") <= t)
    val gated = carried.withColumn("graft_payload",
      when(withinTol, col("graft_payload"))
        .otherwise(lit(null).cast(payloadStructType)))
    gated.where(col("graft_isleft") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"graft_payload.$c").as(c)): _*)
  }

  /** Nearest as-of: the right row minimizing |rightTime − leftTime|
    * within the same key (merge_asof's third direction), optionally
    * bounded by `toleranceUs`. ONE shuffle computes BOTH directional
    * candidates: each is `last(payload)` over a running
    * (unboundedPreceding, currentRow) frame — the backward candidate on
    * the ascending timeline, the forward candidate on the DESCENDING
    * one — then a row-local comparison picks the closer one. Two sorts
    * share the single key exchange. Running frames matter here: Spark's
    * UnboundedFollowing frame re-aggregates from each row to partition
    * end (O(n²) per key), so the forward candidate is expressed as a
    * reversed running frame instead of `first() over (currentRow,
    * unboundedFollowing)` — linear CPU on hot keys. No second pass, no
    * join, no pair explosion.
    *
    * Tie rules (deterministic, mirrored by the oracle): equal distance
    * prefers the backward candidate; among right rows at one
    * timestamp, backward resolves to the LARGEST `tieBreak`, forward
    * to the SMALLEST. A right row exactly at the left time is a
    * backward candidate at distance 0 (it sorts before the left row,
    * so the strictly-following forward frame never sees it — which is
    * fine: nothing can beat distance 0 through the backward branch). */
  def joinNearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], tieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    toleranceUs.foreach(t => require(t >= 0, "tolerance must be >= 0"))
    val leftCols = left.columns.toSeq
    val payloadStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("graft_rt",
        org.apache.spark.sql.types.LongType) +:
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("graft_k", col(leftKey))
      .withColumn("graft_t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("graft_isleft", lit(1))
      .withColumn("graft_tie", lit(0L))
      .withColumn("graft_payload", lit(null).cast(payloadStructType))
    val r = right
      .withColumn("graft_k", col(rightKey))
      .withColumn("graft_t", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("graft_isleft", lit(0))
      .withColumn("graft_tie", col(tieBreak).cast("long"))
      .withColumn("graft_payload",
        struct(col("graft_t").as("graft_rt") +:
          rightPayload.map(c => col(c).as(c)): _*))
    val rAligned = leftCols.foldLeft(r)((df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = leftCols ++
      Seq("graft_k", "graft_t", "graft_isleft", "graft_tie", "graft_payload")
    val unioned = l.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    val wb = Window.partitionBy("graft_k")
      .orderBy(col("graft_t").asc, col("graft_isleft").asc,
        col("graft_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the forward frame, reversed: descending (t, isleft, tie) puts a
    // left row BEFORE the right rows at its own timestamp (isleft 1 > 0
    // desc) — so, exactly like the ascending forward frame, an equal-time
    // right row is only a backward candidate — and last() lands on the
    // SMALLEST tieBreak among equal-time right rows (tie desc), matching
    // the documented forward tie rule.
    val wf = Window.partitionBy("graft_k")
      .orderBy(col("graft_t").desc, col("graft_isleft").desc,
        col("graft_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def gate(p: Column, dist: Column): Column = {
      val inTol = toleranceUs.fold(lit(true))(t => dist <= t)
      when(p.isNotNull && inTol, p).otherwise(lit(null).cast(payloadStructType))
    }
    val picked = unioned
      .withColumn("graft_bp",
        last(col("graft_payload"), ignoreNulls = true).over(wb))
      .withColumn("graft_fp",
        last(col("graft_payload"), ignoreNulls = true).over(wf))
      .where(col("graft_isleft") === 1)
      .withColumn("graft_bp",
        gate(col("graft_bp"), col("graft_t") - col("graft_bp.graft_rt")))
      .withColumn("graft_fp",
        gate(col("graft_fp"), col("graft_fp.graft_rt") - col("graft_t")))
      .withColumn("graft_pick",
        when(col("graft_bp").isNull, col("graft_fp"))
          .when(col("graft_fp").isNull, col("graft_bp"))
          .when(col("graft_fp.graft_rt") - col("graft_t") <
                col("graft_t") - col("graft_bp.graft_rt"), col("graft_fp"))
          .otherwise(col("graft_bp"))) // tie → backward
    picked.select(leftCols.map(col) ++
      rightPayload.map(c => col(s"graft_pick.$c").as(c)): _*)
  }
}
