package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single right row
  * with the greatest `rightTime <= leftTime` within the same key. The
  * canonical time-series enrichment operator Spark's API lacks.
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
  * `tieBreak` (deterministic).
  *
  * The payload travels as ONE struct column through the window, so the
  * winning right row is selected atomically: a right row with NULL in
  * some payload column contributes that NULL (rather than letting an
  * older row's non-null value bleed through per-column), and the output
  * never mixes columns from different right rows.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("graft_k", col(leftKey))
      .withColumn("graft_t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("graft_isleft", lit(1))
      .withColumn("graft_tie", lit(0L))
      .withColumn("graft_payload", lit(null).cast(payloadStructType))
    val r = right
      .withColumn("graft_k", col(rightKey))
      // cast: TIMESTAMP_NTZ columns (native parquet reads) aren't
      // accepted by unix_micros; session tz is UTC so the cast is exact
      .withColumn("graft_t", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("graft_isleft", lit(0))
      .withColumn("graft_tie", col(tieBreak).cast("long"))
      // the whole winning row travels as one non-null struct
      .withColumn("graft_payload",
        struct(rightPayload.map(c => col(c).as(c)): _*))
    val rAligned = leftCols.foldLeft(r)((df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = leftCols ++
      Seq("graft_k", "graft_t", "graft_isleft", "graft_tie", "graft_payload")
    val unioned = l.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))
    // right rows first at equal time (asof is <=), then by tiebreak so
    // last() picks the winning right row; ignoreNulls skips only LEFT
    // rows (their payload struct is NULL) — a right row's struct is
    // always non-null, even when its fields are
    val w = Window.partitionBy("graft_k")
      .orderBy(col("graft_t").asc, col("graft_isleft").asc, col("graft_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("graft_payload",
      last(col("graft_payload"), ignoreNulls = true).over(w))
    carried.where(col("graft_isleft") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"graft_payload.$c").as(c)): _*)
  }
}
