package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: given two keyed snapshots of the same
  * table, emit every key whose row was added, removed, or changed —
  * the data-engineering "what moved between yesterday's load and
  * today's" audit, and the verification step behind any CDC replay
  * (cf. /root/reference/README.md's warehouse-load examples; the
  * reference validates loads by row-count assertions, this is the
  * row-level generalization).
  *
  * ONE full-outer equi-join on the key columns — both sides shuffle
  * by key once, comparison is row-local, and only non-identical rows
  * survive the filter, so the output stream is proportional to the
  * churn, not the table. Column comparisons use null-safe equality
  * (`<=>`): a NULL→value transition reports as changed, NULL→NULL
  * does not. At 100 TB both sides would be bucketed on the key and
  * the join co-located; nothing here prevents that.
  */
object Reconcile {
  /** Returns (keyCols…, status, changed_cols): status ∈
    * added | removed | changed; `changed_cols` is the comma-joined
    * list of differing compare columns (empty for added/removed).
    * Unchanged rows are dropped. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff: need at least one key column")
    require(compareCols.nonEmpty, "diff: need at least one compare column")
    val a = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("graft_a", lit(1)).as("a")
    val b = newSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("graft_b", lit(1)).as("b")
    val on = keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val changed = concat_ws(",", compareCols.map(c =>
      when(!(col(s"a.$c") <=> col(s"b.$c")), lit(c))): _*)
    a.join(b, on, "full_outer")
      .withColumn("graft_changed", changed)
      .withColumn("status",
        when(col("a.graft_a").isNull, lit("added"))
          .when(col("b.graft_b").isNull, lit("removed"))
          .when(col("graft_changed") =!= "", lit("changed")))
      .where(col("status").isNotNull)
      .select(keyCols.map(k =>
          coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++
        Seq(col("status"),
          when(col("status") === "changed", col("graft_changed"))
            .otherwise(lit("")).as("changed_cols")): _*)
  }

  /** Sequence-completeness audit: which ids of the contiguous
    * [min, max] range are MISSING from `df`, reported per fixed-width
    * bucket (count + extremes) — the nightly "did ingestion drop
    * anything" check. Distributed shape: a `spark.range` spine over
    * the observed bounds anti-joined against the distinct ids, then a
    * bucket-keyed aggregate — no global window, no ordered scan; the
    * only driver traffic is the two boundary scalars (the sanctioned
    * bounded-metadata collect). Cost is O(id range), which a sequence
    * audit cannot avoid — it must account for every id. */
  def sequenceGaps(df: DataFrame, idCol: String,
      bucketWidth: Long = 1000L): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    val spark = df.sparkSession
    val ids = df.select(col(idCol).cast("long").as("id"))
      .where(col("id").isNotNull).distinct()
    val bounds = ids.agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect()
    if (bounds.isEmpty || bounds.head.isNullAt(0)) {
      ids.select(col("id").as("bucket"),
        col("id").as("n_missing"), col("id").as("min_missing"),
        col("id").as("max_missing")).limit(0)
    } else {
      val (lo, hi) = (bounds.head.getLong(0), bounds.head.getLong(1))
      spark.range(lo, hi + 1).select(col("id"))
        .join(ids, Seq("id"), "left_anti")
        .groupBy(expr(s"id div $bucketWidth").as("bucket"))
        .agg(count(lit(1)).as("n_missing"), min(col("id")).as("min_missing"),
          max(col("id")).as("max_missing"))
    }
  }
}
