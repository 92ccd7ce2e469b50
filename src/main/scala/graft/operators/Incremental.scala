package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep per-key partial aggregates
  * (count / decimal-exact sum / min / max) as a small stored table and
  * fold each new batch in WITHOUT rescanning history — the production
  * nightly-ingest shape for dashboard rollups (the exact-aggregate
  * sibling of [[Approx]]'s mergeable HLL sketches; same pattern the
  * reference applies with its reducer-over-stream loads,
  * cf. /root/reference/src/etlp/reducers.clj — fold state + batch).
  *
  * Correct because every stored measure is a commutative monoid:
  * counts and decimal sums add, min/max combine — so
  * merge(partials(A), partials(B)) == partials(A ∪ B) exactly (the
  * sum is DECIMAL, not IEEE, so association order cannot change it;
  * spec-pinned). Derived statistics (avg) are computed only at
  * [[finish]] time from the exact measures.
  *
  * Scale: each batch costs one two-phase aggregate over the batch plus
  * a merge keyed by the (small) key dimension; history is never
  * re-read. State is one row per key — bytes, not data. */
object IncrementalAgg {
  /** Per-key partial aggregates of `valueCol`: (keys…, n, sum_v
    * DECIMAL(38,6), min_v, max_v). NULL values count toward no
    * measure.
    *
    * The stored sum is DECIMAL(38,6) — 32 integer digits — NOT the
    * input's (18,6): this state lives forever and keeps growing, and a
    * narrower cast would overflow to NULL silently under non-ANSI SQL
    * once the lifetime sum passes 1e12, corrupting the state with no
    * error (1e12 is a perfectly realistic lifetime byte/revenue total;
    * 1e32 is not). */
  def partials(df: DataFrame, keyCols: Seq[String], valueCol: String)
      : DataFrame = {
    require(keyCols.nonEmpty, "partials: need at least one key column")
    df.where(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))
  }

  /** Fold partial-aggregate tables (same schema) into one: counts and
    * sums add, min/max combine. */
  def merge(parts: Seq[DataFrame], keyCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "merge: no partials given")
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_v")).cast("decimal(38,6)").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Read-time view over the state: rounded sum/avg doubles for
    * reporting, exact measures untouched underneath. */
  def finish(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.select(keyCols.map(col) ++ Seq(
      col("n"),
      expr("CAST(ROUND(sum_v, 2) AS DOUBLE)").as("sum_v"),
      col("min_v"), col("max_v"),
      expr("CAST(ROUND(CAST(sum_v AS DOUBLE) / n, 4) AS DOUBLE)")
        .as("avg_v")): _*)
}
