package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Column profiling: the data-quality card an ETL run emits before
  * anyone trains on or joins against a fresh drop — per column: row
  * count, null count, exact distinct count, min and max. The reference
  * surfaces only row totals at its sinks (stdout destination,
  * cf. /root/reference/src/etlp/core.clj:115-146); this is the
  * per-column generalization a 100 TB ingest actually needs to catch
  * schema drift and null storms before they propagate.
  *
  * Shape: ONE aggregate over the input produces a single wide row
  * (every stat for every column as separate agg expressions); a
  * row-local explode then pivots it to one row per column. The exact
  * distinct counts make Catalyst plan an Expand (input ×k for k
  * profiled columns) feeding one two-phase aggregate — a single shuffle
  * whose width is the stat row, not the data. For quick looks at
  * petabyte scale swap `count(distinct)` for `approx_count_distinct`
  * (see [[Approx.distinctCount]]); the gate query keeps exact counts so
  * the oracle can hash-match.
  *
  * min/max are rendered as strings so one output schema fits every
  * column type: floating columns print as `%.4f` (printf semantics are
  * engine-portable where raw double→string formatting is not — Java
  * flips to scientific notation at 1e7, DuckDB does not), everything
  * else casts through its natural string form.
  */
object Profile {
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val isFloating = df.schema.fields.map(f =>
      f.name -> (f.dataType == DoubleType || f.dataType == FloatType)).toMap
    def render(c: String, agg: String): org.apache.spark.sql.Column = {
      val a = expr(s"$agg(`$c`)")
      // format_string renders a NULL arg as the string "null" (Java
      // Formatter semantics); an all-null column must profile as NULL
      if (isFloating(c))
        when(a.isNull, lit(null)).otherwise(format_string("%.4f", a))
      else a.cast("string")
    }
    // internal stat columns are indexed POSITIONALLY (__nn_0, ...), not
    // by profiled-column name: a column named `a.b` would break col()
    // resolution of the derived name (the `$c(...)` agg input itself is
    // backtick-quoted above, which is enough on that side)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(s"`$c`")).as(s"__nn_$i"),
        countDistinct(col(s"`$c`")).as(s"__nd_$i"),
        render(c, "min").as(s"__mn_$i"),
        render(c, "max").as(s"__mx_$i"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stats = array(cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      (col("__rows") - col(s"__nn_$i")).as("n_null"),
      col(s"__nd_$i").as("n_distinct"),
      col(s"__mn_$i").as("min_s"),
      col(s"__mx_$i").as("max_s"))
    }: _*)
    wide.select(explode(stats).as("p")).select("p.*")
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard load-over-load drift monitor (PSI < 0.1
    * stable, 0.1–0.25 moderate shift, > 0.25 investigate). Bin edges
    * come from the BASELINE's [min, max] split into `bins` equal
    * widths (the convention: the baseline defines the reference
    * distribution; current values outside its range clamp into the
    * edge bins). Both sides take add-1 smoothing so an empty bin
    * cannot divide by zero or ln(0).
    *
    * Plan: two single-row min/max aggregates (broadcast constant
    * attach), two `bins`-keyed count aggregates, and a `bins`-row
    * result frame — the data is scanned once per side and nothing
    * wider than a bin id ever shuffles. Cross-engine exactness: counts
    * are exact integers; each bin's PSI term is ROUND(·,6) and the
    * total is their exact DECIMAL sum replicated onto every row (the
    * bins-row frame makes that a constant attach, not a window).
    *
    * @return one row per bin: (bin, n_base, n_cur, psi_term,
    *         psi_total). */
  def psiDrift(base: DataFrame, current: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "psiDrift needs at least 2 bins")
    val spark = base.sparkSession
    val stats = base.agg(
      min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx"))
    def binCounts(df: DataFrame, out: String): DataFrame = df
      .select(col(valueCol).cast("double").as("v")).where(col("v").isNotNull)
      .crossJoin(broadcast(stats))
      .select(expr(
        s"""CAST(LEAST(GREATEST(
           |  IF(mx = mn, 0.0, FLOOR((v - mn) / ((mx - mn) / $bins))),
           |0.0), $bins - 1.0) AS INT)""".stripMargin).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val frame = spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(binCounts(base, "n_base"), Seq("bin"), "left")
      .join(binCounts(current, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = frame.agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    val terms = frame.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_base"), col("n_cur"), expr(
        s"""CAST(ROUND(
           |  ((n_base + 1.0) / (tb + $bins) - (n_cur + 1.0) / (tc + $bins))
           |  * LN(((n_base + 1.0) / (tb + $bins))
           |      / ((n_cur + 1.0) / (tc + $bins))),
           |6) AS DOUBLE)""".stripMargin).as("psi_term"))
    val total = terms.agg(
      sum(expr("CAST(psi_term AS DECIMAL(38,6))")).as("t"))
      .select(expr("CAST(t AS DOUBLE)").as("psi_total"))
    terms.crossJoin(broadcast(total))
  }
}
