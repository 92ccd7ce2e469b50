package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality rules: `(name, predicateSql)` pairs checked
  * in ONE aggregate pass — per rule: rows checked, rows violating, and
  * whether the rule holds. The generalization of the reference's
  * error-channel split (cf. /root/reference/src/etlp/core.clj wrap-error
  * routing): instead of routing each bad row, an expectations suite
  * reports suite-level counts a pipeline can gate a promotion on.
  *
  * A NULL predicate result (NULL input to a comparison) counts as a
  * violation — "unknown" must not pass a gate silently.
  *
  * Scale: every rule compiles to `sum(case when NOT coalesce(pred,
  * false) then 1 else 0 end)` inside ONE two-phase aggregate — a single
  * scan of the input, no shuffle wider than one row of counters, rules
  * evaluated inside whole-stage codegen. */
object Quality {
  def checkRules(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "checkRules: empty rule list")
    require(rules.map(_._1).distinct.size == rules.size,
      "checkRules: duplicate rule names")
    // internal columns are indexed POSITIONALLY (__v_0, __v_1, ...), not
    // by rule name: a caller's rule name may contain dots/backticks that
    // break col() resolution, or collide with a real __v_* input column
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      // outer coalesce: sum over ZERO rows is NULL — an empty input has
      // zero violations, and `passed` must be a real boolean
      coalesce(sum(when(!coalesce(expr(pred), lit(false)), 1L).otherwise(0L)),
        lit(0L)).as(s"__v_$i")
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val out = array(rules.zipWithIndex.map { case ((name, _), i) => struct(
      lit(name).as("rule"),
      col("__rows").as("n_checked"),
      col(s"__v_$i").as("n_violations"),
      (col(s"__v_$i") === 0L).as("passed"))
    }: _*)
    wide.select(explode(out).as("r")).select("r.*")
  }
}
