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

  /** Rule-based row QUARANTINE: evaluate every named predicate per row
    * and emit the rows violating at least one, with the list of
    * violated rule names in rule-definition order — [[checkRules]]
    * reports suite-level counts; this is the row-level error channel a
    * pipeline actually routes (clean rows continue, quarantined rows
    * land in a triage table with WHY attached). A NULL predicate
    * result counts as a violation (checkRules' rule: an unverifiable
    * row is not a clean row). Entirely scan-stage row-local — zero
    * shuffle at any scale; the clean side is the complement filter on
    * the same expression. */
  /** The violated-rule-name array for `rules`, in definition order —
    * the row-local core shared by [[quarantine]] and the streaming
    * split sink (one definition, so batch and stream verdicts cannot
    * drift). */
  def violationArray(rules: Seq[(String, String)]): org.apache.spark.sql.Column = {
    require(rules.nonEmpty, "violationArray: empty rule list")
    require(rules.map(_._1).distinct.size == rules.size,
      "violationArray: duplicate rule names")
    filter(array(rules.map { case (name, pred) =>
      when(!coalesce(expr(pred), lit(false)), lit(name))
    }: _*), _.isNotNull)
  }

  def quarantine(df: DataFrame, keyCols: Seq[String],
      rules: Seq[(String, String)]): DataFrame = {
    require(keyCols.nonEmpty, "quarantine: empty key list")
    df.select(keyCols.map(col) :+ violationArray(rules).as("__fr"): _*)
      .where(size(col("__fr")) > 0)
      .select(keyCols.map(col) :+
        size(col("__fr")).cast("int").as("n_failed") :+
        array_join(col("__fr"), ",").as("failed_rules"): _*)
  }

  /** Local-recoding k-anonymity with a one-step generalization
    * hierarchy: rows whose detail quasi-identifier (QI) combination
    * occurs ≥ k times keep it (`anon_level` 0); the rest generalize to
    * the coarse QI, kept if THAT class reaches k among the generalized
    * rows (`anon_level` 1), else fully suppressed to `*`
    * (`anon_level` 2). Guarantee: every emitted `qi_out` equivalence
    * class except `*` has ≥ k members — level-0 rows never join a
    * level-1 class because their output string renders the detail
    * columns, never the coarse ones. A NULL detail QI never forms a
    * detail class (the row takes the generalization path and is counted
    * there); a NULL coarse QI matches no class count and suppresses to
    * `*` ("unknown" must not leak, the [[checkRules]] discipline).
    *
    * Scale shape: class sizes come from two-phase GROUP BY aggregates
    * over the QI domains (bounded — QI hierarchies are dimension-like),
    * broadcast back onto the fact; the fact table is scanned, never
    * shuffled — no window over low-cardinality QI partitions (that
    * form puts entire QI classes on single tasks and dies on skew). */
  def kAnonymize(df: DataFrame, qiDetail: Seq[String], qiCoarse: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, s"kAnonymize: k must be >= 2, got $k")
    require(qiDetail.nonEmpty && qiCoarse.nonEmpty,
      "kAnonymize: empty QI column list")
    val c0 = df.groupBy(qiDetail.map(col): _*).agg(count(lit(1)).as("__n0"))
    val j0 = df.join(broadcast(c0), qiDetail, "left")
    // null detail QI -> no c0 match -> __n0 null: still a generalization
    // candidate, so it must be COUNTED in its coarse class
    val c1 = j0.where(coalesce(col("__n0"), lit(0L)) < k)
      .groupBy(qiCoarse.map(col): _*).agg(count(lit(1)).as("__n1"))
    j0.join(broadcast(c1), qiCoarse, "left")
      .withColumn("anon_level",
        when(col("__n0") >= k, 0).when(col("__n1") >= k, 1).otherwise(2))
      .withColumn("qi_out",
        when(col("anon_level") === 0, concat_ws("/", qiDetail.map(col): _*))
          .when(col("anon_level") === 1, concat_ws("/", qiCoarse.map(col): _*))
          .otherwise(lit("*")))
      .drop("__n0", "__n1")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) over an
    * anonymized release: per equivalence class, the count of DISTINCT
    * sensitive values and whether it reaches `l`. k-anonymity bounds
    * re-identification; l-diversity bounds attribute DISCLOSURE — a
    * k-sized class whose members all share one sensitive value still
    * leaks it, and this is the check that catches that. One keyed
    * two-phase aggregate over the release table. */
  def lDiversity(release: DataFrame, classCols: Seq[String],
      sensitiveCol: String, l: Int = 3): DataFrame = {
    require(l >= 2, s"lDiversity: l must be >= 2, got $l")
    require(classCols.nonEmpty, "lDiversity: empty class column list")
    release.groupBy(classCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_ok", col("n_sensitive") >= l)
  }

  /** ε-differentially-private count release (Laplace mechanism,
    * sensitivity 1) with DETERMINISTIC seeded noise: the per-key draw
    * u ∈ [−0.5, 0.5) comes from 52 bits of the key's salted md5 via
    * the inverse CDF − sign(u)·ln(1 − 2|u|)/ε. Determinism is per
    * (salt, key): a release is exactly reproducible (and auditable)
    * given its salt; production rotates the salt per release — the
    * privacy guarantee is that of Laplace noise over the salt draw.
    * GREATEST(·, 1e-12) guards the measure-zero |u| = 0.5 pole.
    * Noise rides the scan-stage projection after a two-phase count —
    * nothing here touches row-level data post-aggregate.
    *
    * Output: (keyCol, dp_n) — the TRUE count is intentionally absent
    * from the release. A NULL key releases NULL (concat propagates the
    * NULL through the hash on any engine) — filter or map the unknown
    * class upstream if it must be released. */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double,
      salt: String): DataFrame = {
    require(epsilon > 0, s"dpCounts: epsilon must be > 0, got $epsilon")
    // both interpolate into expr() strings below: a quote in the salt
    // would break parsing (or silently change the hashed prefix), and a
    // keyCol needing backticks would mis-parse — reject, don't escape
    require(salt.matches("[A-Za-z0-9._-]+"),
      s"dpCounts: salt must match [A-Za-z0-9._-]+, got '$salt'")
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"dpCounts: keyCol must be a plain identifier, got '$keyCol'")
    df.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .withColumn("u", expr(
        s"""(CAST(CONV(SUBSTRING(MD5(CONCAT('graft-dp:$salt:',
           |  CAST($keyCol AS STRING))), 1, 13), 16, 10) AS DOUBLE)
           |  / 4503599627370496.0) - CAST(0.5 AS DOUBLE)""".stripMargin))
      .withColumn("noise", expr(
        s"""-SIGN(u) * LN(GREATEST(CAST(1.0 AS DOUBLE) - 2 * ABS(u),
           |  CAST(1e-12 AS DOUBLE))) / CAST($epsilon AS DOUBLE)""".stripMargin))
      .select(col(keyCol),
        expr("CAST(ROUND(n + noise, 4) + 0.0 AS DOUBLE)").as("dp_n"))
  }
}
