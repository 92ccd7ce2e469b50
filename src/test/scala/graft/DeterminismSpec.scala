package graft

import org.apache.spark.sql.functions._

/** Per-run slice of the determinism sweep (the full inventory runs
  * through `graft.DeterminismCheck` in the selfcheck loop): the window
  * family — the class the r13 q_interval_merge tie bug lived in — plus
  * a TIES-EVERYWHERE fixture that the testdata may or may not provide,
  * and a deliberately partition-dependent query proving the harness
  * actually fires. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // every UNBOUNDED..N window / ordered-dedup / island gate in §2 —
  // the family where a non-unique sort key turns ties into coin flips
  private val windowFamily = Seq(
    "q_window", "q_window_frame", "q_window_funcs", "q_window_pick",
    "q_window_range", "q_window_ignore_nulls", "q_rolling_median",
    "q_interval_merge", "q_topk_perkey", "q_streaks", "q_trailing_distinct",
    "q_sessionize", "q_transitions", "q_ewma", "xf_dedupe", "q_paths")

  test("window family: results invariant to shuffle width and scan splits") {
    val bad = Determinism.sweep(spark, windowFamily, sf)
    assert(bad.isEmpty,
      s"partitioning-dependent gates: ${bad.map(_._1).mkString(", ")}")
  }

  test("ties-everywhere fixture: dense-tie windows stay deterministic") {
    // 2000 rows, every (g, ts) shared by ~10 rows — maximal tie
    // pressure; the unique-id tiebreaker is what makes this legal
    val ties = spark.range(2000).select(
      (col("id") % 5).as("g"), (col("id") % 40).as("ts"),
      col("id").as("uid"), (col("id") % 7).as("v"))
    def q = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("ts"), col("uid"))
      ties.select(col("g"), col("uid"),
        sum(col("v")).over(w).as("running"),
        row_number().over(w).as("rn"))
    }
    val a = Determinism.hashOf(q)
    val b = Determinism.withConf(spark, Determinism.alternate)(
      Determinism.hashOf(q))
    assert(a == b, "tie fixture diverged — unique tiebreaker broken")
  }

  test("the harness fires: a partition-dependent query hashes differently") {
    // per-partition row counts after a shuffle ARE the shuffle width —
    // the canonical deliberately-broken fixture; if the sweep cannot
    // tell these runs apart it can't catch a real tie bug either
    def q = spark.range(1000).repartition(col("id"))
      .mapPartitions(it => Iterator(it.size)).toDF("rows_in_partition")
    val a = Determinism.hashOf(q)
    val b = Determinism.withConf(spark, Determinism.alternate)(
      Determinism.hashOf(q))
    assert(a != b, "sweep failed to detect a partition-dependent result")
  }
}
