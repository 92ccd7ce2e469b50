package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Xf

/** §2.A pipeline combinators + §2.B relational core.
  *
  * Numeric-exactness policy (shared with every oracle in this repo): money
  * aggregates go through DECIMAL(18,2)/(18,4) so the sum is exact and
  * order-independent, then ROUND(..,2) and a final cast to DOUBLE —
  * bit-identical between Spark and DuckDB. Integral-valued doubles (e.g.
  * l_quantity) sum exactly either way but use the same decimal path for
  * uniformity. Averages divide a decimal-exact sum cast to DOUBLE by a
  * COUNT — one deterministic IEEE division — then round.
  */
object QueriesCore {
  import Tables._

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A. transducer-surface combinators (ref: connector_test.clj xforms)
    "xf_map" -> ((s, d) =>
      Xf.map(
        col("l_orderkey"), col("l_linenumber"),
        expr(s"CAST(ROUND($discPrice, 2) AS DOUBLE)").as("revenue"),
        upper(col("l_returnflag")).as("flag")
      )(lineitem(s, d))),

    "xf_filter" -> ((s, d) =>
      Xf.comp(
        Xf.filter(expr(
          "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND " +
          "l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND " +
          "l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24")),
        Xf.map(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      )(lineitem(s, d))),

    "xf_mapcat" -> ((s, d) =>
      Xf.comp(
        Xf.mapcat(split(lower(col("text")), " "), "token", col("doc_id")),
        Xf.filter(col("token") =!= "")
      )(documents(s, d))),

    "xf_keep" -> ((s, d) =>
      Xf.keep(
        get_json_object(col("props"), "$.k").cast("int"), "k",
        col("event_id"), col("event_type")
      )(events(s, d))),

    "xf_partition_all" -> ((s, d) =>
      Xf.partitionAll(col("event_id"), 100)(events(s, d))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("batch_rows"),
             sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"))),

    // deterministic md5-bucket sample — same rows on any engine/retry
    // (rand()-based sampling is not reproducible, and residue tricks
    // like key*const%100 break on striped ids / ANSI overflow)
    "xf_sample" -> ((s, d) =>
      Xf.comp(
        Xf.sampleHash(col("event_id"), pct = 10),
        Xf.map(col("event_id"), col("user_id"), col("event_type"))
      )(events(s, d))),

    "xf_dedupe" -> ((s, d) =>
      Xf.comp(
        Xf.map(col("event_type"), (col("user_id") % 97).as("bucket")),
        Xf.dedupe()
      )(events(s, d))),

    "xf_comp" -> ((s, d) =>
      Xf.comp(
        Xf.filter(col("lang") === "en"),
        Xf.mapcat(split(lower(col("text")), " "), "token", col("doc_id")),
        Xf.keep(when(length(col("token")) > 2, col("token")), "tok")
      )(documents(s, d))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .where(col("n") > 5)),

    // ---- B. relational core
    "q_agg" -> ((s, d) =>
      lineitem(s, d)
        .where("l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)").as("sum_base_price"),
          expr(s"CAST(ROUND(SUM($discPrice), 2) AS DOUBLE)").as("sum_disc_price"),
          expr(s"CAST(ROUND(SUM($discPrice * CAST(1.0 + l_tax AS DECIMAL(18,4))), 2) AS DOUBLE)").as("sum_charge"),
          expr("CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)").as("avg_qty"),
          expr("CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)").as("avg_price"),
          expr("CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE)").as("avg_disc"),
          count(lit(1)).as("count_order"))),

    "q_join_broadcast" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
             expr(s"CAST(ROUND(SUM($discPrice), 2) AS DOUBLE)").as("revenue"))),

    "q_join_shuffle" -> ((s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
             expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"))),

    "q_multi_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .where("r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
               "AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'")
        .groupBy("n_name")
        .agg(expr(s"CAST(ROUND(SUM($discPrice), 2) AS DOUBLE)").as("revenue"))),

    // composed relational MACRO-gate (r9 verdict #7): the B-group's
    // xf_comp — star join → per-order revenue agg → window rank →
    // per-key topk → report, declared as four DagTopology nodes and
    // compiled into ONE Catalyst plan. Pins that composition through
    // the DAG builder fuses instead of materializing per node
    // (measured, RunOne --explain at sf0.1): all three dims broadcast,
    // the rank→topk pair collapses to a PARTIAL WindowGroupLimit
    // before the shuffle + a final one after (map-side top-5 pruning —
    // asserted in QueriesSpec), and the whole chain carries TWO
    // shuffle exchanges total: the (n_name, o_orderkey) rollup and the
    // n_name window — the report agg reuses the window's partitioning
    "q_pipeline" -> ((s, d) => {
      val star = graft.pipeline.Xf(df => df
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("o_orderkey"))
        .agg(expr(s"SUM($discPrice)").as("rev")))
      val rank = graft.pipeline.Xf(_.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("n_name")
          .orderBy(col("rev").desc, col("o_orderkey").asc))))
      val topk = graft.pipeline.Xf.filter(col("rnk") <= 5)
      val report = graft.pipeline.Xf(_.groupBy("n_name").agg(
        count(lit(1)).as("n_top"),
        min(when(col("rnk") === 1, col("o_orderkey"))).as("best_orderkey"),
        expr("CAST(ROUND(SUM(rev), 2) AS DOUBLE)").as("top_rev")))
      graft.connector.DagTopology.empty
        .withSource("lineitem", lineitem(s, d))
        .withXform("star", star)
        .withXform("ranked", rank)
        .withXform("top", topk)
        .withXform("report", report)
        .withWorkflow("lineitem" -> "star", "star" -> "ranked",
          "ranked" -> "top", "top" -> "report")
        .output("report")
    }),

    // salted skew join through the correctness gate: the oracle is the
    // PLAIN join, so this proves salting refines only the partitioning,
    // never the result (deterministic salt — retry-safe at scale)
    "q_join_skew" -> ((s, d) =>
      graft.operators.Skew.saltedJoin(
        events(s, d), customer(s, d), "user_id", "c_custkey", buckets = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)").as("sum_val"))),

    "q_semi_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).where("o_totalprice > 400000"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // anti-join against the big-ticket orders subset: every customer
    // has SOME order in the TPC-H generator, so the unrestricted form
    // returned 0 rows at every SF — a vacuous gate (an implementation
    // returning LIMIT 0 would have passed). The >300000 restriction
    // yields 30 rows at sf0.01 / 308 at sf0.1 while keeping the
    // left_anti plan shape under test
    "q_anti_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).where("o_totalprice > 300000"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")),

    "q_window" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rnk"),
          lag(col("c_acctbal"), 1).over(w).as("prev_bal"))
        .where(col("rnk") <= 5)
    }),

    "q_topk" -> ((s, d) =>
      orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "q_union" -> ((s, d) =>
      customer(s, d).select(col("c_name").as("name"), lit("customer").as("kind"))
        .unionByName(
          supplier(s, d).select(col("s_name").as("name"), lit("supplier").as("kind")))),

    "q_pivot" -> ((s, d) =>
      events(s, d)
        .groupBy((col("user_id") % 10).cast("long").as("bucket"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    "q_rollup" -> ((s, d) =>
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
             count(lit(1)).as("n"))),

    "q_subquery" -> ((s, d) => {
      part(s, d).createOrReplaceTempView("graft_part")
      s.sql(
        """SELECT p_partkey, p_name, p_retailprice
          |FROM graft_part
          |WHERE p_retailprice > (SELECT ROUND(AVG(p_retailprice), 2) FROM graft_part)
          |""".stripMargin)
    }),

    "q_left_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
             expr("CAST(ROUND(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))), 2) AS DOUBLE)").as("total_spent"))),

    // CUBE: all 2^k grouping combinations — completes the rollup /
    // grouping-sets family (one Expand node, still a two-phase agg)
    "q_cube" -> ((s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"),
             count(lit(1)).as("n"))),

    "q_grouping_sets" -> ((s, d) => {
      lineitem(s, d).createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n
          |FROM graft_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |""".stripMargin)
    }),

    "q_window_frame" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)").as("moving_total"),
          count(lit(1)).over(w).cast("long").as("n_in_frame"))
    }),

    "q_string_agg" -> ((s, d) =>
      customer(s, d)
        .groupBy("c_nationkey")
        .agg(expr("concat_ws(',', array_sort(collect_list(c_name)))").as("names"),
             count(lit(1)).as("n"))),

    "q_cross_join" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .where(col("r_regionkey") =!= col("n_regionkey"))
        .select("r_name", "n_name")),

    // set operators: INTERSECT/EXCEPT with set (distinct) semantics
    "q_set_ops" -> ((s, d) => {
      val c = customer(s, d).select(col("c_nationkey").as("nationkey"))
      val su = supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(su).withColumn("which", lit("both"))
        .unionByName(c.except(su).withColumn("which", lit("customer_only")))
    }),

    // correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    // Catalyst decorrelates it (no per-customer re-execution)
    "q_lateral_topk" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("graft_lat_customer")
      orders(s, d).createOrReplaceTempView("graft_lat_orders")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
          |FROM graft_lat_customer,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lat_orders
          |         WHERE o_custkey = c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
          |""".stripMargin)
    }),

    // oracle-exact PERCENTILE is right at test scale; its value-map
    // aggregation buffer is a memory cliff on big groups — the at-scale
    // default is q_percentile_binned below (same interpolated result,
    // O(1) buffers)
    "q_percentile" -> ((s, d) =>
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(expr("CAST(ROUND(PERCENTILE(o_totalprice, 0.5), 2) AS DOUBLE)").as("median_price"),
             expr("CAST(ROUND(PERCENTILE(o_totalprice, 0.9), 2) AS DOUBLE)").as("p90_price"))),

    // robust dispersion: median absolute deviation per group — the
    // outlier-resistant sibling of q_stats' stddev (one median pass,
    // broadcast back, one percentile over |x − med|)
    "q_mad" -> ((s, d) => {
      val med = orders(s, d).groupBy("o_orderpriority")
        .agg(expr("PERCENTILE(o_totalprice, 0.5)").as("med"))
      orders(s, d).join(broadcast(med), Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(ANY_VALUE(med), 2) AS DOUBLE)").as("median_price"),
          expr("CAST(ROUND(PERCENTILE(ABS(o_totalprice - med), 0.5), 2) AS DOUBLE)")
            .as("mad"))
    }),

    // binned two-pass exact percentile: identical order statistics with
    // counter-only buffers (operators/Percentile.scala) — the big-input
    // plan q_percentile's scaladoc points to
    "q_percentile_binned" -> ((s, d) =>
      graft.operators.Percentile.binned(
        orders(s, d), "o_orderpriority", "o_totalprice", Seq(0.5, 0.9))),

    // custom physical operator (plans.TopKPerKeyExec) through the
    // correctness gate: same rows as a row_number window, heap-executed
    "q_topk_perkey" -> ((s, d) =>
      graft.operators.TopK.perKey(
        orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        keys = Seq("o_custkey"),
        orderBy = Seq("o_totalprice" -> graft.operators.TopK.Desc,
                      "o_orderkey" -> graft.operators.TopK.Asc),
        k = 3)),

    // as-of join: each event enriched with the customer's latest order
    // at event time (union+window implementation — no pair explosion)
    "q_asof" -> ((s, d) =>
      graft.operators.AsOf.join(
        events(s, d).select("event_id", "user_id", "ts"),
        orders(s, d).select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_totalprice"),
        tieBreak = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")),

    // forward as-of with tolerance: each click's NEXT purchase by the
    // same user within 2 hours (attribution) — same union+window plan
    // on the negated timeline, tolerance nulls the payload of matches
    // beyond the horizon
    "q_asof_fwd" -> ((s, d) => {
      val ev = events(s, d)
      graft.operators.AsOf.join(
        ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"), col("value")),
        leftKey = "user_id", rightKey = "p_user",
        leftTime = "ts", rightTime = "p_ts",
        rightPayload = Seq("purchase_id", "value"), tieBreak = "purchase_id",
        direction = "forward", toleranceUs = Some(7200000000L))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          expr("CAST(ROUND(value, 4) AS DOUBLE)").as("p_val"))
    }),

    // nearest as-of: closest purchase either side of each click within
    // 2 hours — both directional candidates computed in ONE sorted
    // window pass, row-local pick (tie prefers the backward candidate)
    "q_asof_near" -> ((s, d) => {
      val ev = events(s, d)
      graft.operators.AsOf.joinNearest(
        ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"), col("value")),
        leftKey = "user_id", rightKey = "p_user",
        leftTime = "ts", rightTime = "p_ts",
        rightPayload = Seq("purchase_id", "value"), tieBreak = "purchase_id",
        toleranceUs = Some(7200000000L))
        .select(col("event_id"), col("user_id"), col("purchase_id"),
          expr("CAST(ROUND(value, 4) AS DOUBLE)").as("p_val"))
    }),

    // window-function depth: lead / ntile / percent_rank / cume_dist over
    // one partition+sort — a single window exchange serves all four
    "q_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          lead(col("c_acctbal"), 1).over(w).as("next_bal"),
          ntile(4).over(w).as("quartile"),
          expr("CAST(ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment " +
            "ORDER BY c_acctbal DESC, c_custkey), 6) AS DOUBLE)").as("pct_rank"),
          expr("CAST(ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment " +
            "ORDER BY c_acctbal DESC, c_custkey), 6) AS DOUBLE)").as("cum_dist"))
    }),

    // RANGE frames: value-range (peers included by distance, not row
    // count) and a time-interval trailing window — the two frame kinds
    // ROWS BETWEEN can't express
    "q_window_range" -> ((s, d) =>
      orders(s, d).selectExpr(
        "o_custkey", "o_orderkey",
        "CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice " +
          "RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_price_band",
        "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey " +
          "ORDER BY o_totalprice RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS band_total",
        "CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate " +
          "RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_30d")),

    // window value-picking: first/last/nth over an explicit frame —
    // last_value needs the full-partition frame (the default frame ends
    // at CURRENT ROW, a classic silent-wrong-answer trap both engines
    // agree on only when the frame is spelled out)
    "q_window_pick" -> ((s, d) =>
      orders(s, d).selectExpr(
        "o_custkey", "o_orderkey",
        "FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order",
        "LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order",
        "NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order")),

    // IGNORE NULLS window forms — the gap-filling idiom: carry the last
    // non-null observation forward (last_value over a running frame) and
    // reach across null runs with lag/lead IGNORE NULLS. Gaps are
    // synthesized by nulling out one event_type's value so every branch
    // (null at partition head, mid-run, tail) occurs in the data
    "q_window_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", lit(null))
            .otherwise(col("value")).as("v"))
        .select(col("event_id"), col("user_id"),
          last(col("v"), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("filled"),
          lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_nn"),
          lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_nn"))
    }),

    // point-in-interval range join through the gate: the oracle is the
    // NAIVE inequality join, the Spark plan is the binned equi-join
    // (OSS Spark would otherwise nest-loop a pure range condition)
    "q_range_join" -> ((s, d) => {
      // purchase attribution: every event landing in the 2 h after a
      // purchase by the same user
      val win = events(s, d).where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"),
          col("ts").as("w_start"),
          expr("ts + INTERVAL '2' HOUR").as("w_end"))
      graft.operators.RangeJoin.pointInInterval(
        events(s, d).select("event_id", "user_id", "event_type", "ts"), win,
        leftKey = "user_id", rightKey = "p_user",
        timeCol = "ts", startCol = "w_start", endCol = "w_end",
        binMicros = 2L * 3600 * 1000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("purchase_id")).as("n_windows"))
    }),

    // unpivot/melt — wide measures to long (the inverse of q_pivot);
    // one Expand node, no shuffle
    "q_unpivot" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice").cast("double").as("l_extendedprice"),
          col("l_discount").cast("double").as("l_discount"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          variableColumnName = "measure",
          valueColumnName = "value")),

    // second-moment statistics with decimal-exact accumulation: stddev
    // and correlation from DECIMAL sums of x, y, x², y², xy — one
    // deterministic IEEE evaluation per group at the end, so the values
    // hash-match across engines (built-in corr()/stddev() accumulate in
    // partition order and cannot)
    "q_stats" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))").as("sx"),
          expr("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))").as("sy"),
          expr("SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))").as("sxx"),
          expr("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))").as("syy"),
          expr("SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))").as("sxy"))
        .selectExpr(
          "l_returnflag", "n",
          "CAST(ROUND(CAST(sx AS DOUBLE) / n, 4) AS DOUBLE) AS avg_qty",
          "CAST(ROUND(SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 4) AS DOUBLE) AS stddev_qty",
          "CAST(ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) / " +
            "(SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) * " +
            " SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 4) AS DOUBLE) AS corr_qty_price")),

    // fixed-width histogram with edge clamping — one two-phase agg
    "q_histogram" -> ((s, d) =>
      graft.operators.Analytics.histogram(orders(s, d), "o_totalprice",
        lo = 0.0, width = 50000.0, buckets = 12)),

    // gap-filled hourly series per event_type: per-key sequence()
    // explode builds each key's own calendar (no global-grid cross join)
    "q_timeseries_fill" -> ((s, d) =>
      graft.operators.Analytics.fillGaps(events(s, d), "event_type", "ts",
        "value", unit = "HOUR")),

    // strict-order funnel signup → click → purchase: per-stage frontier
    // joins, one row per surviving user per stage
    "q_funnel" -> ((s, d) =>
      graft.operators.Analytics.funnel(events(s, d), "user_id", "ts",
        "event_type", Seq("signup", "click", "purchase"))),

    // time-bounded funnel: each step must convert within 12 hours of
    // the previous step's entry
    "q_funnel_windowed" -> ((s, d) =>
      graft.operators.Analytics.funnel(events(s, d), "user_id", "ts",
        "event_type", Seq("signup", "click", "purchase"),
        maxGapUs = Some(43200000000L))),

    // weekly cohort retention relative to each user's first-event day
    "q_retention" -> ((s, d) =>
      graft.operators.Analytics.retention(events(s, d), "user_id", "ts")),

    // sweep-line peak concurrency: 30-minute intervals per event_type,
    // +1/−1 boundary walk with a keyed running sum
    "q_concurrency" -> ((s, d) =>
      graft.operators.Analytics.maxConcurrent(events(s, d), "event_type",
        "ts", durationUs = 1800000000L)),

    // longest consecutive-day activity streak per user (gaps & islands)
    "q_streaks" -> ((s, d) =>
      graft.operators.Analytics.streaks(events(s, d), "user_id", "ts")),

    // batch gap sessionization (30-min gap): lag→flag→running-sum→two
    // user-keyed roll-ups, all on one shuffle by user
    "q_sessionize" -> ((s, d) =>
      graft.operators.Analytics.sessionize(events(s, d), "user_id", "ts",
        gapUs = 1800000000L)),

    // first-/last-touch revenue attribution for purchases, one keyed
    // window pass computes both models
    "q_attribution" -> ((s, d) =>
      graft.operators.Analytics.attribution(events(s, d), "user_id", "ts",
        "event_type", "value", conversionType = "purchase",
        tieBreak = "event_id")),

    // robust per-type outlier flags from decimal-exact mean/stddev
    "q_outliers" -> ((s, d) =>
      graft.operators.Analytics.outliers(events(s, d), "event_type",
        "event_id", "value", z = 3.0)),

    // sliding-window mean-shift changepoints per user: next-8 mean vs
    // prev-8 mean over one keyed sort, decimal-exact frame sums, flag
    // at 1.5 user-σ — level-shift detection with no self-join
    "q_changepoint" -> ((s, d) =>
      graft.operators.Analytics.meanShifts(events(s, d), "user_id",
        "ts", "event_id", "value", w = 8, z = 1.5)),

    // two-sample A/B read-out over a deterministic user split: exact
    // decimal moments per variant + Welch's t in one IEEE expression
    // (means intentionally unrounded-absent — sum/n can land on round
    // boundaries; the σ denominator is irrational, so t rounds safely)
    "q_abtest" -> ((s, d) =>
      graft.operators.Analytics.abTest(
        events(s, d).withColumn("variant", col("user_id") % 2),
        "variant", "value")),

    // Benford first-digit audit on order totals: observed vs
    // log10(1+1/d) in ppm — the fabricated-numbers screen
    "q_benford" -> ((s, d) =>
      graft.operators.Analytics.benford(orders(s, d), "o_totalprice")),

    // sequence-completeness audit: simulate 1-in-97 ingest loss on the
    // event_id sequence, then account for every id via a range spine
    // anti-join + bucket-keyed rollup — no global window/ordered scan
    "q_gap_detection" -> ((s, d) =>
      graft.operators.Reconcile.sequenceGaps(
        events(s, d).where(col("event_id") % 97 =!= 13),
        "event_id", bucketWidth = 1000L)),

    // market-basket association rules over order baskets: pair support
    // via ONE equi-self-join on the basket id (Σ|basket|² bounded by
    // the 13-item order cap), confidence/lift as exact fixed-point ppm
    // integer floor divisions — zero float surface, zero rounding risk
    "q_basket_rules" -> ((s, d) =>
      graft.operators.Analytics.basketRules(lineitem(s, d),
        "l_orderkey", "l_partkey", minSupport = 2L)),

    // rolling discrete median of each user's last-15 values — element
    // selection over a bounded collected frame: an actual input value,
    // zero interpolation/rounding, exact on any engine
    "q_rolling_median" -> ((s, d) =>
      graft.operators.Analytics.rollingMedian(events(s, d), "user_id",
        "ts", "event_id", "value", n = 15)),

    // merge each supplier's overlapping transit windows (ship date +
    // quantity-proportional days — the table carries no receipt date)
    // into maximal coverage islands — ONE keyed sort (running-max
    // opening rule), never the interval self-join
    "q_interval_merge" -> ((s, d) =>
      graft.operators.Analytics.mergeIntervals(
        lineitem(s, d).withColumn("l_transit_end",
          expr("timestampadd(DAY, CAST(l_quantity AS INT) % 14, l_shipdate)")),
        "l_suppkey", "l_shipdate", "l_transit_end")),

    // top user journeys: each user's first-3 event-type path, counted
    // across users, top-20 — one keyed window pruned to 3 rows/user
    // before any assembly; the path-count table is alphabet³-bounded
    "q_paths" -> ((s, d) =>
      graft.operators.Analytics.topPaths(events(s, d), "user_id", "ts",
        "event_id", "event_type", k = 3, topK = 20)),

    // per-priority Pareto skyline of orders on (totalprice, orderdate)
    // both maximized — the O(n log n) group-reduce + frontier-window
    // shape, never the all-pairs dominance self-join (the naive oracle
    // form is O(n²) and already infeasible in DuckDB at sf0.1)
    "q_skyline" -> ((s, d) =>
      graft.operators.Analytics.skyline(orders(s, d),
        "o_orderpriority", "o_totalprice", "o_orderdate")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"), col("o_orderdate"))),

    // exact trailing 7-day distinct users per day: bounded 7× fan-out
    // + dedupe, never a per-row distinct-set window buffer
    "q_trailing_distinct" -> ((s, d) =>
      graft.operators.Analytics.trailingDistinct(events(s, d), "user_id",
        "ts", days = 7)),

    // interval×interval overlap join (purchase 2h windows ∩ click 1h
    // windows per user) — binned equi-join, each pair kept once in the
    // later-start bin; the naive form is a nested loop
    "q_interval_join" -> ((s, d) => {
      val ev = events(s, d)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_start"), expr("ts + INTERVAL 2 HOUR").as("p_end"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_start"), expr("ts + INTERVAL 1 HOUR").as("c_end"))
      graft.operators.RangeJoin.intervalOverlap(p, c, "user_id", "c_user",
          "p_start", "p_end", "c_start", "c_end", binMicros = 3600000000L)
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          (unix_micros(least(col("p_end"), col("c_end")).cast("timestamp")) -
            unix_micros(greatest(col("p_start"), col("c_start"))
              .cast("timestamp"))).as("overlap_us"))
    }),

    // first-order Markov transition matrix over each user's event
    // stream — one keyed lag window, then a states² aggregate
    "q_transitions" -> ((s, d) =>
      graft.operators.Analytics.transitions(events(s, d), "user_id",
        "ts", "event_type", tieCol = "event_id")),

    // bounded-lookback EWMA per user (α = 0.5 → exact power-of-two
    // weights): the last-8-rows frame collects IN WINDOW ORDER, the
    // weighted mean folds the list left-to-right — bit-identical on
    // any engine with a sequential list fold. One keyed window, no
    // self-join; smoothing signal for monitoring/features
    "q_ewma" -> ((s, d) =>
      graft.operators.Analytics.ewma(events(s, d), "user_id",
        Seq("ts", "event_id"), "event_id", "value", lookback = 8)),

    // approx sketches: engine-specific estimates, so no DuckDB hash
    // oracle — these take the driver's rows-only check; accuracy vs
    // exact answers is spec-enforced (ApproxSpec)
    "approx_distinct" -> ((s, d) =>
      graft.operators.Approx.distinctCount(
        events(s, d), Seq("event_type"), "user_id")),

    "approx_quantiles" -> ((s, d) =>
      graft.operators.Approx.quantiles(
        orders(s, d), Seq("o_orderpriority"), "o_totalprice", Seq(0.5, 0.9))),

    "approx_freq" -> ((s, d) =>
      graft.operators.Approx.frequentItems(
        events(s, d).select((col("user_id") % 50).as("hot_key")),
        "hot_key", support = 0.05)),

    // incremental-stats pattern: per-(type, day) HLL sketches persist;
    // the month's distinct-user answer is a union of stored sketches,
    // never a rescan of history (rows-only gate; merge-vs-direct
    // equality and accuracy are spec-pinned in ApproxSpec)
    "approx_mergeable" -> ((s, d) => {
      val daily = graft.operators.Approx.distinctSketches(
        events(s, d).withColumn("day", date_trunc("DAY", col("ts"))),
        Seq("event_type", "day"), "user_id")
      graft.operators.Approx.unionEstimate(daily, Seq("event_type"))
    }),

    // the approx group's QA gate (r9 verdict #3): every sketch family
    // scored against its exact sibling — exact counts and the ok=true
    // expectations are DuckDB-reproducible, so a sketch drifting past
    // its declared bound hash-fails here even though the estimates
    // themselves stay engine-specific rows-only above
    "approx_eval" -> ((s, d) =>
      graft.operators.Approx.evalReport(events(s, d), orders(s, d))),

    "q_sql_funcs" -> ((s, d) =>
      orders(s, d).selectExpr(
        "o_orderkey",
        "SUBSTR(o_orderpriority, 1, 1) AS pri_code",
        "UPPER(o_orderstatus) || '-' || o_orderpriority AS status_tag",
        "CAST(YEAR(o_orderdate) AS INT) AS order_year",
        "CAST(MONTH(o_orderdate) AS INT) AS order_month",
        "DATE_TRUNC('month', o_orderdate) AS order_mon_start",
        "CASE WHEN o_totalprice > 300000 THEN 'high' WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS price_band",
        "CAST(LENGTH(o_orderpriority) AS INT) AS pri_len")),

    // FULL OUTER join — the snapshot-coverage shape (who has orders /
    // who is missing): orders pre-aggregate per custkey BEFORE the join,
    // so the full-outer meets two key-partitioned sides of bounded width
    // and the join itself is a plain SMJ on the shared partitioning
    "q_full_join" -> ((s, d) => {
      val c = customer(s, d).where(col("c_acctbal") > 0)
        .select("c_custkey", "c_mktsegment")
      val o = orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          expr("CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .as("spend"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
            .when(col("o_custkey").isNull, "customer_only")
            .otherwise("order_only").as("coverage"),
          col("c_mktsegment"), col("n_orders"), col("spend"))
    }),

    // exact MEDIAN + MODE per group: one two-phase aggregate. The value
    // buffer caveat from q_percentile applies to exact median at scale —
    // q_percentile_binned is the documented big-input path; mode's
    // buffer is one count per DISTINCT value (here 2), always bounded
    // by the value domain. The lo/hi cut sits far from a tie on this
    // data (≥2:1 margin at every SF), so mode is well-defined
    // cross-engine.
    "q_mode_median" -> ((s, d) =>
      events(s, d)
        .withColumn("band",
          when(col("value") < 55, "lo").otherwise("hi"))
        .groupBy("event_type")
        .agg(
          expr("CAST(ROUND(MEDIAN(value), 6) AS DOUBLE)").as("med_val"),
          expr("MODE(band)").as("mode_band"),
          count(lit(1)).as("n"))),

    // regex surface: extract-all + count, group capture, global replace,
    // boolean match — all row-local codegen'd expressions fused into the
    // scan; nothing here shuffles
    "q_regex_funcs" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        expr("CAST(size(regexp_extract_all(text, '[a-z]{5,}', 0)) AS INT)")
          .as("n_long"),
        expr("regexp_extract(text, '^([a-z]+)', 1)").as("first_tok"),
        expr("regexp_replace(SUBSTR(text, 1, 40), '[aeiou]', '_')")
          .as("devoweled"),
        expr("text RLIKE 'spark .* window'").as("mentions"))),

    // higher-order array functions over the embedding column — the
    // Array[Float] surface ANN is built on: fold (aggregate), filter,
    // exists, array_max. The fold goes ROUND→DECIMAL per element so the
    // sum is order-independent and engine-exact (float → double widening
    // is value-preserving; the decimal sum has one canonical answer).
    "q_array_funcs" -> ((s, d) =>
      embeddings(s, d).select(
        col("vec_id"), col("label"),
        expr("CAST(size(embedding) AS INT)").as("dim"),
        expr("CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,9)), " +
          "(a, x) -> CAST(a + CAST(ROUND(CAST(x AS DOUBLE), 7) AS DECIMAL(28,9)) " +
          "AS DECIMAL(28,9))) AS DOUBLE)").as("sum_r"),
        expr("CAST(size(filter(embedding, x -> x > 0)) AS INT)").as("n_pos"),
        expr("CAST(ROUND(CAST(array_max(embedding) AS DOUBLE), 6) AS DOUBLE)")
          .as("max_v"),
        expr("exists(embedding, x -> x > 2.5)").as("has_big"))),

    // recursive-CTE workload (org rollup / BOM explosion) without
    // recursive SQL: pointer-DOUBLING closure over a parent forest
    // (custkey -> custkey div 10), ⌈log₂ depth⌉ keyed self-joins
    // instead of depth sequential passes; oracle = DuckDB's real
    // WITH RECURSIVE over the same edges
    "q_hierarchy" -> ((s, d) => {
      val edges = customer(s, d).where(col("c_custkey") >= 10)
        .select(col("c_custkey").as("node"),
          expr("CAST(c_custkey DIV 10 AS BIGINT)").as("parent"))
      graft.operators.Graph.hierarchyClosure(edges, "node", "parent")
    }),

    // predicate-aggregate surface (count_if / bool_and / bool_or /
    // count distinct) — one two-phase aggregate, domain-bounded buffers
    "q_agg_predicates" -> ((s, d) =>
      events(s, d).groupBy("event_type")
        .agg(
          expr("COUNT_IF(value > 50)").as("n_high"),
          expr("BOOL_AND(value >= 0)").as("all_nonneg"),
          expr("BOOL_OR(value > 99)").as("any_extreme"),
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n"))),

    // Z-order (Morton) codes for multi-column layout clustering: the
    // bit-interleave is pure codegen'd int64 arithmetic (no UDF), and
    // the oracle reproduces it with the same shift-or chain — see
    // functions/ZOrder.scala for the clusterBy writer built on this
    "q_zorder" -> ((s, d) =>
      orders(s, d).where(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          (col("o_custkey") % 65536).cast("long").as("x"),
          (datediff(col("o_orderdate"), to_date(lit("1992-01-01"))) % 65536)
            .cast("long").as("y"))
        .withColumn("zval",
          graft.functions.ZOrder.interleave16(col("x"), col("y")))),

    // bucketed co-located join: both sides written bucketed-by-key
    // (8 buckets) and read back through the catalog — the SMJ consumes
    // the bucket partitioning directly, so the ONLY exchange in the
    // plan is the post-join re-agg by priority. This is the 100 TB
    // fact-join shape: bucket once at load, join forever shuffle-free
    // (ScaleOpsSpec pins the single-exchange plan). Staging is
    // write-once per (JVM, sfDir): tables already in the catalog are
    // reused, so repeated invocations (Bench best-of-2, RunOne iters)
    // time the JOIN, not the one-time bucketing write — matching how
    // the shape is used at scale (bucket at load, join forever).
    "q_join_bucketed" -> ((s, d) => {
      val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
      val (to, tl) = (s"graft_bo_$suffix", s"graft_bl_$suffix")
      if (!(s.catalog.tableExists(to) && s.catalog.tableExists(tl))) {
        // a stale warehouse dir from a previous JVM has no catalog
        // entry, so saveAsTable would CREATE into a non-empty location
        // — clear both (same discipline as ScaleOpsSpec's bucketed-join
        // spec)
        val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        Seq(to, tl).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
        }
        graft.sinks.BucketedParquetSink(to, Seq("o_orderkey"), 8,
          sortCols = Seq("o_orderkey"))
          .write(orders(s, d).select("o_orderkey", "o_orderpriority"))
        graft.sinks.BucketedParquetSink(tl, Seq("l_orderkey"), 8,
          sortCols = Seq("l_orderkey"))
          .write(lineitem(s, d)
            .select("l_orderkey", "l_extendedprice", "l_discount"))
      }
      s.table(to).hint("merge")
        .join(s.table(tl), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          expr(s"CAST(ROUND(SUM($discPrice), 2) AS DOUBLE)").as("revenue"))
    })
  )

  val oracle: Map[String, String] = Map(
    "xf_map" ->
      s"""SELECT l_orderkey, l_linenumber,
         |CAST(ROUND($discPrice, 2) AS DOUBLE) AS revenue,
         |UPPER(l_returnflag) AS flag FROM lineitem""".stripMargin,

    "xf_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "xf_mapcat" ->
      """SELECT doc_id, t.token FROM documents,
        |UNNEST(string_split(lower(text), ' ')) AS t(token)
        |WHERE t.token <> ''""".stripMargin,

    "xf_keep" ->
      """SELECT event_id, event_type,
        |CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL""".stripMargin,

    "xf_partition_all" ->
      """SELECT CAST(FLOOR(event_id / 100) AS BIGINT) AS batch_id,
        |CAST(COUNT(*) AS BIGINT) AS batch_rows,
        |CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
        |FROM events GROUP BY 1""".stripMargin,

    "xf_dedupe" ->
      "SELECT DISTINCT event_type, user_id % 97 AS bucket FROM events",

    "xf_sample" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10""".stripMargin,

    "q_join_skew" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "xf_comp" ->
      """SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT t.token AS tok FROM documents,
        |  UNNEST(string_split(lower(text), ' ')) AS t(token)
        |  WHERE lang = 'en' AND LENGTH(t.token) > 2
        |) GROUP BY tok HAVING COUNT(*) > 5""".stripMargin,

    "q_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
         |CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS sum_disc_price,
         |CAST(ROUND(SUM($discPrice * CAST(1.0 + l_tax AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_charge,
         |CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
         |CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_price,
         |CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_disc,
         |CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
         |CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,

    "q_join_shuffle" ->
      """SELECT o_orderpriority,
        |CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_multi_join" ->
      s"""SELECT n_name, CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,

    // the same four stages as the DAG nodes, inlined as CTEs — the
    // oracle checks the COMPOSITION's result, so a fusion bug anywhere
    // in the chain (node boundary dropping rows, rank/filter reorder)
    // hash-fails
    "q_pipeline" ->
      s"""WITH rev AS (
         |  SELECT n_name, o_orderkey, SUM($discPrice) AS rev
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT n_name, o_orderkey, rev,
         |    ROW_NUMBER() OVER (PARTITION BY n_name
         |      ORDER BY rev DESC, o_orderkey ASC) AS rnk
         |  FROM rev)
         |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_top,
         |  CAST(MIN(CASE WHEN rnk = 1 THEN o_orderkey END) AS BIGINT)
         |    AS best_orderkey,
         |  CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS top_rev
         |FROM rk WHERE rnk <= 5 GROUP BY 1""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)""".stripMargin,

    "q_window" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
        |    LAG(c_acctbal, 1) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS prev_bal
        |  FROM customer)
        |WHERE rnk <= 5""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_union" ->
      """SELECT c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind FROM supplier""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
        |CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT ROUND(AVG(p_retailprice), 2) FROM part)""".stripMargin,

    "q_left_join" ->
      """SELECT c_custkey, c_name,
        |CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
        |CAST(ROUND(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS moving_total,
        |CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_string_agg" ->
      """SELECT c_nationkey,
        |string_agg(c_name, ',' ORDER BY c_name) AS names,
        |CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "q_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |WHERE r_regionkey <> n_regionkey""".stripMargin,

    "q_range_join" ->
      """SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_windows
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id AND p.event_type = 'purchase'
        | AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 2 HOUR
        |GROUP BY e.event_type""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
        |       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |       CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount',
        |       CAST(l_discount AS DOUBLE) FROM lineitem""".stripMargin,

    "q_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(ROUND(CAST(sx AS DOUBLE) / n, 4) AS DOUBLE) AS avg_qty,
        |  CAST(ROUND(SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 4) AS DOUBLE) AS stddev_qty,
        |  CAST(ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
        |    (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
        |     SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)), 4) AS DOUBLE) AS corr_qty_price
        |FROM m""".stripMargin,

    "q_set_ops" ->
      """SELECT nationkey, 'both' AS which FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT
        |  SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'customer_only' AS which FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier)""".stripMargin,

    "q_lateral_topk" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)""".stripMargin,

    "q_percentile" ->
      """SELECT o_orderpriority,
        |CAST(ROUND(quantile_cont(o_totalprice, 0.5), 2) AS DOUBLE) AS median_price,
        |CAST(ROUND(quantile_cont(o_totalprice, 0.9), 2) AS DOUBLE) AS p90_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_mad" ->
      """WITH med AS (
        |  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(ANY_VALUE(med), 2) AS DOUBLE) AS median_price,
        |  CAST(ROUND(quantile_cont(ABS(o_totalprice - med), 0.5), 2) AS DOUBLE) AS mad
        |FROM orders o JOIN med USING (o_orderpriority)
        |GROUP BY 1""".stripMargin,

    "q_percentile_binned" ->
      """SELECT o_orderpriority, CAST(0.5 AS DOUBLE) AS p,
        |  CAST(ROUND(quantile_cont(o_totalprice, 0.5), 2) AS DOUBLE) AS pv
        |FROM orders GROUP BY o_orderpriority
        |UNION ALL
        |SELECT o_orderpriority, CAST(0.9 AS DOUBLE) AS p,
        |  CAST(ROUND(quantile_cont(o_totalprice, 0.9), 2) AS DOUBLE) AS pv
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_topk_perkey" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3""".stripMargin,

    "q_asof" ->
      """SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |WHERE rn = 1""".stripMargin,

    "q_asof_fwd" ->
      """SELECT event_id, user_id, purchase_id,
        |  CAST(ROUND(value, 4) AS DOUBLE) AS p_val FROM (
        |  SELECT c.event_id, c.user_id, p.event_id AS purchase_id, p.value,
        |    ROW_NUMBER() OVER (PARTITION BY c.event_id
        |      ORDER BY p.ts ASC, p.event_id DESC) AS rn
        |  FROM events c LEFT JOIN events p
        |    ON c.user_id = p.user_id AND p.event_type = 'purchase'
        |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
        |  WHERE c.event_type = 'click')
        |WHERE rn = 1""".stripMargin,

    // tie discipline mirrors joinNearest: distance, then backward-
    // preferred, then largest id backward / smallest id forward
    "q_asof_near" ->
      """SELECT event_id, user_id, purchase_id, p_val FROM (
        |  SELECT c.event_id, c.user_id, p.event_id AS purchase_id,
        |    CAST(ROUND(p.value, 4) AS DOUBLE) AS p_val,
        |    ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY
        |      ABS(epoch_us(p.ts) - epoch_us(c.ts)) ASC,
        |      CASE WHEN p.ts <= c.ts THEN 1 ELSE 0 END DESC,
        |      CASE WHEN p.ts <= c.ts THEN -p.event_id ELSE p.event_id END ASC
        |    ) AS rn
        |  FROM events c LEFT JOIN events p
        |    ON c.user_id = p.user_id AND p.event_type = 'purchase'
        |   AND p.ts >= c.ts - INTERVAL 2 HOUR AND p.ts <= c.ts + INTERVAL 2 HOUR
        |  WHERE c.event_type = 'click')
        |WHERE rn = 1""".stripMargin,

    "q_window_funcs" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |LEAD(c_acctbal, 1) OVER w AS next_bal,
        |CAST(NTILE(4) OVER w AS INT) AS quartile,
        |CAST(ROUND(PERCENT_RANK() OVER w, 6) AS DOUBLE) AS pct_rank,
        |CAST(ROUND(CUME_DIST() OVER w, 6) AS DOUBLE) AS cum_dist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,

    "q_window_range" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(COUNT(*) OVER wp AS BIGINT) AS n_price_band,
        |CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wp, 2) AS DOUBLE) AS band_total,
        |CAST(COUNT(*) OVER wt AS BIGINT) AS n_trailing_30d
        |FROM orders
        |WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |              RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW),
        |       wt AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |              RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_window_ignore_nulls" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, event_id AS eid,
        |    CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, eid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  lag(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, eid) AS prev_nn,
        |  lead(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, eid) AS next_nn
        |FROM e""".stripMargin,

    "q_window_pick" ->
      """SELECT o_custkey, o_orderkey,
        |FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |LAST_VALUE(o_orderkey) OVER w AS last_order,
        |NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "q_sql_funcs" ->
      """SELECT o_orderkey,
        |SUBSTR(o_orderpriority, 1, 1) AS pri_code,
        |UPPER(o_orderstatus) || '-' || o_orderpriority AS status_tag,
        |CAST(YEAR(o_orderdate) AS INT) AS order_year,
        |CAST(MONTH(o_orderdate) AS INT) AS order_month,
        |DATE_TRUNC('month', o_orderdate) AS order_mon_start,
        |CASE WHEN o_totalprice > 300000 THEN 'high' WHEN o_totalprice > 150000 THEN 'mid' ELSE 'low' END AS price_band,
        |CAST(LENGTH(o_orderpriority) AS INT) AS pri_len
        |FROM orders""".stripMargin,

    "q_histogram" ->
      """SELECT bucket, CAST(0.0 + bucket * 50000.0 AS DOUBLE) AS bucket_lo,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - 0.0) / 50000.0), 0), 11) AS INT) AS bucket
        |      FROM orders WHERE o_totalprice IS NOT NULL)
        |GROUP BY bucket""".stripMargin,

    "q_timeseries_fill" ->
      """WITH b AS (
        |  SELECT event_type AS k, date_trunc('hour', ts) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_v
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT k, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        |  FROM (SELECT k, min(bucket) AS b0, max(bucket) AS b1 FROM b GROUP BY k))
        |SELECT g.k AS event_type, g.bucket,
        |  COALESCE(b.n, 0) AS n, COALESCE(b.sum_v, 0.0) AS sum_v
        |FROM g LEFT JOIN b ON g.k = b.k AND g.bucket = b.bucket""".stripMargin,

    "q_funnel" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS ft FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (
        |  SELECT e.user_id, min(e.ts) AS ft FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.ft
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS ft FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ft
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 0 AS stage_idx, 'signup' AS stage,
        |  CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
        |UNION ALL
        |SELECT 1, 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
        |UNION ALL
        |SELECT 2, 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)""".stripMargin,

    "q_funnel_windowed" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS ft FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (
        |  SELECT e.user_id, min(e.ts) AS ft FROM events e
        |  JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.ft
        |   AND e.ts <= s0.ft + INTERVAL 12 HOUR
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS ft FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.ft
        |   AND e.ts <= s1.ft + INTERVAL 12 HOUR
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 0 AS stage_idx, 'signup' AS stage,
        |  CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
        |UNION ALL
        |SELECT 1, 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
        |UNION ALL
        |SELECT 2, 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)""".stripMargin,

    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id AS u, date_trunc('day', ts) AS day FROM events),
        |c AS (SELECT u, min(day) AS cohort_day FROM ev GROUP BY u)
        |SELECT cohort_day,
        |  CAST(FLOOR(datediff('day', cohort_day, day) / 7) AS INT) AS week_offset,
        |  CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users
        |FROM ev JOIN c USING (u) GROUP BY 1, 2""".stripMargin,

    // sweep line on epoch-µs boundary points; the default RANGE frame
    // reads each (t, d) tie group's post-group sum in both engines
    "q_concurrency" ->
      """WITH base AS (SELECT event_type AS k, epoch_us(ts) AS t FROM events),
        |pts AS (
        |  SELECT k, t, 1 AS d FROM base
        |  UNION ALL
        |  SELECT k, t + 1800000000, -1 FROM base),
        |r AS (SELECT k, SUM(d) OVER (PARTITION BY k ORDER BY t, d) AS run
        |      FROM pts)
        |SELECT k AS event_type, CAST(MAX(run) AS INT) AS max_concurrent,
        |  CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
        |FROM r GROUP BY k""".stripMargin,

    "q_interval_join" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS ps,
        |    ts + INTERVAL 2 HOUR AS pe
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts AS cs,
        |    ts + INTERVAL 1 HOUR AS ce
        |  FROM events WHERE event_type = 'click')
        |SELECT p.user_id, purchase_id, click_id,
        |  epoch_us(LEAST(pe, ce)) - epoch_us(GREATEST(ps, cs)) AS overlap_us
        |FROM p JOIN c ON p.user_id = c.user_id AND ps < ce AND cs < pe""".stripMargin,

    "q_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS prev_state, event_type AS next_state,
        |    COUNT(*) AS n
        |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_state, next_state, n,
        |  CAST(ROUND(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY prev_state), 6) AS DOUBLE) AS p
        |FROM c""".stripMargin,

    "q_streaks" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id AS u,
        |    CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE ts IS NOT NULL),
        |isl AS (
        |  SELECT u, day - CAST(ROW_NUMBER() OVER
        |    (PARTITION BY u ORDER BY day) AS INT) AS isl FROM du),
        |runs AS (SELECT u, isl, COUNT(*) AS len FROM isl GROUP BY u, isl)
        |SELECT u AS user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(MAX(len) AS INT) AS max_streak
        |FROM runs GROUP BY u""".stripMargin,

    "q_sessionize" ->
      // ROWS frame here vs Spark's default RANGE frame: equivalent,
      // because within a tie group only the first-ordered row can
      // carry new_s=1 (later ties see gap 0), so the cumulative sum
      // agrees for every tie order
      """WITH b AS (SELECT user_id AS u, epoch_us(ts) AS t
        |  FROM events WHERE ts IS NOT NULL),
        |s AS (SELECT u, t,
        |  CASE WHEN t - LAG(t) OVER (PARTITION BY u ORDER BY t) IS NULL
        |       OR t - LAG(t) OVER (PARTITION BY u ORDER BY t) > 1800000000
        |       THEN 1 ELSE 0 END AS new_s FROM b),
        |s2 AS (SELECT u, t, SUM(new_s) OVER (PARTITION BY u ORDER BY t
        |  ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |g AS (SELECT u, sid, COUNT(*) AS len, MAX(t) - MIN(t) AS dur_us
        |  FROM s2 GROUP BY u, sid)
        |SELECT u AS user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(MAX(len) AS INT) AS max_session_events,
        |  CAST(FLOOR(SUM(dur_us) / 1000000) AS BIGINT) AS total_session_s
        |FROM g GROUP BY u""".stripMargin,

    "q_attribution" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_type, value, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
        |  FROM events),
        |m AS (
        |  SELECT *,
        |    first_value(CASE WHEN isp = 0 THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
        |    last_value(CASE WHEN isp = 0 THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, isp, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM t),
        |p AS (SELECT * FROM m WHERE isp = 1)
        |SELECT model, channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT 'first_touch' AS model, COALESCE(ft, '(none)') AS channel,
        |    value FROM p
        |  UNION ALL
        |  SELECT 'last_touch', COALESCE(lt, '(none)'), value FROM p)
        |GROUP BY model, channel""".stripMargin,

    // mean/stddev from the same decimal-exact sums as q_stats, so the
    // flagged set is identical across engines
    "q_outliers" ->
      """WITH r0 AS (
        |  SELECT event_type AS k, event_id AS id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT k, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,6))) AS sx,
        |    SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))) AS sxx
        |  FROM r0 GROUP BY k),
        |sp AS (
        |  SELECT k, CAST(sx AS DOUBLE) / n AS mean,
        |    SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS sd
        |  FROM st WHERE n > 1),
        |fl AS (
        |  SELECT r0.k, r0.id, r0.v, (r0.v - sp.mean) / sp.sd AS zs
        |  FROM r0 JOIN sp ON r0.k = sp.k WHERE sp.sd > 0)
        |SELECT k AS event_type, id AS event_id, v AS value,
        |  CAST(ROUND(zs, 4) AS DOUBLE) AS z_score
        |FROM fl WHERE ABS(zs) > 3.0""".stripMargin,

    // same decimal frame sums + σ join as the Spark plan; both frames
    // must be full (8 rows) before a row may flag
    "q_changepoint" ->
      """WITH r AS (
        |  SELECT user_id AS k, event_id AS id, ts AS t, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |w AS (
        |  SELECT k, id, t,
        |    COUNT(v) OVER wb AS n_b, SUM(CAST(v AS DECIMAL(18,6))) OVER wb AS sb,
        |    COUNT(v) OVER wa AS n_a, SUM(CAST(v AS DECIMAL(18,6))) OVER wa AS sa
        |  FROM r
        |  WINDOW wb AS (PARTITION BY k ORDER BY t, id ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING),
        |         wa AS (PARTITION BY k ORDER BY t, id ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)),
        |st AS (
        |  SELECT k, COUNT(*) AS n, SUM(CAST(v AS DECIMAL(18,6))) AS sx,
        |    SUM(CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6))) AS sxx
        |  FROM r GROUP BY k),
        |sp AS (
        |  SELECT k,
        |    SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS sd
        |  FROM st WHERE n > 1),
        |fl AS (
        |  SELECT w.k, w.id, w.t,
        |    CAST(ROUND(sb * CAST(0.125 AS DECIMAL(4,3)), 4) AS DOUBLE) AS mb,
        |    CAST(ROUND(sa * CAST(0.125 AS DECIMAL(4,3)), 4) AS DOUBLE) AS ma,
        |    CAST(sa AS DOUBLE) / 8 - CAST(sb AS DOUBLE) / 8 AS shift, sp.sd
        |  FROM w JOIN sp ON w.k = sp.k
        |  WHERE n_b = 8 AND n_a = 8 AND sp.sd > 0)
        |SELECT k AS user_id, id AS event_id, t AS ts,
        |  mb AS mean_before, ma AS mean_after,
        |  CAST(ROUND(shift / sd, 4) AS DOUBLE) AS shift_z
        |FROM fl WHERE ABS(shift) > sd * 1.5""".stripMargin,

    // identical decimal moments and the identical IEEE t expression
    "q_abtest" ->
      """WITH r AS (
        |  SELECT CAST(user_id % 2 AS INT) AS g, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN g <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    SUM(CASE WHEN g = 0 THEN CAST(v AS DECIMAL(18,6)) END) AS sa,
        |    SUM(CASE WHEN g <> 0 THEN CAST(v AS DECIMAL(18,6)) END) AS sb,
        |    SUM(CASE WHEN g = 0 THEN CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)) END) AS ssa,
        |    SUM(CASE WHEN g <> 0 THEN CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)) END) AS ssb
        |  FROM r)
        |SELECT n_a, n_b,
        |  CAST(sa AS DOUBLE) AS sum_a, CAST(sb AS DOUBLE) AS sum_b,
        |  CAST(ROUND(
        |    (CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b) / SQRT(
        |      ((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / n_a) / (n_a - 1)) / n_a +
        |      ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / n_b) / (n_b - 1)) / n_b),
        |  4) AS DOUBLE) AS t_welch
        |FROM m""".stripMargin,

    // same exact-ppm observed side; expected rounds LOG10 once at ppm
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS tot FROM c)
        |SELECT digit, n_obs,
        |  CAST(n_obs * 1000000 // tot AS BIGINT) AS obs_ppm,
        |  CAST(ROUND(LOG10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / digit) * 1000000, 0) AS BIGINT) AS expected_ppm,
        |  CAST(n_obs * 1000000 // tot AS BIGINT)
        |    - CAST(ROUND(LOG10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / digit) * 1000000, 0) AS BIGINT) AS dev_ppm
        |FROM c CROSS JOIN t""".stripMargin,

    // same simulated loss, generate_series spine, NOT IN, bucket rollup
    "q_gap_detection" ->
      """WITH ids AS (
        |  SELECT DISTINCT event_id AS id FROM events
        |  WHERE event_id % 97 <> 13),
        |r AS (SELECT MIN(id) AS lo, MAX(id) AS hi FROM ids),
        |sp AS (SELECT unnest(generate_series(lo, hi)) AS id FROM r),
        |miss AS (SELECT id FROM sp WHERE id NOT IN (SELECT id FROM ids))
        |SELECT CAST(id // 1000 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_missing,
        |  MIN(id) AS min_missing, MAX(id) AS max_missing
        |FROM miss GROUP BY 1""".stripMargin,

    // identical integer floor divisions ('//' == Spark 'div' on
    // positives); all quantities exact counts
    // exact sides of the sketch QA report; the ok column is the PINNED
    // EXPECTATION (literal TRUE) — Spark computes the actual bound
    // check, so an out-of-bound sketch hash-fails against this oracle
    "approx_eval" ->
      """WITH hx AS (
        |  SELECT CAST(event_type AS VARCHAR) AS grp,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1),
        |qx AS (
        |  SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM orders GROUP BY 1),
        |fq AS (
        |  SELECT CASE WHEN user_id % 5 = 0 THEN 0 ELSE user_id % 50 END AS hot_key,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1),
        |ft AS (SELECT SUM(c) AS tot FROM fq),
        |fn AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
        |  FROM fq CROSS JOIN ft WHERE CAST(c AS DOUBLE) / tot >= 0.05)
        |SELECT 'hll_distinct' AS family, grp, n_exact, TRUE AS ok FROM hx
        |UNION ALL SELECT 'hll_merge', grp, n_exact, TRUE FROM hx
        |UNION ALL SELECT 'quantile', g || ':' || p, n_exact, TRUE
        |  FROM qx CROSS JOIN (SELECT unnest(['0.5', '0.9']) AS p) pp
        |UNION ALL SELECT 'freq_items', 'hot_key', n_exact, TRUE FROM fn""".stripMargin,

    "q_basket_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM it),
        |sup AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS s FROM it GROUP BY 1),
        |pr AS (
        |  SELECT x.i AS i1, y.i AS i2, CAST(COUNT(*) AS BIGINT) AS s_ab
        |  FROM it x JOIN it y ON x.b = y.b AND x.i < y.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT i1 AS item_a, i2 AS item_b, s_ab AS support,
        |  CAST(s_ab * 1000000 // s1.s AS BIGINT) AS conf_ab_ppm,
        |  CAST(s_ab * 1000000 // s2.s AS BIGINT) AS conf_ba_ppm,
        |  CAST(CAST(s_ab AS HUGEINT) * nb * 1000000
        |    // (CAST(s1.s AS HUGEINT) * s2.s) AS BIGINT) AS lift_ppm
        |FROM pr JOIN sup s1 ON s1.i = pr.i1 JOIN sup s2 ON s2.i = pr.i2
        |CROSS JOIN nb""".stripMargin,

    // same lower-median element selection: list() over the identical
    // ROWS frame, sorted, 1-indexed (len+1)//2
    "q_rolling_median" ->
      """WITH r AS (
        |  SELECT user_id AS k, ts AS t, event_id AS id,
        |    CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL),
        |w AS (
        |  SELECT k, id, t,
        |    list(v) OVER (PARTITION BY k ORDER BY t, id
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS lw
        |  FROM r)
        |SELECT k AS user_id, id AS event_id, t AS ts,
        |  CAST(len(lw) AS INT) AS n_window,
        |  (list_sort(lw))[(len(lw) + 1) // 2] AS rolling_median
        |FROM w""".stripMargin,

    // same running-max opening rule; ROWS frames make the tie case
    // provably order-independent (a tied row's start never exceeds the
    // running max its twin just raised)
    // one row per (k, s) first: the window sort key is then UNIQUE,
    // so the island running sum is order-free — ties on a non-unique
    // (s, e) sort carry different running-max values between the two
    // window passes and split islands when an engine re-sorts between
    // them (r13 determinism fix, both sides)
    "q_interval_merge" ->
      """WITH i AS (
        |  SELECT l_suppkey AS k, l_shipdate AS s,
        |    MAX(l_shipdate + (CAST(l_quantity AS INT) % 14) * INTERVAL 1 DAY) AS e,
        |    COUNT(*) AS cnt
        |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2),
        |m AS (
        |  SELECT k, s, e, cnt, MAX(e) OVER (PARTITION BY k ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |  FROM i),
        |g AS (
        |  SELECT k, s, e, cnt,
        |    SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY k ORDER BY s ROWS UNBOUNDED PRECEDING) AS isl
        |  FROM m)
        |SELECT k AS l_suppkey, MIN(s) AS island_start, MAX(e) AS island_end,
        |  CAST(SUM(cnt) AS BIGINT) AS n_intervals
        |FROM g GROUP BY k, isl""".stripMargin,

    // ordered string_agg inside the rn<=3 cut; rank ties on path asc
    "q_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id),
        |c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM p GROUP BY 1)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_users DESC, path) AS INT) AS rank,
        |  path, n_users
        |FROM c ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // deliberately a DIFFERENT O(n log n) formulation than the engine's
    // (distinct triples + one combined window vs group-reduce +
    // frontier join) — equal output was pinned against the naive
    // NOT-EXISTS dominance form at sf0.01 where that is still feasible
    "q_skyline" ->
      """WITH t AS (
        |  SELECT DISTINCT o_orderpriority AS p, o_totalprice AS v,
        |    o_orderdate AS d
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
        |s AS (
        |  SELECT p, v, d, max(d) OVER (PARTITION BY p ORDER BY v DESC, d DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS md
        |  FROM t),
        |f AS (SELECT p, v, d FROM s WHERE md IS NULL OR d > md)
        |SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice, o.o_orderdate
        |FROM orders o
        |JOIN f ON o.o_orderpriority = f.p AND o.o_totalprice = f.v
        |  AND o.o_orderdate = f.d""".stripMargin,

    "q_trailing_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS day
        |  FROM events WHERE ts IS NOT NULL),
        |ex AS (
        |  SELECT DISTINCT u, rday FROM (
        |    SELECT u, unnest(generate_series(day,
        |      day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS rday FROM du)),
        |cnt AS (SELECT rday, CAST(COUNT(*) AS BIGINT) AS n_active
        |        FROM ex GROUP BY rday)
        |SELECT d.day, c.n_active
        |FROM (SELECT DISTINCT day FROM du) d JOIN cnt c ON c.rday = d.day""".stripMargin,

    // same frame, same left-to-right fold: DuckDB's window list() is
    // frame-ordered and list_sum folds sequentially
    "q_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    list(COALESCE(CAST(value AS DOUBLE), CAST(0.0 AS DOUBLE)))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(ROUND(
        |    list_sum([vals[j+1] * pow(CAST(0.5 AS DOUBLE), len(vals)-1-j)
        |              for j in range(0, len(vals))]) /
        |    list_sum([pow(CAST(0.5 AS DOUBLE), len(vals)-1-j)
        |              for j in range(0, len(vals))]),
        |  4) + 0.0 AS DOUBLE) AS ewma_r
        |FROM e""".stripMargin,

    "q_full_join" ->
      """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
        |  CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
        |         THEN 'both'
        |       WHEN o.o_custkey IS NULL THEN 'customer_only'
        |       ELSE 'order_only' END AS coverage,
        |  c.c_mktsegment, o.n_orders, o.spend
        |FROM (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_acctbal > 0) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        |      AS spend
        |  FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey""".stripMargin,

    "q_mode_median" ->
      """SELECT event_type,
        |  CAST(ROUND(MEDIAN(value), 6) AS DOUBLE) AS med_val,
        |  MODE(CASE WHEN value < 55 THEN 'lo' ELSE 'hi' END) AS mode_band,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q_regex_funcs" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS INT) AS n_long,
        |  regexp_extract(text, '^([a-z]+)', 1) AS first_tok,
        |  regexp_replace(SUBSTR(text, 1, 40), '[aeiou]', '_', 'g')
        |    AS devoweled,
        |  regexp_matches(text, 'spark .* window') AS mentions
        |FROM documents""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(ROUND(CAST(x AS DOUBLE), 7) AS DECIMAL(28,9))))
        |    AS DOUBLE) AS sum_r,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  CAST(ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS DOUBLE)
        |    AS max_v,
        |  len(list_filter(embedding, x -> x > 2.5)) > 0 AS has_big
        |FROM embeddings""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE r AS (
        |  SELECT node, node AS root, 0 AS depth FROM (
        |    SELECT DISTINCT c_custkey // 10 AS node FROM customer
        |    WHERE c_custkey >= 10
        |    EXCEPT
        |    SELECT c_custkey FROM customer WHERE c_custkey >= 10) roots
        |  UNION ALL
        |  SELECT c.c_custkey AS node, r.root, r.depth + 1
        |  FROM customer c JOIN r ON c.c_custkey // 10 = r.node
        |  WHERE c.c_custkey >= 10)
        |SELECT node, root, CAST(depth AS INT) AS depth FROM r""".stripMargin,

    "q_agg_predicates" ->
      """SELECT event_type,
        |  CAST(COUNT_IF(value > 50) AS BIGINT) AS n_high,
        |  BOOL_AND(value >= 0) AS all_nonneg,
        |  BOOL_OR(value > 99) AS any_extreme,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    // the identical Morton spread chain, unrolled; masks are the
    // decimal forms of 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555
    "q_zorder" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CAST(o_custkey % 65536 AS BIGINT) AS x,
        |    CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
        |         % 65536 AS BIGINT) AS y
        |  FROM orders WHERE o_orderkey < 2000),
        |s1 AS (SELECT *, ((x | (x << 8)) & 16711935) AS xa,
        |               ((y | (y << 8)) & 16711935) AS ya FROM b),
        |s2 AS (SELECT *, ((xa | (xa << 4)) & 252645135) AS xb,
        |               ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
        |s3 AS (SELECT *, ((xb | (xb << 2)) & 858993459) AS xc,
        |               ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (SELECT *, ((xc | (xc << 1)) & 1431655765) AS xd,
        |               ((yc | (yc << 1)) & 1431655765) AS yd FROM s3)
        |SELECT o_orderkey, x, y, xd | (yd << 1) AS zval FROM s4""".stripMargin,

    "q_join_bucketed" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin
  )
}
