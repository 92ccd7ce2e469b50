package graft

import org.apache.spark.sql.functions._
import graft.operators.Approx

class ApproxSpec extends SparkSpec {

  test("HLL distinct count within rsd of exact") {
    val events = Tables.events(spark, sf0001)
    val approx = Approx.distinctCount(events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(2, (n * 0.15)), s"$k: ${approx(k)} vs $n")
    }
  }

  test("approx quantiles bracket the exact median") {
    val orders = Tables.orders(spark, sf0001)
    val row = Approx.quantiles(orders, Seq("o_orderpriority"),
      "o_totalprice", Seq(0.5)).collect().head
    val q = row.getDouble(2)
    val exact = orders.where(col("o_orderpriority") === row.getString(0))
      .selectExpr("percentile(o_totalprice, 0.5)").head().getDouble(0)
    assert(math.abs(q - exact) / exact < 0.1)
  }

  test("quantiles keeps all-NULL groups as a NULL row") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None))
      .toDF("g", "v")
    val out = Approx.quantiles(df, Seq("g"), "v", Seq(0.5)).collect()
      .map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(out == Map("a" -> false, "b" -> true)) // b present, NULL quantile
  }

  test("frequent items finds every event type at low support") {
    val out = Approx.frequentItems(Tables.events(spark, sf0001), "event_type", 0.1)
      .head().getSeq[String](0).toSet
    assert(Set("click", "view", "purchase", "signup", "error").subsetOf(out))
  }

  test("mergeable HLL: union of per-shard sketches == direct sketch, near exact") {
    import graft.operators.Approx
    import org.apache.spark.sql.functions._
    val df = spark.range(100000)
      .select((col("id") % 4).cast("string").as("g"),
        (col("id") % 7919).as("v"),          // 7919 distinct per group
        (col("id") % 10).as("shard"))
    // sketch per (g, shard), then union down to g
    val merged = Approx.unionEstimate(
        Approx.distinctSketches(df, Seq("g", "shard"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct: sketch each g in one pass
    val direct = Approx.unionEstimate(
        Approx.distinctSketches(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct) // union is exact over the sketch lattice
    merged.values.foreach(est =>
      assert(math.abs(est - 7919.0) / 7919.0 < 0.05, s"est=$est"))
  }

  test("evalReport: every sketch family within its declared bound, exact sides exact") {
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, sf0001)
    val orders = Tables.orders(spark, sf0001)
    val out = Approx.evalReport(events, orders).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    // structural: 5 event types × 2 HLL families + 5 priorities × 2
    // probs + 1 freq row
    assert(out.keys.count(_._1 == "hll_distinct") == 5)
    assert(out.keys.count(_._1 == "hll_merge") == 5)
    assert(out.keys.count(_._1 == "quantile") == 10)
    assert(out.keys.count(_._1 == "freq_items") == 1)
    // the gate's contract: every bound holds (ok TRUE everywhere) —
    // rel-err ≤ 3·rsd (HLL), merged == direct ∧ ≤ 5% (lattice), rank
    // within ±1e-3 (quantile), full recall at support (freq)
    out.foreach { case (k, (_, ok)) => assert(ok, s"bound violated: $k") }
    // exact sides independently recomputed
    val exactDistinct = events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exactDistinct.foreach { case (et, n) =>
      assert(out(("hll_distinct", et))._1 == n)
      assert(out(("hll_merge", et))._1 == n)
    }
    val grpN = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    grpN.foreach { case (g, n) =>
      assert(out(("quantile", s"$g:0.5"))._1 == n)
      assert(out(("quantile", s"$g:0.9"))._1 == n)
    }
    // the qualifying-key count matches an independent exact recount
    // (tiny-SF user skew can push several keys over support — the
    // count is data-derived, only key 0's ~20% mass is guaranteed)
    val hot = events.select(
      when(col("user_id") % 5 === 0, lit(0L))
        .otherwise(col("user_id") % 50).as("hot_key"))
    val total = hot.count()
    val nQual = hot.groupBy("hot_key").agg(count(lit(1)).as("c"))
      .where(col("c").cast("double") / total >= 0.05).count()
    assert(nQual >= 1L)
    assert(out(("freq_items", "hot_key"))._1 == nQual)
  }

  test("HL7 repetitions and message type") {
    import spark.implicits._
    val msg = "MSH|^~\\&|APP|FAC|||||ADT^A01|X\rPID|1||42~43"
    val df = Seq(msg).toDF("msg")
    assert(df.select(graft.functions.Hl7.messageType(col("msg")))
      .head().getString(0) == "ADT")
    val pid = graft.functions.Hl7.explodeSegments(df, col("msg"))
      .where(graft.functions.Hl7.segmentId(col("seg")) === "PID")
    assert(pid.select(graft.functions.Hl7.repetitions(
        graft.functions.Hl7.field(col("seg"), 3)))
      .head().getSeq[String](0) == Seq("42", "43"))
  }
}
