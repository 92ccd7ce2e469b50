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
