package graft

import java.sql.Timestamp
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("picks the latest right row at or before left time, per key") {
    val quotes = Seq(
      (1L, ts(0), 101L, 10.0), (1L, ts(10), 102L, 11.0), (1L, ts(30), 103L, 9.0),
      (2L, ts(5), 201L, 50.0)
    ).toDF("qk", "qt", "quote_id", "price")
    val trades = Seq(
      (1L, ts(10), 9001L),  // exactly at a quote → that quote (<=)
      (1L, ts(20), 9002L),  // between quotes → the ts(10) quote
      (1L, ts(99), 9003L),  // after all → last quote
      (2L, ts(0), 9004L),   // before any quote → null
      (3L, ts(50), 9005L)   // key with no quotes → null
    ).toDF("tk", "tt", "trade_id")
    val out = AsOf.join(trades, quotes, "tk", "qk", "tt", "qt",
        Seq("quote_id", "price"), "quote_id")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(9001L) == Some(102L))
    assert(out(9002L) == Some(102L))
    assert(out(9003L) == Some(103L))
    assert(out(9004L).isEmpty)
    assert(out(9005L).isEmpty)
  }

  test("ties at one timestamp resolve to the largest tiebreak") {
    val right = Seq((1L, ts(0), 5L, "a"), (1L, ts(0), 9L, "b"))
      .toDF("rk", "rt", "rid", "tag")
    val left = Seq((1L, ts(1), 7L)).toDF("lk", "lt", "lid")
    val out = AsOf.join(left, right, "lk", "rk", "lt", "rt",
      Seq("rid", "tag"), "rid").collect().head
    assert(out.getLong(3) == 9L && out.getString(4) == "b")
  }

  test("forward direction picks the earliest right row at or after left") {
    val quotes = Seq(
      (1L, ts(0), 101L, 10.0), (1L, ts(10), 102L, 11.0), (1L, ts(30), 103L, 9.0)
    ).toDF("qk", "qt", "quote_id", "price")
    val trades = Seq(
      (1L, ts(10), 9001L),  // exactly at a quote → that quote (>=)
      (1L, ts(11), 9002L),  // between → the ts(30) quote
      (1L, ts(99), 9003L)   // after all → null
    ).toDF("tk", "tt", "trade_id")
    val out = AsOf.join(trades, quotes, "tk", "qk", "tt", "qt",
        Seq("quote_id", "price"), "quote_id", direction = "forward")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(9001L) == Some(102L))
    assert(out(9002L) == Some(103L))
    assert(out(9003L).isEmpty)
  }

  test("tolerance nulls matches beyond the horizon, keeps the left row") {
    val quotes = Seq((1L, ts(0), 101L), (1L, ts(60), 102L))
      .toDF("qk", "qt", "quote_id")
    val trades = Seq(
      (1L, ts(5), 9001L),   // 5 min after quote 101 → within 10-min tol
      (1L, ts(30), 9002L),  // 30 min after 101 → beyond tol → null
      (1L, ts(65), 9003L)   // 5 min after 102 → within
    ).toDF("tk", "tt", "trade_id")
    val out = AsOf.join(trades, quotes, "tk", "qk", "tt", "qt",
        Seq("quote_id"), "quote_id", toleranceUs = Some(10L * 60 * 1000000))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(9001L -> Some(101L), 9002L -> None, 9003L -> Some(102L)))
  }

  test("nearest picks the closer side; equal distance prefers backward") {
    val quotes = Seq(
      (1L, ts(0), 101L), (1L, ts(20), 102L)
    ).toDF("qk", "qt", "quote_id")
    val trades = Seq(
      (1L, ts(5), 9001L),   // 5 back vs 15 fwd → backward (101)
      (1L, ts(14), 9002L),  // 14 back vs 6 fwd → forward (102)
      (1L, ts(10), 9003L),  // tie 10/10 → backward (101)
      (1L, ts(20), 9004L),  // exact hit → 102 at distance 0
      (1L, ts(90), 9005L),  // 70 past the last quote: beyond 30-min tol
      (2L, ts(0), 9006L)    // keyless → null
    ).toDF("tk", "tt", "trade_id")
    val out = AsOf.joinNearest(trades, quotes, "tk", "qk", "tt", "qt",
        Seq("quote_id"), "quote_id", toleranceUs = Some(30L * 60 * 1000000))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out == Map(9001L -> Some(101L), 9002L -> Some(102L),
      9003L -> Some(101L), 9004L -> Some(102L), 9005L -> None,
      9006L -> None))
  }

  test("nearest plan is one window pass, no join") {
    val right = Seq((1L, ts(0), 5L)).toDF("rk", "rt", "rid")
    val left = Seq((1L, ts(1), 7L)).toDF("lk", "lt", "lid")
    val plan = AsOf.joinNearest(left, right, "lk", "rk", "lt", "rt",
      Seq("rid"), "rid").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("plan is one shuffle + window, no pair-exploding join") {
    val right = Seq((1L, ts(0), 5L)).toDF("rk", "rt", "rid")
    val left = Seq((1L, ts(1), 7L)).toDF("lk", "lt", "lid")
    val plan = AsOf.join(left, right, "lk", "rk", "lt", "rt", Seq("rid"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }
}
