package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Long, m: Long = 0): Timestamp =
    new Timestamp((h * 60 + m) * 60000L)

  test("histogram clamps edges and skips empty buckets") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.9, 100.0, 250.0)
      .toDF("v")
    val out = Analytics.histogram(df, "v", lo = 0.0, width = 10.0, buckets = 10)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out(0) == ((0.0, 3L)))  // -5 clamps up, 0.0 and 9.9 in range
    assert(out(1) == ((10.0, 1L)))
    assert(out(2) == ((20.0, 1L)))
    assert(out(9) == ((90.0, 3L))) // 99.9 in range; 100 and 250 clamp down
    assert(out.size == 4)          // buckets 3..8 absent, not zero rows
  }

  test("fillGaps zero-fills only within each key's own active range") {
    val df = Seq(
      ("a", ts(0, 10), 1.0), ("a", ts(0, 20), 2.0), ("a", ts(3, 5), 3.0),
      ("b", ts(10, 0), 4.0)
    ).toDF("k", "t", "v")
    val out = Analytics.fillGaps(df, "k", "t", "v", unit = "HOUR")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000,
        r.getLong(2), r.getDouble(3)))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    // a spans hours 0..3 → 4 rows, hours 1-2 zero-filled
    assert(a.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((0L, 2L, 3.0), (1L, 0L, 0.0), (2L, 0L, 0.0), (3L, 1L, 3.0)))
    // b: single hour, no backfill into a's range
    assert(out.filter(_._1 == "b").map(t => (t._2, t._3)).toSeq ==
      Seq((10L, 1L)))
  }

  test("fillGaps DAY unit: one row per day across each key's range") {
    val day = 24L
    val df = Seq(("a", ts(0), 1.0), ("a", ts(3 * day, 30), 2.0))
      .toDF("k", "t", "v")
    val out = Analytics.fillGaps(df, "k", "t", "v", unit = "DAY")
      .collect().map(r => (r.getTimestamp(1).getTime / (day * 3600000), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0L, 1L), (1L, 0L), (2L, 0L), (3L, 1L)))
    intercept[IllegalArgumentException](
      Analytics.fillGaps(df, "k", "t", "v", unit = "WEEK"))
  }

  test("fillGaps drops NULL keys instead of zeroing their series") {
    val df = Seq[(Option[String], Timestamp, Double)](
      (Some("a"), ts(0), 1.0), (None, ts(0), 5.0), (None, ts(1), 7.0)
    ).toDF("k", "t", "v")
    val out = Analytics.fillGaps(df, "k", "t", "v", unit = "HOUR").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "a" && out.head.getLong(2) == 1L)
  }

  test("funnel counts only strictly-ordered stage progressions") {
    val df = Seq(
      // u1 completes in order
      (1L, ts(1), "s"), (1L, ts(2), "c"), (1L, ts(3), "p"),
      // u2: click BEFORE signup, converts via the later click
      (2L, ts(2), "s"), (2L, ts(1), "c"), (2L, ts(4), "c"), (2L, ts(5), "p"),
      // u3: purchase before click → stops at click
      (3L, ts(1), "s"), (3L, ts(3), "c"), (3L, ts(2), "p"),
      // u4 never signs up
      (4L, ts(1), "c"), (4L, ts(2), "p")
    ).toDF("u", "t", "stage")
    val out = Analytics.funnel(df, "u", "t", "stage", Seq("s", "c", "p"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((0, "s", 3L), (1, "c", 3L), (2, "p", 2L)))
  }

  test("funnel maxGap bounds each step relative to the previous entry") {
    val df = Seq(
      (1L, ts(0), "s"), (1L, ts(0, 30), "c"), (1L, ts(1), "p"),  // all in window
      (2L, ts(0), "s"), (2L, ts(3), "c"),                        // click too late
      (3L, ts(0), "s"), (3L, ts(0, 30), "c"), (3L, ts(4), "p")   // purchase late
    ).toDF("u", "t", "stage")
    val out = Analytics.funnel(df, "u", "t", "stage", Seq("s", "c", "p"),
        maxGapUs = Some(60L * 60 * 1000000)) // 1 hour per step
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(out == Set((0, 3L), (1, 2L), (2, 1L)))
  }

  test("maxConcurrent: half-open intervals, an end never overlaps a start") {
    val df = Seq(
      // k=a, 60-min intervals: [0,60) [30,90) [45,105) → peak 3;
      // [105,165) starts exactly as [45,105) ends → no overlap there
      ("a", ts(0)), ("a", ts(0, 30)), ("a", ts(0, 45)), ("a", ts(1, 45)),
      // k=b: two disjoint intervals → peak 1
      ("b", ts(0)), ("b", ts(5))
    ).toDF("k", "t")
    val out = Analytics.maxConcurrent(df, "k", "t", 3600000000L)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(out("a") == ((3, 4L)))
    assert(out("b") == ((1, 2L)))
  }

  test("streaks: islands split on missing days, totals count active days") {
    val day = 24L
    val df = Seq(
      // u1 active days 0,1,2, 5,6 → max streak 3, 5 active days
      (1L, ts(0)), (1L, ts(0, 30)), (1L, ts(day)), (1L, ts(2 * day)),
      (1L, ts(5 * day)), (1L, ts(6 * day)),
      (2L, ts(9 * day)) // single day
    ).toDF("u", "t")
    val out = Analytics.streaks(df, "u", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1L) == ((5L, 3)))
    assert(out(2L) == ((1L, 1)))
  }

  test("attribution: first/last touch models, same-instant touch counts") {
    val df = Seq(
      // u1: view → click → buy(10): first=view, last=click
      (1L, ts(0), "view", 0.0, 1L), (1L, ts(1), "click", 0.0, 2L),
      (1L, ts(2), "buy", 10.0, 3L),
      // u2: touch at the buy instant (smaller id) still counts as last
      (2L, ts(0), "view", 0.0, 4L), (2L, ts(1), "click", 0.0, 5L),
      (2L, ts(1), "buy", 5.0, 6L),
      // u3: no touches → (none)
      (3L, ts(0), "buy", 2.5, 7L)
    ).toDF("u", "t", "et", "v", "id")
    val out = Analytics.attribution(df, "u", "t", "et", "v", "buy", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("first_touch", "view")) == ((2L, 15.0)))
    assert(out(("last_touch", "click")) == ((2L, 15.0)))
    assert(out(("first_touch", "(none)")) == ((1L, 2.5)))
    assert(out(("last_touch", "(none)")) == ((1L, 2.5)))
    assert(out.size == 4)
  }

  test("outliers: z-score flags, degenerate groups dropped") {
    val base = (1 to 20).map(i => ("a", i.toLong, 10.0)) // sd = 0 → dropped
    val spread = (1 to 20).map(i => ("b", 100L + i, if (i == 20) 1000.0 else 10.0))
    val df = (base ++ spread ++ Seq(("c", 999L, 5.0))) // n=1 → dropped
      .toDF("k", "id", "v")
    val out = Analytics.outliers(df, "k", "id", "v", z = 3.0).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("b", 120L)))
    assert(out.head.getDouble(3) > 4.0) // the lone spike is far out
  }

  test("trailingDistinct: window counts carry users forward, real days only") {
    val day = 24L
    val df = Seq(
      (1L, ts(0)), (2L, ts(0)),          // day 0: users 1,2
      (1L, ts(2 * day)),                 // day 2: user 1 again
      (3L, ts(9 * day))                  // day 9: window covers days 3..9
    ).toDF("u", "t")
    val out = Analytics.trailingDistinct(df, "u", "t", days = 7)
      .collect()
      .map(r => r.getTimestamp(0).getTime / (day * 3600000) -> r.getLong(1))
      .toMap
    // only days present in the data appear
    assert(out.keySet == Set(0L, 2L, 9L))
    assert(out(0L) == 2L) // users 1,2
    assert(out(2L) == 2L) // users 1,2 still within 7 days
    assert(out(9L) == 1L) // user 3 alone; users 1/2 expired (last: day 2)
  }

  test("retention buckets users by weeks since their own first day") {
    val day = 24L
    val df = Seq(
      (1L, ts(0)), (1L, ts(3 * day)), (1L, ts(8 * day)),   // w0, w0, w1
      (2L, ts(7 * day)), (2L, ts(21 * day))                // later cohort: w0, w2
    ).toDF("u", "t")
    val out = Analytics.retention(df, "u", "t")
      .collect()
      .map(r => (r.getTimestamp(0).getTime / (day * 3600000), r.getInt(1),
        r.getLong(2))).toSet
    assert(out == Set((0L, 0, 1L), (0L, 1, 1L), (7L, 0, 1L), (7L, 2, 1L)))
  }

  test("transitions: per-key lag pairs, row-normalized probabilities") {
    // u1: A B A B → A→B, B→A, A→B; u2: A A B → A→A, A→B
    val df = Seq(
      (1L, ts(1), "A", 1L), (1L, ts(2), "B", 2L),
      (1L, ts(3), "A", 3L), (1L, ts(4), "B", 4L),
      (2L, ts(1), "A", 5L), (2L, ts(2), "A", 6L), (2L, ts(3), "B", 7L)
    ).toDF("u", "t", "st", "id")
    val out = Analytics.transitions(df, "u", "t", "st", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      ("A", "B") -> ((3L, 0.75)), ("A", "A") -> ((1L, 0.25)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("transitions: equal timestamps resolve by the tie column") {
    // both events at the same ts: id order decides X→Y, not partition luck
    val df = Seq((1L, ts(1), "X", 1L), (1L, ts(1), "Y", 2L))
      .toDF("u", "t", "st", "id")
    val a = Analytics.transitions(df.repartition(1), "u", "t", "st", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val b = Analytics.transitions(df.repartition(5), "u", "t", "st", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(a == Seq(("X", "Y")) && b == Seq(("X", "Y")))
  }

  test("sessionize: gap threshold starts new sessions, durations in floor seconds") {
    // user 1: events at 0:00, 0:10, 0:20 (one session, 1200s), then
    // 2:00, 2:05 (second session, 300s); user 2: single event
    val df = Seq(
      (1L, ts(0, 0)), (1L, ts(0, 10)), (1L, ts(0, 20)),
      (1L, ts(2, 0)), (1L, ts(2, 5)),
      (2L, ts(5, 0))).toDF("user_id", "tstamp")
    val out = Analytics.sessionize(df, "user_id", "tstamp",
        gapUs = 1800000000L) // 30 min
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 3, 1500L))) // 1200s + 300s
    assert(out(2L) == ((1L, 1, 0L)))
  }

  test("sessionize: exact-gap boundary stays in session; ties collapse to gap 0") {
    val df = Seq(
      (1L, ts(0, 0)), (1L, ts(0, 30)),        // gap == 30min: SAME session
      (2L, ts(0, 0)), (2L, ts(0, 0)), (2L, ts(0, 31))) // tie, then > gap
      .toDF("user_id", "tstamp")
    val out = Analytics.sessionize(df, "user_id", "tstamp", gapUs = 1800000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out(1L) == ((1L, 2)))
    assert(out(2L) == ((2L, 2)))
  }

  test("sessionize is partitioning-independent") {
    val df = Seq((1L, ts(0, 0)), (1L, ts(1, 0)), (1L, ts(1, 10)))
      .toDF("user_id", "tstamp")
    val a = Analytics.sessionize(df, "user_id", "tstamp", 1800000000L).collect().toSeq
    val b = Analytics.sessionize(df.repartition(7), "user_id", "tstamp", 1800000000L).collect().toSeq
    assert(a == b)
  }

  test("skyline: strict dominance, both-dim ties survive, nulls drop") {
    val df = Seq(
      ("a", 1L, Option(10.0), 5L), // dominated by id 2 (higher x, equal y)
      ("a", 2L, Option(20.0), 5L), // frontier
      ("a", 3L, Option(20.0), 4L), // dominated by id 2 (equal x, higher y)
      ("a", 4L, Option(15.0), 9L), // frontier (highest y)
      ("a", 5L, Option(15.0), 9L), // exact tie with id 4 on both dims: survives
      ("a", 6L, Option(30.0), 1L), // frontier (max x)
      ("b", 7L, Option(1.0), 1L),  // alone in its group: frontier
      ("b", 8L, Option.empty[Double], 9L) // null dim: excluded
    ).toDF("k", "id", "x", "y")
    val kept = Analytics.skyline(df, "k", "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L, 6L, 7L))
  }

  test("skyline equals brute-force dominance on sf0.001 orders") {
    val o = graft.Tables.t(spark, sf0001, "orders")
      .select(col("o_orderkey").as("id"), col("o_orderpriority").as("k"),
        col("o_totalprice").as("x"), col("o_orderdate").as("y"))
    val fast = Analytics.skyline(o, "k", "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    val dom = o.as("p").join(o.as("q"),
      col("q.k") === col("p.k") &&
        col("q.x") >= col("p.x") && col("q.y") >= col("p.y") &&
        (col("q.x") > col("p.x") || col("q.y") > col("p.y")), "left_semi")
    val naive = o.select("id").except(dom.select("id"))
      .collect().map(_.getLong(0)).toSet
    assert(fast == naive && fast.nonEmpty)
  }

  test("skyline is partition-count independent") {
    val o = graft.Tables.t(spark, sf0001, "orders")
    val a = Analytics.skyline(o, "o_orderpriority", "o_totalprice", "o_orderdate")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val b = Analytics.skyline(o.repartition(13), "o_orderpriority",
        "o_totalprice", "o_orderdate")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("ewma: power-of-two weights, bounded lookback, null as zero") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 00:$m%02d:00")
    val df = Seq(
      (1L, 7L, ts(1), Some(1.0)),
      (2L, 7L, ts(2), Some(2.0)),
      (3L, 7L, ts(3), Some(4.0)),
      (4L, 8L, ts(1), None: Option[Double]),
      (5L, 8L, ts(2), Some(6.0))
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Analytics.ewma(df, "user_id", Seq("ts", "event_id"),
        "event_id", "value", lookback = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // user 7: [1] -> 1; [1,2] -> (0.5+2)/1.5; [1,2,4] -> (0.25+1+4)/1.75
    assert(out(1L) == 1.0)
    assert(out(2L) == math.rint(2.5 / 1.5 * 1e4) / 1e4)
    assert(out(3L) == 3.0)
    // user 8: null counts as 0 but occupies a slot
    assert(out(4L) == 0.0)
    assert(out(5L) == math.rint(6.0 / 1.5 * 1e4) / 1e4)
    // lookback bound: with lookback=2 the first value drops out
    val out2 = Analytics.ewma(df, "user_id", Seq("ts", "event_id"),
        "event_id", "value", lookback = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out2(3L) == math.rint((1.0 + 4.0) / 1.5 * 1e4) / 1e4)
  }

  test("meanShifts: level shift flags only where both frames are full") {
    // "a": 8×10 then 8×20 — only t=9 has two full frames; shift 10 > 1.5σ
    val a = (1 to 16).map(i =>
      ("a", i.toLong, 100L + i, if (i <= 8) 10.0 else 20.0))
    // "b": three 8-row plateaus 0.5 apart — every full-frame shift is
    // 0.5 < 1.5σ (σ ≈ 0.417), so a drift below threshold stays quiet
    val b = (1 to 24).map(i => ("b", i.toLong, 200L + i,
      if (i <= 8) 10.0 else if (i <= 16) 10.5 else 11.0))
    // "c": constant → σ = 0 → the key is dropped before any frame math
    val c = (1 to 20).map(i => ("c", i.toLong, 300L + i, 5.0))
    val df = (a ++ b ++ c).toDF("k", "t", "id", "v")
    val out = Analytics.meanShifts(df, "k", "t", "id", "v", w = 8, z = 1.5)
      .collect()
    assert(out.length == 1)
    val r = out.head
    // columns: k, id, t, mean_before, mean_after, shift_z
    assert(r.getString(0) == "a" && r.getLong(1) == 109L && r.getLong(2) == 9L)
    assert(r.getDouble(3) == 10.0 && r.getDouble(4) == 20.0)
    // σ over all 16 values = sqrt(400/15); z = 10/σ rounded at 4
    assert(r.getDouble(5) == math.rint(10.0 / math.sqrt(400.0 / 15) * 1e4) / 1e4)
  }

  test("meanShifts: partition-count independent; argument guards") {
    val df = (1 to 40).map(i =>
      ("k", i.toLong, i.toLong, if (i <= 20) 3.0 else 9.0)).toDF("k", "t", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.meanShifts(d, "k", "t", "id", "v", w = 8, z = 1.5)
        .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(7)))
    assert(run(df).nonEmpty)
    intercept[IllegalArgumentException](
      Analytics.meanShifts(df, "k", "t", "id", "v", w = 1))
    intercept[IllegalArgumentException](
      Analytics.meanShifts(df, "k", "t", "id", "v", z = 0.0))
  }

  test("abTest: exact moments, hand-checked Welch t") {
    val df = Seq((0, Some(1.0)), (0, Some(2.0)), (0, Some(3.0)),
      (1, Some(2.0)), (1, Some(4.0)), (0, None)).toDF("variant", "v")
    val r = Analytics.abTest(df, "variant", "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 6.0 && r.getDouble(3) == 6.0)
    // ma=2 mb=3, va=1 vb=2 → t = −1/√(1/3 + 1) = −0.8660
    val want = BigDecimal((2.0 - 3.0) / math.sqrt(1.0 / 3 + 2.0 / 2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == want)
  }

  test("benford: leading digits, exact obs ppm, closed-form expectation") {
    val df = Seq[Option[Double]](Some(1.0), Some(19.5), Some(25.0),
      Some(33.3), Some(911.0), Some(0.4), None).map(Tuple1(_)).toDF("v")
    val out = Analytics.benford(df, "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 0.4 and null excluded; digits 1,1,2,3,9 over total 5
    assert(out.keySet == Set(1, 2, 3, 9))
    assert(out(1)._1 == 2L && out(1)._2 == 400000L)
    assert(out(2)._2 == 200000L)
    // expected(1) = round(log10(2)·1e6) = 301030; dev = obs − expected
    assert(out(1)._3 == 301030L && out(1)._4 == 400000L - 301030L)
    assert(out(9)._3 ==
      BigDecimal(math.log10(1.0 + 1.0 / 9) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("basketRules: exact ppm confidence/lift, minSupport cut, dup items collapse") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"),  // duplicate item in basket 1
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "z")
    ).toDF("b", "i")
    val out = Analytics.basketRules(df, "b", "i", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // only (x,y): support 2; s(x)=3 s(y)=2, N=4
    // conf x→y = 2/3 → 666666 (floor), conf y→x = 1000000,
    // lift = 2·4/(3·2) = 4/3 → 1333333
    assert(out == Map(("x", "y") -> ((2L, 666666L, 1000000L, 1333333L))))
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.basketRules(d, "b", "i", 2L).collect().length
    assert(run(df.repartition(7)) == 1)
    intercept[IllegalArgumentException](Analytics.basketRules(df, "b", "i", 0L))
  }

  test("rollingMedian: lower-median element, warm-up prefix, exact values") {
    val df = Seq(
      ("a", 1L, 1L, Some(5.0)), ("a", 2L, 2L, Some(1.0)),
      ("a", 3L, 3L, Some(9.0)), ("a", 4L, 4L, Some(3.0)),
      ("a", 5L, 5L, None)                         // null value dropped
    ).toDF("k", "t", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.rollingMedian(d, "k", "t", "id", "v", n = 3)
        .collect().map(r => r.getLong(1) -> ((r.getInt(3), r.getDouble(4))))
        .toMap
    val out = run(df)
    assert(out == Map(
      1L -> ((1, 5.0)),   // [5]
      2L -> ((2, 1.0)),   // [1,5] → lower median
      3L -> ((3, 5.0)),   // [1,5,9]
      4L -> ((3, 3.0))))  // frame slides: [1,3,9]
    assert(run(df.repartition(5)) == out)
    intercept[IllegalArgumentException](
      Analytics.rollingMedian(df, "k", "t", "id", "v", n = 0))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, degenerates drop") {
    val df = Seq(
      ("a", 1L, 5L), ("a", 5L, 8L),   // touching endpoints → one island
      ("a", 2L, 3L),                  // nested → absorbed
      ("a", 10L, 12L),                // gap → second island
      ("b", 1L, 2L),
      ("b", 5L, 4L)                   // end < start → dropped at scan
    ).toDF("k", "s", "e")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.mergeIntervals(d, "k", "s", "e").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val out = run(df)
    assert(out == Set(("a", 1L, 8L, 3L), ("a", 10L, 12L, 1L),
      ("b", 1L, 2L, 1L)))
    assert(run(df.repartition(7)) == out)
    // tie hardening (the r13 determinism fix): DUPLICATE intervals and
    // equal-start-different-end rows must co-island with full
    // multiplicity regardless of how any engine orders the ties —
    // equal starts overlap at the start by definition
    val ties = Seq(
      ("c", 1L, 4L), ("c", 1L, 4L),   // identical pair
      ("c", 1L, 9L),                  // same start, longer reach
      ("c", 6L, 7L),                  // chained through the reach
      ("c", 20L, 21L), ("c", 20L, 21L) // identical pair after a gap
    ).toDF("k", "s", "e")
    assert(run(ties) == Set(("c", 1L, 9L, 4L), ("c", 20L, 21L, 2L)))
    assert(run(ties.repartition(5)) ==
      Set(("c", 1L, 9L, 4L), ("c", 20L, 21L, 2L)))
  }

  test("topPaths: time-ordered first-k labels, id tie-break, short paths kept") {
    val df = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "buy"),
      (1L, 40L, 4L, "view"),                       // 4th event ignored
      (2L, 5L, 5L, "view"), (2L, 6L, 6L, "click"), (2L, 7L, 7L, "buy"),
      (3L, 1L, 9L, "view"), (3L, 1L, 8L, "click")  // ts tie → id 8 first
    ).toDF("u", "t", "id", "l")
    def run(d: org.apache.spark.sql.DataFrame) =
      Analytics.topPaths(d, "u", "t", "id", "l", k = 3, topK = 10)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val out = run(df)
    assert(out == Seq((1, "view>click>buy", 2L), (2, "click>view", 1L)))
    assert(run(df.repartition(7)) == out)
    intercept[IllegalArgumentException](
      Analytics.topPaths(df, "u", "t", "id", "l", k = 0))
  }
}
