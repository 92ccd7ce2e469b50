package graft

import org.apache.spark.sql.functions._
import graft.operators.{Changelog, Profile}

class ChangelogProfileSpec extends SparkSpec {
  import spark.implicits._

  private def changelog = Seq(
    // (key, ts, id, value) — key "a" updated three times, tie at ts=20
    ("a", 10L, 1L, 1.0),
    ("a", 20L, 2L, 2.0),
    ("a", 20L, 3L, 3.0), // same ts as id=2: id tie-break must pick 3
    ("b", 5L, 4L, 4.0)
  ).toDF("k", "ts", "id", "v")

  test("latestByKey keeps exactly one deterministic winner per key") {
    val out = Changelog.latestByKey(changelog, Seq("k"),
        Seq(col("ts").desc, col("id").desc))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(("a", 3L, 3.0), ("b", 4L, 4.0)))
  }

  test("applyCdc: tombstone wins, later re-insert resurrects") {
    val log = Seq(
      ("a", 10L, 1L, "U"), ("a", 20L, 2L, "D"),              // a: deleted
      ("b", 5L, 3L, "U"), ("b", 6L, 4L, "D"), ("b", 9L, 5L, "U"), // b: back
      ("c", 1L, 6L, "U"),
      ("d", 1L, 7L, null)  // NULL op: ambiguous ≠ delete — key survives
    ).toDF("k", "ts", "id", "op")
    val out = Changelog.applyCdc(log, Seq("k"),
        Seq(col("ts").desc, col("id").desc), isDelete = col("op") === "D")
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(out == Set(("b", 5L), ("c", 6L), ("d", 7L)))
  }

  test("scd2 intervals chain and exactly one current version per key") {
    val out = Changelog.scd2(changelog, Seq("k"), "ts", Seq(col("id").asc))
      .select("k", "version", "id", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a.map(_._3).toSeq == Seq(1L, 2L, 3L)) // ts asc, id tie-break asc
    // each version's valid_to is the next version's valid_from
    assert(a.init.zip(a.tail).forall { case (p, n) => p._5 == n._4 })
    assert(out.count(_._6) == 2) // one current row per key
    assert(a.last._6 && a.last._5 == -1L)
  }

  private def profiled = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "x", 1.5), (2L, "y", 2.5), (2L, null, null), (3L, "x", 12345678.9)
  ).toDF("num", "str", "dbl")

  test("columnProfile: exact nulls/distinct and portable min/max rendering") {
    val rows = Profile.columnProfile(profiled, Seq("num", "str", "dbl"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(rows("num") == ((4L, 0L, 3L, "1", "3")))
    assert(rows("str") == ((4L, 1L, 2L, "x", "y")))
    // doubles render via %.4f — no scientific notation at 1e7+
    assert(rows("dbl") == ((4L, 1L, 3L, "1.5000", "12345678.9000")))
  }

  test("columnProfile: all-null column profiles as zero-distinct, null extremes") {
    val df = Seq[(Int, Option[Double])]((1, None), (2, None)).toDF("a", "b")
    val r = Profile.columnProfile(df, Seq("b")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("psiDrift: identical distributions score ~0, a shift scores high") {
    import spark.implicits._
    val base = (1 to 1000).map(i => i.toDouble % 100).toDF("v")
    // identical distribution → PSI ≈ 0 (add-1 smoothing keeps it tiny)
    val same = Profile.psiDrift(base, base, "v", bins = 10).collect()
    assert(same.length == 10)
    val psiSame = same.head.getAs[Double]("psi_total")
    assert(math.abs(psiSame) < 0.001, s"identical dists scored $psiSame")
    // hard shift: current values live in the top half of the range
    val cur = (1 to 1000).map(i => 50.0 + i % 50).toDF("v")
    val shifted = Profile.psiDrift(base, cur, "v", bins = 10).collect()
    val psiShift = shifted.head.getAs[Double]("psi_total")
    assert(psiShift > 0.25, s"hard shift scored only $psiShift")
    // every row carries the same total; bins are the full 0..9 frame
    assert(shifted.map(_.getAs[Double]("psi_total")).distinct.length == 1)
    assert(shifted.map(_.getAs[Int]("bin")).sorted.toSeq == (0 to 9))
    // out-of-range current values clamp into the edge bins, not lost
    val far = Seq(1e9).toDF("v")
    val clamped = Profile.psiDrift(base, far, "v", bins = 10)
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("n_cur")).toMap
    assert(clamped(9) == 1L)
  }

  test("checkRules: NULL predicate results count as violations") {
    import graft.operators.Quality
    val df = Seq[(java.lang.Long, String)](
      (5L, "a"), (-1L, "b"), (null, "c")
    ).toDF("v", "tag")
    val out = Quality.checkRules(df, Seq(
        "v_pos" -> "v > 0", "tag_known" -> "tag IN ('a','b','c')"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("v_pos") == ((3L, 2L, false)))     // -1 fails, NULL counts too
    assert(out("tag_known") == ((3L, 0L, true)))
  }

  test("checkRules: empty input passes every rule with zero counts") {
    import graft.operators.Quality
    val df = Seq((1L, "a")).toDF("v", "tag").where("v < 0")
    val r = Quality.checkRules(df, Seq("v_pos" -> "v > 0")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) == ((0L, 0L, true)))
  }

  test("checkRules rejects duplicate rule names") {
    import graft.operators.Quality
    val df = Seq((1L, "a")).toDF("v", "tag")
    intercept[IllegalArgumentException](
      Quality.checkRules(df, Seq("r" -> "v > 0", "r" -> "v < 9")))
  }

  test("lDiversity: distinct-sensitive counts per class, nulls don't count") {
    val rel = Seq(
      ("A", "a"), ("A", "a"), ("A", "b"),
      ("B", "a"), ("B", "b"), ("B", "c"),
      ("C", "a"), ("C", null), ("C", null)
    ).toDF("cls", "sens")
    val out = graft.operators.Quality.lDiversity(rel, Seq("cls"), "sens", l = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      "A" -> ((3L, 2L, false)),
      "B" -> ((3L, 3L, true)),
      "C" -> ((3L, 1L, false))))
    intercept[IllegalArgumentException](
      graft.operators.Quality.lDiversity(rel, Seq("cls"), "sens", l = 1))
  }

  test("quarantine: violated-rule lists in definition order; NULL is a violation; clean rows absent") {
    val df = Seq(
      (1L, Some(10.0), "A"),    // clean → absent
      (2L, Some(-1.0), "A"),    // fails v_positive only
      (3L, Some(200.0), "X"),   // fails v_max AND flag_ok
      (4L, None, "A")           // NULL fails both value rules
    ).toDF("id", "v", "flag")
    val rules = Seq("v_positive" -> "v > 0", "v_max" -> "v <= 100",
      "flag_ok" -> "flag IN ('A','B')")
    val out = graft.operators.Quality.quarantine(df, Seq("id"), rules)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    assert(out == Map(
      2L -> ((1, "v_positive")),
      3L -> ((2, "v_max,flag_ok")),
      4L -> ((2, "v_positive,v_max"))))
    intercept[IllegalArgumentException](
      graft.operators.Quality.quarantine(df, Seq("id"), Nil))
    intercept[IllegalArgumentException](
      graft.operators.Quality.quarantine(df, Seq("id"),
        Seq("r" -> "v > 0", "r" -> "v < 5")))
  }

  test("kAnonymize: levels, class-size guarantee, null QI suppresses") {
    import graft.operators.Quality
    // detail (city, seg) / coarse (country, seg), k = 3
    val rows =
      (1 to 3).map(i => (i.toLong, Option("paris"), "FR", "A")) ++   // level 0
      Seq((4L, Option("lyon"), "FR", "A"),                           // -> FR/A
          (5L, Option("nice"), "FR", "A"),                           // -> FR/A
          (6L, Option("lille"), "FR", "A"),                          // -> FR/A
          (7L, Option("bonn"), "DE", "A"),                           // lone: *
          (8L, Option.empty[String], "FR", "A"))  // null detail: generalizes
    val out = Quality.kAnonymize(rows.toDF("id", "city", "country", "seg"),
        Seq("city", "seg"), Seq("country", "seg"), k = 3)
      .select("id", "anon_level", "qi_out")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    (1 to 3).foreach(i => assert(out(i.toLong) == ((0, "paris/A"))))
    Seq(4L, 5L, 6L, 8L).foreach(i => assert(out(i) == ((1, "FR/A"))))
    assert(out(7L) == ((2, "*")))
    // every non-* class has >= k members
    val classes = out.values.filter(_._2 != "*").groupBy(_._2).map(_._2.size)
    assert(classes.forall(_ >= 3))
  }

  test("kAnonymize is partition-count independent") {
    import graft.operators.Quality
    val df = graft.Tables.t(spark, sf0001, "customer")
      .select(col("c_custkey").as("id"),
        col("c_nationkey").cast("string").as("city"),
        (col("c_nationkey") % 5).cast("string").as("country"),
        col("c_mktsegment").as("seg"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.kAnonymize(d, Seq("city", "seg"), Seq("country", "seg"), k = 8)
        .select("id", "anon_level", "qi_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(run(df) == run(df.repartition(11)))
  }

  test("scd2 + as-of lookup resolves the version valid at fact time") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    // purchases at 02:00 (v1) and 10:00 (v2) for user 7; none for 9
    val dimSrc = Seq((100L, 7L, ts(2)), (101L, 7L, ts(10)))
      .toDF("event_id", "user_id", "ts")
    val dim = Changelog.scd2(dimSrc, Seq("user_id"), "ts",
        Seq(col("event_id").asc))
      .select(col("user_id").as("dim_user"), col("version"),
        col("event_id").as("purchase_id"), col("valid_from"))
    val facts = Seq(
      (1L, 7L, ts(1)),   // before v1 → no match
      (2L, 7L, ts(2)),   // exactly at v1's start → v1 (as-of includes =)
      (3L, 7L, ts(5)),   // inside v1's validity
      (4L, 7L, ts(23)),  // after v2 → v2 (current)
      (5L, 9L, ts(5))    // keyless user → no match
    ).toDF("click_id", "user_id", "ts")
    val out = graft.operators.AsOf.join(facts, dim, "user_id", "dim_user",
        "ts", "valid_from", Seq("version", "purchase_id"),
        tieBreak = "version")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(1), 3L -> Some(1),
      4L -> Some(2), 5L -> None))
  }

  test("bitemporalAsOf: pre-correction reads reproduce; corrections bind at tx time") {
    import java.sql.Timestamp
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val ledger = Seq(
      // k1: original assertion, a later CORRECTION of the same valid
      // period, and a newer version effective 2021 (asserted early)
      (1L, d("2020-01-01"), d("2020-01-01"), 100.0, 5L),
      (1L, d("2020-01-01"), d("2020-06-01"), 110.0, 5L),
      (1L, d("2021-01-01"), d("2020-01-01"), 200.0, 6L),
      // k2: only asserted late — invisible to earlier tx reads
      (2L, d("2020-01-01"), d("2020-09-01"), 50.0, 1L)
    ).toDF("key", "valid_from", "tx_from", "price", "qty")
    def snap(v: String, t: String) =
      Changelog.bitemporalAsOf(ledger, Seq("key"), "valid_from", "tx_from",
          lit(d(v)), lit(d(t)))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getLong(4))))
        .toMap
    // read before the correction was recorded: the original, forever
    assert(snap("2020-06-15", "2020-03-01") == Map(1L -> ((100.0, 5L))))
    // read after: the correction applies; k2 now visible
    assert(snap("2020-06-15", "2020-12-01") ==
      Map(1L -> ((110.0, 5L)), 2L -> ((50.0, 1L))))
    // a later valid time picks the 2021 version — the correction bound
    // only to the valid period it re-asserted
    assert(snap("2021-06-01", "2020-12-01") ==
      Map(1L -> ((200.0, 6L)), 2L -> ((50.0, 1L))))
    // valid time before every assertion: nothing was effective yet
    assert(snap("2019-06-01", "2020-12-01").isEmpty)
  }

  test("bitemporalAsOf is partition-count independent") {
    import java.sql.Timestamp
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val ledger = (1L to 60L).flatMap(k => Seq(
      (k, d("2020-01-01"), d("2020-01-01"), k * 1.0, k),
      (k, d("2020-01-01"), d("2020-05-01"), k * 2.0, k)
    )).toDF("key", "valid_from", "tx_from", "price", "qty")
    def run(df: org.apache.spark.sql.DataFrame) =
      Changelog.bitemporalAsOf(df, Seq("key"), "valid_from", "tx_from",
          lit(d("2020-06-01")), lit(d("2020-07-01")))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq
    assert(run(ledger) == run(ledger.repartition(13)))
    assert(run(ledger).forall { case (k, p) => p == k * 2.0 })
  }
}
