package graft

import org.apache.spark.sql.functions._
import graft.operators.Keys

class KeysSpec extends SparkSpec {
  import spark.implicits._

  test("surrogate: dense 1..n, duplicate and NULL naturals collapse") {
    val df = Seq("b", "a", "c", "a", null, "b").map(Tuple1(_)).toDF("nk")
    val out = Keys.surrogate(df, "nk").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.map(_._1).toSet == Set("a", "b", "c"))
    assert(out.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("surrogate: pure function of the key set — partitioning-proof") {
    val keys = (1 to 500).map(i => s"nat_$i")
    val a = Keys.surrogate(keys.map(Tuple1(_)).toDF("nk").repartition(1), "nk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Keys.surrogate(
      scala.util.Random.shuffle(keys).map(Tuple1(_)).toDF("nk").repartition(13),
      "nk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (1L to 500L))
  }

  test("surrogate: offset shifts the dense range") {
    val out = Keys.surrogate(Seq("x", "y").map(Tuple1(_)).toDF("nk"), "nk",
      offset = 100L)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(out == Seq(101L, 102L))
  }

  test("assignNew: existing keys survive, new keys dense above the max") {
    val existing = Keys.surrogate(
      Seq("a", "b", "c").map(Tuple1(_)).toDF("nk"), "nk")
    val exMap = existing.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val incoming = Seq("b", "c", "d", "e", "d").map(Tuple1(_)).toDF("nk")
    val out = Keys.assignNew(existing, incoming, "nk").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 5)
    exMap.foreach { case (k, v) => assert(out(k) == v) }   // never renumbered
    assert(Set(out("d"), out("e")) == Set(4L, 5L))         // dense above max
    assert(out.values.toSeq.distinct.size == 5)            // no collisions
  }

  test("assignNew: empty existing degrades to plain surrogate") {
    val empty = Seq.empty[(String, Long)].toDF("nk", "sk")
    val out = Keys.assignNew(empty, Seq("p", "q").map(Tuple1(_)).toDF("nk"), "nk")
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(out == Seq(1L, 2L))
  }

  test("dateDim: contiguous day spine over the observed range, portable attrs") {
    import java.sql.Timestamp
    val df = Seq("2024-02-27", "2024-03-02")
      .map(s => Tuple1(Timestamp.valueOf(s + " 10:00:00"))).toDF("ts")
    val out = Keys.dateDim(df, "ts").collect()
      .map(r => (r.getDate(0).toString, r.getInt(5), r.getBoolean(6),
        r.getBoolean(7))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("2024-02-27", "2024-02-28",
      "2024-02-29", "2024-03-01", "2024-03-02")) // leap day present
    val m = out.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(m("2024-02-27") == ((2, false, false))) // Tuesday, ISO dow 2
    assert(m("2024-02-29") == ((4, false, true)))  // leap-year month end
    assert(m("2024-03-02") == ((6, true, false)))  // Saturday
    // empty facts → empty spine, not a null-date explosion
    assert(Keys.dateDim(df.where(lit(false)), "ts").count() == 0)
  }

  test("pseudonymize: referential integrity, NULL passthrough, salt dial") {
    import spark.implicits._
    val a = Seq((Some(7L), "x"), (Some(8L), "y"), (None, "z"))
      .toDF("k", "payload")
    val b = Seq(Tuple1(Some(7L)), Tuple1(Some(9L))).toDF("k")
    val pa = Keys.pseudonymize(a, Seq("k"), "s1")
    val pb = Keys.pseudonymize(b, Seq("k"), "s1")
    // same value → same pseudonym across frames: the join still works
    val joined = pa.join(pb, Seq("k")).collect()
    assert(joined.length == 1 && joined.head.getString(1) == "x")
    // pseudonyms are md5 hex, raw keys are gone
    val pids = pa.where(col("k").isNotNull).collect().map(_.getString(0))
    assert(pids.forall(_.matches("[0-9a-f]{32}")))
    assert(pids.distinct.length == 2)
    // NULL identifier stays NULL (no collision with any real value)
    assert(pa.where(col("k").isNull).count() == 1)
    // a new salt breaks linkage to the previous release
    val pa2 = Keys.pseudonymize(a, Seq("k"), "s2")
      .where(col("k").isNotNull).collect().map(_.getString(0)).toSet
    assert(pa2.intersect(pids.toSet).isEmpty)
  }

  test("dpCounts: reproducible release, true count absent, salt varies noise") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    def run(salt: String) = graft.operators.Quality
      .dpCounts(df, "grp", epsilon = 1.0, salt = salt)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r1 = run("a"); val r2 = run("a"); val r3 = run("b")
    assert(r1 == r2, "same salt must reproduce the release exactly")
    assert(r1 != r3, "a new salt must redraw the noise")
    assert(r1.keySet == Set("g0", "g1", "g2"))
    // Laplace(1) noise: released counts are near but not equal to true
    val truth = Map("g0" -> 33.0, "g1" -> 34.0, "g2" -> 33.0)
    r1.foreach { case (k, v) => assert(math.abs(v - truth(k)) < 40.0) }
    val cols = graft.operators.Quality
      .dpCounts(df, "grp", 1.0, "a").columns.toSeq
    assert(cols == Seq("grp", "dp_n"), "true count must not be released")
    intercept[IllegalArgumentException](
      graft.operators.Quality.dpCounts(df, "grp", 0.0, "a"))
  }
}
