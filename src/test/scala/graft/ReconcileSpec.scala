package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, Reconcile}

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("diff: added/removed/changed, null-safe compares, same rows dropped") {
    val a = Seq(
      (1L, Some("x"), 10.0), (2L, Some("y"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("z"), 40.0)
    ).toDF("k", "s", "v")
    val b = Seq(
      (1L, Some("x"), 10.0),               // unchanged → dropped
      (2L, Some("Y"), 21.0),               // both columns changed
      (3L, Some("w"), 30.0),               // NULL → value is a change
      (5L, Some("q"), 50.0)                // new key
    ).toDF("k", "s", "v")
    val out = Reconcile.diff(a, b, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out == Map(
      2L -> (("changed", "s,v")),
      3L -> (("changed", "s")),
      4L -> (("removed", "")),
      5L -> (("added", ""))))
  }

  test("diff: composite keys resolve from whichever side is present") {
    val a = Seq((1L, "p", 1.0)).toDF("k1", "k2", "v")
    val b = Seq((2L, "q", 2.0)).toDF("k1", "k2", "v")
    val out = Reconcile.diff(a, b, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1L, "p", "removed"), (2L, "q", "added")))
  }

  test("incremental merge equals a direct aggregate over the union") {
    val batch1 = Seq(("a", 1.0), ("a", 2.5), ("b", 10.0)).toDF("k", "v")
    val batch2 = Seq(("a", 4.0), ("b", -1.0), ("c", 7.0)).toDF("k", "v")
    val merged = IncrementalAgg.finish(
      IncrementalAgg.merge(Seq(
        IncrementalAgg.partials(batch1, Seq("k"), "v"),
        IncrementalAgg.partials(batch2, Seq("k"), "v")), Seq("k")),
      Seq("k"))
    val direct = IncrementalAgg.finish(
      IncrementalAgg.partials(batch1.unionByName(batch2), Seq("k"), "v"),
      Seq("k"))
    assert(merged.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
    val m = merged.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(m("a") == ((3L, 7.5, 1.0, 4.0, 2.5)))
    assert(m("b") == ((2L, 9.0, -1.0, 10.0, 4.5)))
  }

  test("incremental partials skip NULL values; merge folds many batches") {
    val b1 = Seq(("a", Some(1.0)), ("a", None)).toDF("k", "v")
    val b2 = Seq(("a", Some(3.0))).toDF("k", "v")
    val b3 = Seq(("a", Some(5.0))).toDF("k", "v")
    val out = IncrementalAgg.finish(
      IncrementalAgg.merge(
        Seq(b1, b2, b3).map(IncrementalAgg.partials(_, Seq("k"), "v")),
        Seq("k")),
      Seq("k")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 9.0 && r.getDouble(5) == 3.0)
  }

  test("sequenceGaps: bucketized missing runs, duplicates collapse, empty safe") {
    val df = Seq(0L, 1L, 2L, 5L, 6L, 9L, 9L, 1005L).toDF("id")
    val out = Reconcile.sequenceGaps(df, "id", bucketWidth = 1000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bucket 0 misses 3,4,7,8 and 10..999; bucket 1 misses 1000..1004
    assert(out == Map(
      0L -> ((994L, 3L, 999L)),
      1L -> ((5L, 1000L, 1004L))))
    assert(Reconcile.sequenceGaps(df.where(lit(false)), "id").count() == 0)
    // a complete sequence reports nothing
    assert(Reconcile.sequenceGaps(
      Seq(4L, 5L, 6L).toDF("id"), "id").count() == 0)
  }
}
