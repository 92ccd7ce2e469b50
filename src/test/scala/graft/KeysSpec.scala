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
}
