package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Xf

class XfSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a b", 10), (2, "c", -5), (3, "d e f", 7))
    .toDF("id", "words", "v")

  test("map projects computed columns") {
    val out = Xf.map(col("id"), (col("v") * 2).as("v2"))(df).collect()
    assert(out.map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 20), (2, -10), (3, 14)))
  }

  test("filter keeps matching rows") {
    assert(Xf.filter(col("v") > 0)(df).count() == 2)
  }

  test("sampleHash is deterministic and roughly proportional") {
    val ids = spark.range(10000).toDF("id")
    val once = Xf.sampleHash(col("id"), 10)(ids).collect().map(_.getLong(0)).toSet
    val twice = Xf.sampleHash(col("id"), 10)(ids).collect().map(_.getLong(0)).toSet
    assert(once == twice) // pure function of the key, not rand()
    assert(once.size > 500 && once.size < 1500) // ~10% of 10k
    assert(Xf.sampleHash(col("id"), 0)(ids).count() == 0)
    assert(Xf.sampleHash(col("id"), 100)(ids).count() == 10000)
    intercept[IllegalArgumentException](Xf.sampleHash(col("id"), 101))
  }

  test("mapcat explodes one row to many") {
    val out = Xf.mapcat(split(col("words"), " "), "w", col("id"))(df)
    assert(out.count() == 6)
    assert(out.where(col("id") === 3).count() == 3)
  }

  test("keep maps and drops nulls") {
    val out = Xf.keep(when(col("v") > 0, col("v")), "pos", col("id"))(df)
    assert(out.collect().map(_.getInt(1)).sorted.toSeq == Seq(7, 10))
  }

  test("partitionAll assigns deterministic batch ids") {
    val out = Xf.partitionAll(col("id"), 2)(df).collect()
    assert(out.map(r => (r.getInt(0), r.getLong(3))).toSet ==
      Set((1, 0L), (2, 1L), (3, 1L)))
  }

  test("dedupe distincts") {
    val d2 = df.select((col("v") > 0).as("pos"))
    assert(Xf.dedupe()(d2).count() == 2)
  }

  test("comp fuses into one chain, applied left-to-right") {
    val piped = Xf.comp(
      Xf.filter(col("v") > 0),
      Xf.mapcat(split(col("words"), " "), "w", col("id")),
      Xf.map(col("w")))
    assert(piped(df).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b", "d", "e", "f"))
  }

  test("composed narrow chain stays a single codegen stage (fusion)") {
    val base = spark.range(1000).toDF("id")
      .withColumn("v", col("id") % 17)
    val plan = Xf.comp(
      Xf.filter(col("v") > 0),
      Xf.map(col("id"), (col("v") + 1).as("v1")),
      Xf.filter(col("v1") > 8)
    )(base).queryExecution.executedPlan.toString
    // transducer-fusion analogue: one codegen stage ("*(1)") and no second
    assert(plan.contains("*(1)") && !plan.contains("*(2)"), plan)
  }
}
