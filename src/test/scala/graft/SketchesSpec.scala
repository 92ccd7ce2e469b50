package graft

import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.plans.GraftFunctions

/** Native sketch expressions must reproduce the HOF reference forms
  * byte-for-byte — that equality is what keeps the DuckDB oracle valid. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def toks = Seq(
    Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"),
    Seq("a", "b", "c"),
    Seq("solo", "pair", "trio", "quad")
  ).toDF("w")

  test("native minhash equals the HOF md5 formulation exactly") {
    val both = toks
      .select(Hashes.shingles("w", 3).as("sh"))
      .select(Hashes.minhashSignature("sh", 16).as("hof"),
        GraftFunctions.minhashSig(spark, col("sh"), 16).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("native simhash equals the HOF xxhash64 formulation exactly") {
    val both = toks
      .select(Hashes.simhash("w").as("hof"),
        GraftFunctions.simhash64(spark, col("w")).as("native"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native lsh bucket equals the HOF LCG formulation exactly") {
    val vecs = Seq(
      Seq(1.0, 0.0, 0.5, -0.25), Seq(-0.3, 0.7, 0.1, 0.9)
    ).toDF("x")
    val both = vecs.select(
      graft.operators.Ann.lshBucket("x").as("hof"),
      GraftFunctions.lshBucket(spark, col("x")).as("native")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native sketches stay inside the codegen stage") {
    val arrs = spark.range(50)
      .selectExpr("array(cast(id as string), 'x', 'y', 'z') AS w")
    val plan = arrs.select(
      GraftFunctions.minhashSig(spark, col("w"), 4).as("sig"),
      GraftFunctions.simhash64(spark, col("w")).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_minhash_sig") && plan.contains("graft_simhash64"), plan)
    assert(plan.contains("*(1)"), plan)
  }
}
