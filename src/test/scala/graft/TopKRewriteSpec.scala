package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerKeyStrategy, TopKRewriteRule}

class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    // runtime analogues of GraftExtensions' injections
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
    ("b", 4L, 5.0), ("b", 5L, 1.0)
  ).toDF("k", "id", "v")

  private def windowIdiom(base: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    base.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("k", "id", "v") // rank dropped → rewrite eligible
  }

  test("window idiom with dropped rank is rewritten to TopKPerKey") {
    val q = windowIdiom(df, 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    // neither a WindowExec ("Window [") nor a stacked WindowGroupLimit
    assert(!plan.contains("Window ["), plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L)))
  }

  test("no rewrite when the rank column is kept") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val q = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .select("k", "id", "rn") // rank survives → must stay a Window
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
  }

  test("no rewrite for rank/dense_rank or compound filters") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val q1 = df.withColumn("rn", rank().over(w))
      .where(col("rn") <= 2).select("k", "id")
    assert(!q1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val q2 = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2 && col("v") > 0).select("k", "id")
    assert(!q2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("rewritten plan matches the un-rewritten result on real data") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val rewritten = windowIdiom(
      orders.withColumnRenamed("o_custkey", "k")
        .withColumnRenamed("o_orderkey", "id")
        .withColumnRenamed("o_totalprice", "v"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // compute without the rule by keeping rank in the output
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val plain = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).select("o_custkey", "o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten == plain && rewritten.nonEmpty)
  }
}
