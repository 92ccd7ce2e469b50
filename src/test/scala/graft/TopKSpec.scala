package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 9.0)
  ).toDF("k", "id", "v")

  test("perKey returns exactly the row_number-window rows") {
    val custom = TopK.perKey(df, Seq("k"),
      Seq("v" -> TopK.Desc, "id" -> TopK.Asc), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val windowed = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom == windowed)
    // ties on v=30.0 resolved by id: rows 2 and 4 for key a... k=2 keeps 2,4
    assert(custom == Set(("a", 2L), ("a", 4L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("plan uses TopKPerKeyExec, not WindowExec") {
    val plan = TopK.perKey(df, Seq("k"), Seq("v" -> TopK.Asc), 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("planner inserts the key-clustering exchange") {
    val plan = TopK.perKey(df, Seq("k"), Seq("v" -> TopK.Asc), 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(k"), plan)
  }

  test("matches window semantics on real data (sf0.001 orders)") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = TopK.perKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> TopK.Desc, "o_orderkey" -> TopK.Asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == windowed && custom.nonEmpty)
  }

  test("rejects unknown columns eagerly") {
    intercept[IllegalArgumentException](
      TopK.perKey(df, Seq("nope"), Seq("v" -> TopK.Asc), 1))
  }
}
