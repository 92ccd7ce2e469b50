package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import graft.plans.{TopKPerKey, TopKPerKeyStrategy}

/** User API for the bounded top-k-per-key operator (graft.plans).
  *
  * `TopK.perKey(df, Seq("k"), Seq("x" -> Desc, "id" -> Asc), 5)` keeps,
  * for every distinct key, the 5 rows ranking first by the order spec —
  * the rows `row_number() OVER (PARTITION BY k ORDER BY ...) <= 5`
  * keeps, but executed with O(k) heaps instead of a full partition sort
  * (see TopKPerKey scaladoc for why that matters at scale). Include a
  * unique tiebreak column last for byte-stable output.
  */
object TopK {
  sealed trait Dir
  case object Asc extends Dir
  case object Desc extends Dir

  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Dir)],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in ${plan.output.map(_.name).mkString(",")}"))
    val keyExprs = keys.map(attr)
    val order = orderBy.map { case (name, dir) =>
      SortOrder(attr(name), if (dir == Asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark, TopKPerKey(keyExprs, order, k, plan))
  }
}
