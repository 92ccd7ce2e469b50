package graft

import org.apache.spark.sql.functions._

// scratch profiling main — not committed
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = BenchSession.build()
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(d + "/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame): Long = df.queryExecution.toRdd.count()
    for (cap <- Seq(30L, 50L, 80L)) {
      val t0 = System.nanoTime
      val r = graft.operators.Dedup.ngramContainmentPairsPrefix(
        docs, "doc_id", "text", "lang", n = 2, minContainment = 0.8,
        maxDf = Some(cap))
      val n = run(r)
      println(s"CAP $cap rows=$n time=${(System.nanoTime-t0)/1e9}")
    }
    val t0 = System.nanoTime
    val p = graft.operators.Dedup.ngramContainmentPairs(
      docs, "doc_id", "text", "lang", n = 2, minContainment = 0.8)
    println(s"PLAIN rows=${run(p)} time=${(System.nanoTime-t0)/1e9}")
    spark.stop()
  }
}
