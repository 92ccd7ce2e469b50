package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology: a warm-up pass at sf0.001 first (JIT + codegen + parquet
  * footer caches), then one timed pass at the target SF. The timing
  * action is `queryExecution.toRdd.foreach` — materializes every output
  * row of the final plan without driver collection; `count()` would let
  * Catalyst prune the very work being measured (a projection-only query
  * optimizes to a row-count scan).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata files are small; cap split size so scans parallelize
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: DataFrame): Unit = df.queryExecution.toRdd.foreach(_ => ())

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up at the smallest SF: JIT, codegen cache, shuffle machinery
    ordered.foreach { case (_, fn) =>
      try run(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    // best-of-2: a single sample is hostage to one GC pause / page-cache
    // miss (observed: a 1.4s query spiking to 36s once); min-of-two is
    // the standard defense and reflects the engine, not the neighbor.
    // A query that throws records the -1 sentinel (and lands in
    // "errors") instead of folding a near-zero elapsed time into the
    // results as a phantom speedup.
    val results = ordered.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
