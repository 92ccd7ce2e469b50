package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.Envelope
import graft.pipeline.Xf
import graft.sinks.ParquetSink
import graft.sources.{DirectorySource, HttpBulkSource, JsonlSource}

class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("DirectorySource reads a recursive tree of text files") {
    val dir = Files.createTempDirectory("graft-dirsrc").toString
    Seq("a1", "a2").toDF("l").coalesce(1).write.text(s"$dir/sub1")
    Seq("b1").toDF("l").coalesce(1).write.text(s"$dir/sub2/deep")
    val out = DirectorySource(dir, "text").read(spark)
    assert(out.count() == 3)
    assert(out.select("file").distinct().count() == 2)
    intercept[IllegalArgumentException](
      DirectorySource(dir, "nope").read(spark))
  }

  test("DirectorySource jsonl format parses records per file") {
    val dir = Files.createTempDirectory("graft-dirjson").toString
    Seq("""{"a": 1}""", """{"a": 2}""").toDF("l")
      .coalesce(1).write.text(s"$dir/part1")
    val out = DirectorySource(dir, "jsonl").read(spark)
    assert(out.select(sum("a")).head().getLong(0) == 3L)
  }

  test("HttpBulkSource stub maps the listing to a distributed scan") {
    val dir = Files.createTempDirectory("graft-http").toString
    Seq("""{"x": 10}""").toDF("l").coalesce(1).write.text(s"$dir/batch1")
    val src = HttpBulkSource("https://api.example/export", "jsonl",
      fetch = _ => dir)
    assert(src.spec("type") == "http-bulk")
    assert(src.check(spark).valid)
    assert(src.discover(spark).fieldNames.contains("x"))
    assert(src.read(spark).select(sum("x")).head().getLong(0) == 10L)
  }

  test("ParquetSink partitionBy writes a partitioned layout") {
    val dir = Files.createTempDirectory("graft-psink").toString
    val n = ParquetSink(s"$dir/out", partitionBy = Seq("k"))
      .write(Seq((1, "a"), (2, "a"), (3, "b")).toDF("v", "k"))
    assert(n == 3L)
    val parts = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("k=")).map(_.getName).toSet
    assert(parts == Set("k=a", "k=b"))
    // partition pruning reads only one directory
    val pruned = spark.read.parquet(s"$dir/out").where(col("k") === "a")
    assert(pruned.count() == 2)
  }

  test("wrapLog / wrapError envelopes carry their type tag") {
    val df = Seq((5L, "boom")).toDF("ms", "what")
    val log = df.select(Envelope.wrapLog(col("ms"), "s", struct(col("what"))))
      .head().getString(0)
    val err = df.select(Envelope.wrapError(col("ms"), "s", struct(col("what"))))
      .head().getString(0)
    assert(log.contains("\"type\":\"log\"") && err.contains("\"type\":\"error\""))
    assert(log.contains("\"schema\":\"etlp_raw\""))
  }

  test("Xf.take returns the first n in the given order") {
    val out = Xf.take(2, col("id").desc)(spark.range(10).toDF("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(9L, 8L))
  }

  test("JsonlSource without schema infers and keeps the file column") {
    val dir = Files.createTempDirectory("graft-jsrc").toString
    Seq("""{"z": "q"}""").toDF("l").coalesce(1).write.text(s"$dir/f")
    val out = JsonlSource(s"$dir/f").read(spark)
    assert(out.columns.contains("file") && out.select("z").head().getString(0) == "q")
  }
}
