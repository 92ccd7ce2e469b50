package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.Envelope
import graft.pipeline.Xf
import graft.sinks.ParquetSink
import graft.sources.{DirectorySource, FsBulkTransport, HttpBulkSource, JsonlSource, OrcSource, StdinSource}

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

  test("HttpBulkSource drives start -> poll -> list -> distributed read") {
    val dir = Files.createTempDirectory("graft-http").toString
    Seq("""{"x": 10}""", """{"x": 5}""").toDF("l")
      .coalesce(1).write.text(s"$dir/staged")
    // flatten the staged files into the job dir like an export would
    val staged = new java.io.File(s"$dir/staged").listFiles()
      .filter(_.getName.endsWith(".txt"))
    staged.zipWithIndex.foreach { case (f, i) =>
      Files.move(f.toPath, java.nio.file.Paths.get(s"$dir/out_$i.jsonl"))
    }
    val transport = new FsBulkTransport(readyAfterPolls = 3)
    val src = HttpBulkSource("file://" + dir, "jsonl", transport,
      pollIntervalMs = 1, maxPolls = 10)
    assert(src.spec("type") == "http-bulk")
    assert(src.check(spark).valid) // first poll: 202 + progress
    val out = src.read(spark)
    // the 202 loop really ran: 1 check() + (3 - 1) more polls + final 200
    assert(transport.pollCount >= 4)
    assert(out.select(sum("x")).head().getLong(0) == 15L)
    assert(out.columns.contains("file"))
  }

  test("HttpBulkSource fails after maxPolls instead of hanging") {
    val transport = new FsBulkTransport(readyAfterPolls = 100)
    val src = HttpBulkSource("file:///nonexistent", "jsonl", transport,
      pollIntervalMs = 1, maxPolls = 3)
    val e = intercept[IllegalStateException](src.awaitListing())
    assert(e.getMessage.contains("not ready after 3 polls"))
  }

  test("StdinSource reads lines from Console.in on the driver") {
    val in = new java.io.ByteArrayInputStream("a\nb\nc\n".getBytes)
    val out = Console.withIn(in)(StdinSource(maxLines = 2).read(spark))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(out.schema.fieldNames.toSeq == Seq("line", "file"))
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

  test("OrcSource round-trips values and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
      .toDF("id", "k", "v").write.orc(s"$dir/t")
    val src = OrcSource(s"$dir/t")
    assert(src.check(spark).valid && src.spec("type") == "orc")
    assert(!OrcSource(s"$dir/missing").check(spark).valid)
    val out = src.read(spark).where(col("k") === "a")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // predicate reaches the ORC scan (vectorized reader w/ pushdown)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,a)"))
  }

  test("JdbcSource: sink → source round-trip; pushdown reaches the remote WHERE; partitioned read") {
    import graft.sinks.JdbcSink
    import graft.sources.JdbcSource
    import org.apache.spark.sql.SaveMode
    val url = "jdbc:derby:memory:graftsrc;create=true"
    val df = spark.range(100).toDF("id").withColumn("v", col("id") * 2)
    assert(JdbcSink(url, "GRAFT_RT", mode = SaveMode.Overwrite).write(df) == 100L)
    val src = JdbcSource(url, "GRAFT_RT")
    assert(src.check(spark).valid)
    assert(!JdbcSource("http://not-jdbc", "t").check(spark).valid)
    assert(!JdbcSource(url, "").check(spark).valid)
    assert(src.discover(spark).fieldNames.map(_.toLowerCase).toSet ==
      Set("id", "v"))
    // round-trip agg through a filter + projection
    val filtered = src.read(spark).where(col("v") > 100).select("id")
    assert(filtered.agg(sum("id")).head().getLong(0) == (51L to 99L).sum)
    // the predicate compiled into the remote scan, not a post-fetch
    // Spark filter: the JDBC scan node reports it as pushed
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter not pushed to the JDBC scan:\n$plan")
    // partitioned read: 4 parallel range-predicate slices, no row lost
    // or doubled by the split
    val part = JdbcSource(url, "GRAFT_RT", partitionColumn = Some("id"),
      lowerBound = Some(0L), upperBound = Some(100L), numPartitions = 4)
      .read(spark)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100L)
    assert(part.agg(countDistinct(col("id"))).head().getLong(0) == 100L)
  }

  test("JsonlSource without schema infers and keeps the file column") {
    val dir = Files.createTempDirectory("graft-jsrc").toString
    Seq("""{"z": "q"}""").toDF("l").coalesce(1).write.text(s"$dir/f")
    val out = JsonlSource(s"$dir/f").read(spark)
    assert(out.columns.contains("file") && out.select("z").head().getString(0) == "q")
  }

  test("gzip-compressed JSONL round-trips through the same sources") {
    // Hadoop codecs decompress by extension — a .json.gz drop needs no
    // config on the read side. (Gzip is NOT splittable: one file = one
    // task, so a compressed lake should arrive as many medium files,
    // never one giant archive — that's the write side's coalesce knob.)
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-gz").toString
    val src = Tables.events(spark, sf0001).select("event_id", "event_type")
    src.write.option("compression", "gzip").json(s"$dir/gz")
    assert(new java.io.File(s"$dir/gz").listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    val back = JsonlSource(s"$dir/gz", Some(src.schema)).read(spark)
    assert(back.count() == src.count())
    val a = back.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = src.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("ObjectStoreSource: bucket/prefix addressing over a file:// stand-in") {
    import graft.sources.ObjectStoreSource
    val dir = Files.createTempDirectory("graft-objstore").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "k")
      .write.parquet(s"$dir/lake/raw/t1")
    // the reference README's create-s3-source! shape: bucket + prefix +
    // per-source reader options; file:// exercises the identical
    // FileSystem code path in a zero-egress environment
    val src = ObjectStoreSource(bucket = dir.stripPrefix("/"),
      prefix = "lake/raw/t1", scheme = "file")
    assert(src.spec("type") == "object-store" && src.spec("bucket").nonEmpty)
    assert(src.check(spark).valid)
    assert(!ObjectStoreSource(dir.stripPrefix("/"), "lake/raw/missing",
      scheme = "file").check(spark).valid)
    assert(src.discover(spark).fieldNames.toSeq == Seq("id", "k"))
    assert(src.read(spark).count() == 2)
    // s3a path assembly (unexecutable here, but the URI must be right)
    assert(ObjectStoreSource("bkt", "pre/fix").path == "s3a://bkt/pre/fix")
    // reader options pass through (mergeSchema reconciles two drops)
    Seq((3L, "z", 9.9)).toDF("id", "k", "w")
      .write.parquet(s"$dir/lake/raw/t1_v2")
    val merged = ObjectStoreSource(dir.stripPrefix("/"), "lake/raw/*",
      scheme = "file", options = Map("mergeSchema" -> "true",
        "recursiveFileLookup" -> "true")).read(spark)
    assert(merged.columns.contains("w") && merged.count() == 3)
  }

  test("CsvSource malformed-row policies: permissive routes, drop drops, failfast throws") {
    import graft.sources.CsvSource
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = Files.createTempDirectory("graft-csvbad").toString
    Seq("id,name,score", "1,alice,10", "2,bob,notanumber", "3,carol,30")
      .toDF("l").coalesce(1).write.text(s"$dir/raw")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", LongType)))
    // PERMISSIVE + corrupt column: bad row surfaces with the raw line —
    // the error-channel split (clean vs dead-letter) is two filters
    val src = CsvSource(s"$dir/raw", header = true, schema = Some(schema),
      corruptColumn = Some("_corrupt_record"))
    assert(src.spec("mode") == "PERMISSIVE")
    val all = src.read(spark).cache()
    val bad = all.where(col("_corrupt_record").isNotNull)
    val good = all.where(col("_corrupt_record").isNull)
    assert(bad.count() == 1 &&
      bad.head().getAs[String]("_corrupt_record").contains("notanumber"))
    assert(good.count() == 2 &&
      good.select(sum("score")).head().getLong(0) == 40L)
    all.unpersist()
    // DROPMALFORMED: the bad row silently disappears. collect(), not
    // count() — a zero-column count never parses values, so malformed
    // rows aren't detected and the count includes them (documented CSV
    // behavior under column pruning)
    val dropped = CsvSource(s"$dir/raw", header = true,
      schema = Some(schema), mode = "DROPMALFORMED").read(spark)
    assert(dropped.collect().length == 2)
    // FAILFAST: the scan aborts on the bad row
    val ff = CsvSource(s"$dir/raw", header = true, schema = Some(schema),
      mode = "FAILFAST").read(spark)
    intercept[org.apache.spark.SparkException](ff.collect())
    // guard rails
    intercept[IllegalArgumentException](
      CsvSource(s"$dir/raw", mode = "WHATEVER"))
    intercept[IllegalArgumentException](
      CsvSource(s"$dir/raw", corruptColumn = Some("_c")))
  }

  test("PartitionOverwriteSink rewrites only the partitions in the batch") {
    import graft.sinks.PartitionOverwriteSink
    val dir = Files.createTempDirectory("graft-popw").toString
    val day1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0))
      .toDF("day", "id", "v")
    ParquetSink(s"$dir/t", partitionBy = Seq("day")).write(day1)
    val before = new java.io.File(s"$dir/t/day=2024-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // recompute ONLY day 2: its partition is replaced, day 1's files
    // must survive byte-identically (same part files on disk)
    val patch = Seq(("2024-01-02", 2L, 99.0), ("2024-01-02", 3L, 33.0))
      .toDF("day", "id", "v")
    val modeBefore =
      spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    val n = PartitionOverwriteSink(s"$dir/t", Seq("day")).write(patch)
    assert(n == 2)
    val after = new java.io.File(s"$dir/t/day=2024-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(after == before, "untouched partition was rewritten")
    val back = spark.read.parquet(s"$dir/t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(back == Set((1L, 10.0), (2L, 99.0), (3L, 33.0)))
    // the conf flip is scoped to the write: session value restored
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      == modeBefore)
    intercept[IllegalArgumentException](
      PartitionOverwriteSink(s"$dir/t", Nil))
  }

  test("compaction: 40 fragments collapse to size-targeted files, content intact") {
    import graft.operators.Compaction
    val in = "/tmp/graft_test/compact_in"
    val out = "/tmp/graft_test/compact_out"
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    src.repartition(40).write.mode("overwrite").parquet(in)
    val (nIn, bytesIn) = Compaction.dirStats(spark, in)
    assert(nIn == 40)
    val back = Compaction.compact(spark, in, out, targetFileBytes = bytesIn)
    val (nOut, _) = Compaction.dirStats(spark, out)
    assert(nOut == 1, s"expected 1 compacted file, got $nOut")
    // content preserved exactly
    assert(back.count() == src.count())
    assert(back.agg(org.apache.spark.sql.functions.sum("o_orderkey")).head.getLong(0) ==
      src.agg(org.apache.spark.sql.functions.sum("o_orderkey")).head.getLong(0))
    // a half-size target produces two files
    Compaction.compact(spark, in, out, targetFileBytes = bytesIn / 2 + 1)
    assert(Compaction.dirStats(spark, out)._1 == 2)
  }

  test("FixedWidthSource parses padded columns; blanks become NULL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fw").toString
    Seq(
      "       123ABC       45.60",
      "        77XY           ._", // malformed decimal → CAST null
      "          Z              " // blank key and price → NULLs
    ).toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val src = graft.sources.FixedWidthSource(dir, Seq(
      ("k", 1, 10, "BIGINT"), ("tag", 11, 3, "STRING"),
      ("price", 14, 12, "DECIMAL(18,2)")))
    assert(src.check(spark).valid)
    assert(src.spec("layout") == "k:1:10:BIGINT,tag:11:3:STRING,price:14:12:DECIMAL(18,2)")
    val rows = src.read(spark).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)).map(_.toString))).toSet
    assert(rows == Set(
      (Some(123L), Some("ABC"), Some("45.60")),
      (Some(77L), Some("XY"), None),
      (None, Some("Z"), None)))
    // layout validation fails loudly
    intercept[IllegalArgumentException](
      graft.sources.FixedWidthSource(dir, Nil))
    intercept[IllegalArgumentException](
      graft.sources.FixedWidthSource(dir, Seq(("a", 0, 3, "STRING"))))
  }

  test("XML round-trip: rowTag elements, NULL fields, explicit schema read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val src = Seq((1L, Some("alpha"), 1.5), (2L, None, -0.25))
      .toDF("k", "tag", "v")
    assert(graft.sources.XmlSink(dir, rowTag = "rec").write(src) == 2L)
    // inferred-schema read reproduces values (NULL field = absent elem)
    val back = graft.sources.XmlSource(dir, rowTag = "rec").read(spark)
      .collect().map(r => (r.getLong(r.fieldIndex("k")),
        Option(r.get(r.fieldIndex("tag"))).map(_.toString),
        r.getDouble(r.fieldIndex("v")))).toSet
    assert(back == Set((1L, Some("alpha"), 1.5), (2L, None, -0.25)))
    // the production path: explicit schema, no inference pass
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, tag STRING, v DOUBLE")
    val typed = graft.sources.XmlSource(dir, "rec", Some(schema)).read(spark)
    assert(typed.schema == schema)
    assert(typed.count() == 2L)
  }
}
