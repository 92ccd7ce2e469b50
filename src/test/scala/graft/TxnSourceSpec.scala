package graft

import graft.operators.Txn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Millis, Seconds, Span}

/** The `graft-txn` V1 streaming source: commit versions as offsets,
  * per-commit CDF micro-batches, Spark's OWN checkpoint as the
  * cursor. Recovery runs through the REAL offset log (a second
  * AvailableNow run on the same checkpointLocation), not a simulated
  * cursor. */
class TxnSourceSpec extends SparkSpec with Eventually {
  import spark.implicits._

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_txnsrc").toString

  private def drain(src: String, out: String, ckpt: String,
      maxCommits: Int = 1): Unit = {
    val q = spark.readStream.format("graft-txn").option("path", src)
      .option("maxCommitsPerTrigger", maxCommits.toString).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("kill-and-resume through Spark's offset log: spans never re-fed, never skipped") {
    val base = freshBase()
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Txn.commitOverwrite(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("k", "tag"))                  // v1
    Txn.commitAppend(spark, src, Seq((3L, "c")).toDF("k", "tag"))  // v2
    drain(src, out, ckpt)
    val first = spark.read.parquet(out)
    assert(first.where(col("_change_type") === "insert").count() == 3)
    assert(first.select(max("_commit_version")).head().getInt(0) == 2)
    // extend the history — including a REWRITE (compact emits its
    // self-cancelling delete+insert) and a row-level delete
    Txn.compact(spark, src, numFiles = 1)                          // v3
    Txn.commitDelete(spark, src, Seq(2L).toDF("k"), "k")           // v4
    drain(src, out, ckpt) // resumes at v2 from the offset log
    val second = spark.read.parquet(out)
    // v3: delete+insert of all 3 rows; v4 (copy-on-write delete on the
    // compacted single file): the removed FILE's rows feed as deletes,
    // the survivors reinsert — net effect removes exactly k=2
    assert(second.where(col("_commit_version") === 3).count() == 6)
    assert(second.where(col("_commit_version") === 4 &&
      col("_change_type") === "delete").select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 3L))
    assert(second.where(col("_commit_version") === 4 &&
      col("_change_type") === "insert").select("k").as[Long]
      .collect().toSet == Set(1L, 3L))
    // v1/v2 rows must appear EXACTLY once (no re-feed on resume)
    assert(second.where(col("_commit_version") <= 2).count() == 3)
    // caught up: a third run adds nothing
    drain(src, out, ckpt)
    assert(spark.read.parquet(out).count() == second.count())
    // multiset apply (insert - delete) reproduces the head snapshot
    val applied = second.where(col("_change_type") === "insert")
      .groupBy("k", "tag").count()
      .join(second.where(col("_change_type") === "delete")
        .groupBy("k", "tag").count()
        .withColumnRenamed("count", "d"), Seq("k", "tag"), "left")
      .where(col("count") - coalesce(col("d"), lit(0)) > 0)
      .select("k").as[Long].collect().toSet
    assert(applied == Txn.read(spark, src).select("k").as[Long]
      .collect().toSet)
  }

  test("maxCommitsPerTrigger pages a deep history; offsets advance monotonically") {
    val base = freshBase()
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Txn.commitOverwrite(spark, src, Seq((0L, "x")).toDF("k", "tag"))
    (1 to 6).foreach(i =>
      Txn.commitAppend(spark, src, Seq((i.toLong, "x")).toDF("k", "tag")))
    drain(src, out, ckpt, maxCommits = 3) // 7 commits → ≥3 batches
    val got = spark.read.parquet(out)
    assert(got.count() == 7)
    assert(got.select(countDistinct("_commit_version")).head()
      .getLong(0) == 7)
    // the offset log paged in ≤3-commit steps: 7 commits at
    // maxCommitsPerTrigger=3 need at least 3 micro-batches — one
    // offset-log entry each
    val batches = new java.io.File(s"$ckpt/offsets")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected >=3 micro-batches, saw $batches")
  }

  test("schema across restart: a RESTARTED stream re-resolves the evolved schema; old rows NULL-fill") {
    val base = freshBase()
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Txn.commitOverwrite(spark, src, Seq((1L, "a")).toDF("k", "tag"))
    drain(src, out, ckpt)
    // upstream evolves between runs: the next run (a restart — each
    // AvailableNow start is one) re-resolves the schema at attach,
    // exactly Delta's restart contract; WITHIN a run the projection
    // in getBatch pins every batch to the run's fixed schema
    Txn.commitAppend(spark, src,
      Seq((2L, "b", 9.5)).toDF("k", "tag", "score"), mergeSchema = true)
    drain(src, out, ckpt)
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.columns.toSet ==
      Set("k", "tag", "score", "_change_type", "_commit_version"),
      s"restart did not pick up the evolved schema: ${got.columns.mkString(",")}")
    assert(got.where(col("k") === 2 && col("score") === 9.5).count() == 1)
    assert(got.where(col("k") === 1).select("score").head().isNullAt(0),
      "pre-evolution row not NULL-filled")
  }

  test("ProcessingTime: a LIVE stream picks up commits landing after start") {
    val base = freshBase()
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Txn.commitOverwrite(spark, src, Seq((1L, "a")).toDF("k", "tag"))
    val q = spark.readStream.format("graft-txn").option("path", src)
      .load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(200)).start()
    def settled(n: Long): Unit =
      eventually(timeout(Span(20, Seconds)), interval(Span(200, Millis))) {
        assert(
          (try spark.read.parquet(out).count() catch {
            case _: org.apache.spark.sql.AnalysisException => 0L
          }) == n)
      }
    try {
      // v1 arrives
      settled(1)
      // commits landing AFTER start flow through (fixedHead stays
      // unset outside AvailableNow — the head is re-read per trigger)
      Txn.commitAppend(spark, src, Seq((2L, "b")).toDF("k", "tag"))
      Txn.commitAppend(spark, src, Seq((3L, "c")).toDF("k", "tag"))
      settled(3)
      assert(spark.read.parquet(out)
        .where(col("_change_type") === "insert")
        .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("native sink: Txn→Txn pipeline exactly-once across kill-and-resume") {
    val base = freshBase()
    val src = s"$base/src"; val dst = s"$base/dst"; val ckpt = s"$base/ckpt"
    Txn.commitOverwrite(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("k", "tag"))                  // v1
    Txn.commitAppend(spark, src, Seq((3L, "c")).toDF("k", "tag"))  // v2
    def pump(): Unit = {
      val q = spark.readStream.format("graft-txn").option("path", src)
        .option("maxCommitsPerTrigger", "1").load()
        .writeStream.format("graft-txn").option("path", dst)
        .option("txnAppId", "p").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    val d1 = Txn.read(spark, dst)
    assert(d1.where(col("_change_type") === "insert").count() == 3)
    val head1 = Txn.currentVersion(spark, dst)
    // redelivery simulation — a crash BETWEEN the table commit and the
    // sink's progress write re-runs addBatch with the same batch id;
    // the manifest's own tag set must short-circuit it
    assert(Txn.commitAppendIdempotent(spark, dst, d1.limit(1), "p-0")
      .isEmpty)
    assert(Txn.currentVersion(spark, dst) == head1)
    // extend the SOURCE table; resume through BOTH real logs (the
    // query checkpoint's offset log + the sink table's tag set)
    Txn.commitAppend(spark, src, Seq((4L, "d")).toDF("k", "tag"))  // v3
    pump()
    val d2 = Txn.read(spark, dst)
    assert(d2.where(col("_commit_version") <= 2).count() == 3,
      "resume re-fed an already-sunk span")
    assert(d2.where(col("_commit_version") === 3).select("k").as[Long]
      .collect().toSet == Set(4L))
    // caught up: a third run lands no rows
    pump()
    assert(Txn.read(spark, dst).count() == d2.count())
    // Append-only contract is loud
    val e = intercept[Exception] {
      spark.readStream.format("graft-txn").option("path", src).load()
        .groupBy(col("tag")).count()
        .writeStream.format("graft-txn").option("path", s"$base/agg")
        .option("txnAppId", "x")
        .option("checkpointLocation", s"$base/ckpt2")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(e.getMessage.contains("Append output mode only") ||
      e.getMessage.contains("Complete"), e.getMessage)
  }

  test("attaching to an empty root fails loudly") {
    val base = freshBase()
    val e = intercept[RuntimeException] {
      spark.readStream.format("graft-txn").option("path", s"$base/none")
        .load()
    }
    assert(e.getMessage.contains("no committed version"), e.getMessage)
  }
}
