package graft

import graft.operators.Txn
import graft.streaming.TxnTail
import org.apache.spark.sql.functions._

class TxnTailSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_tail").toString
    (s"$base/src", s"$base/sink")
  }

  /** (change, version, k) multiset of a frame carrying CDF columns. */
  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("_change_type"), col("_commit_version"), col("k"))
      .count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap

  private def history(src: String): Unit = {
    Txn.commitOverwrite(spark, src,
      spark.range(100).select(col("id").as("k"), (col("id") % 7).as("v"))
        .repartition(4), statsCol = Some("k"))                       // v1
    Txn.commitAppend(spark, src,
      spark.range(100, 120).select(col("id").as("k"), lit(9L).as("v")),
      statsCol = Some("k"))                                          // v2
    Txn.compact(spark, src, numFiles = 2, statsCol = Some("k"))     // v3
    Txn.commitDelete(spark, src,
      spark.range(10, 20).select(col("id").as("k")), "k",
      statsCol = Some("k"))                                          // v4
  }

  test("tail accumulates exactly the CDF across a rewrite-bearing history") {
    val (src, sink) = fresh()
    history(src)
    assert(TxnTail.drain(spark, src, sink) == 4)
    assert(TxnTail.cursor(spark, sink) == 4)
    assert(multiset(Txn.read(spark, sink)) ==
      multiset(Txn.readChangesCdf(spark, src, 0)),
      "tailed accumulation diverged from the direct change feed")
    // caught up: zero batches, cursor unchanged, sink head unchanged
    val head = Txn.currentVersion(spark, sink)
    assert(TxnTail.drain(spark, src, sink) == 0)
    assert(Txn.currentVersion(spark, sink) == head)
  }

  test("kill between batches: resume loses nothing, duplicates nothing") {
    val (src, sink) = fresh()
    history(src)
    // the "process" dies after landing two batches: the transform
    // throws on its third call — exactly a crash between micro-batches
    var calls = 0
    val boom = new RuntimeException("killed between batches")
    intercept[RuntimeException] {
      TxnTail.drain(spark, src, sink, transform = { df =>
        calls += 1
        if (calls == 3) throw boom
        df
      })
    }
    assert(TxnTail.cursor(spark, sink) == 2,
      "cursor must reflect only COMMITTED batches")
    // resume with a fresh drain: picks up at the committed cursor
    assert(TxnTail.drain(spark, src, sink) == 2)
    assert(multiset(Txn.read(spark, sink)) ==
      multiset(Txn.readChangesCdf(spark, src, 0)),
      "recovery lost or duplicated a batch")
    assert(TxnTail.drain(spark, src, sink) == 0)
  }

  test("commitsPerBatch > 1 spans commits; quiet spans still advance the cursor") {
    val (src, sink) = fresh()
    history(src)
    assert(TxnTail.drain(spark, src, sink, commitsPerBatch = 3) == 2)
    assert(multiset(Txn.read(spark, sink)) ==
      multiset(Txn.readChangesCdf(spark, src, 0)))
    // a no-op commit (delete matching nothing) still gets consumed —
    // an empty tagged batch, so the cursor never stalls on quiet spans
    Txn.commitDelete(spark, src,
      Seq(99999L).toDF("k"), "k", statsCol = Some("k"))              // v5
    assert(TxnTail.drain(spark, src, sink) == 1)
    assert(TxnTail.cursor(spark, sink) == 5)
    assert(TxnTail.drain(spark, src, sink) == 0)
  }
}
