package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Txn

/** Exactly-once streaming CONSUMER over a [[graft.operators.Txn]]
  * table — the half the exactly-once producer (stream_txn_publish's
  * idempotent tagged publish) leaves open: a downstream job that wants
  * the table's CHANGES, continuously, with a crash-safe cursor and no
  * duplicates, instead of hand-managing a (since, until] poll over
  * [[Txn.readChanges]].
  *
  * Shape: an AvailableNow tail (Delta's streaming-source-with-CDF
  * consumer pattern). Each [[drain]] discovers the source head, splits
  * the unprocessed version span into micro-batches of `commitsPerBatch`
  * commits, reads each span's change feed ([[Txn.readChangesCdf]] —
  * rewrite-safe: a compaction emits its self-cancelling delete+insert
  * instead of silently re-feeding rows the consumer already saw),
  * applies `transform`, and commits the result to the SINK Txn table
  * via [[Txn.commitAppendIdempotent]] tagged with the span's end
  * version.
  *
  * The CURSOR is persisted through the Txn layer itself, not a side
  * file: [[cursor]] reads the sink head's committed tag set and takes
  * the highest `tail@<v>` tag. A crash between batches → the next
  * drain recomputes the cursor from what actually COMMITTED (no loss:
  * the cursor advances only with a landed batch), and a replayed span
  * short-circuits on its tag BEFORE staging (no dup) — the
  * txnAppId/txnVersion discipline Delta's streaming sink uses, here
  * closing both ends of the pipe. The sink's own history is the
  * checkpoint: there is nothing separate to drift or lose.
  *
  * Contract notes: the CDF frame's schema must stay stable across
  * batches (commitAppendIdempotent's strict schema gate — an upstream
  * schema evolution surfaces as a loud commit-time error, never
  * half-NULL rows); batch spans are formed from the committed cursor,
  * so re-forming them after a crash is deterministic; a span of
  * no-change commits still lands (an empty tagged batch), so the
  * cursor never stalls on quiet history.
  *
  * Scale: each batch reads only the files its commit span touched
  * (CDF is manifest-delta-bounded, never a table rescan) and the sink
  * commit is one staged batch + an O(touched) delta manifest — tailing
  * a 100 TB table costs the churn, not the table.
  *
  * Reference basis: the reference's connectors poll sources and push
  * batches downstream (protocols.clj read/write verbs); this is that
  * consumer loop with lakehouse exactly-once semantics. */
object TxnTail {
  private def tagFor(until: Int) = s"tail@$until"
  private val TagRe = "tail@(\\d+)".r

  /** Resume cursor: the highest SOURCE version a previous drain
    * committed into `sinkRoot` (0 = nothing consumed yet). Derived
    * from the sink's committed idempotence tags — the cursor IS the
    * commit history, so it cannot drift from it. */
  def cursor(spark: SparkSession, sinkRoot: String): Int = {
    val head = Txn.currentVersion(spark, sinkRoot)
    if (head == 0) 0
    else Txn.committedTags(spark, sinkRoot, head).collect {
      case TagRe(v) => v.toInt
    }.foldLeft(0)(math.max)
  }

  /** Drain every source commit in (cursor, head] into `sinkRoot` in
    * micro-batches, exactly once; returns the batches COMMITTED by
    * THIS call (0 = caught up — the AvailableNow contract; a replayed
    * span that short-circuits on its tag is not counted). `transform`
    * maps each span's CDF frame (`_change_type`/`_commit_version`
    * included) to the rows to append downstream. */
  def drain(spark: SparkSession, sourceRoot: String, sinkRoot: String,
      commitsPerBatch: Int = 1,
      transform: DataFrame => DataFrame = identity): Int = {
    require(commitsPerBatch >= 1,
      s"commitsPerBatch must be >= 1: $commitsPerBatch")
    val head = Txn.currentVersion(spark, sourceRoot)
    var since = cursor(spark, sinkRoot)
    var landed = 0
    while (since < head) {
      val until = math.min(since + commitsPerBatch, head)
      val batch = transform(
        Txn.readChangesCdf(spark, sourceRoot, since, Some(until)))
      if (Txn.commitAppendIdempotent(spark, sinkRoot, batch,
          tagFor(until)).nonEmpty) landed += 1
      since = until
    }
    landed
  }
}
