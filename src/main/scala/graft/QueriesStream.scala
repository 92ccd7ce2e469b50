package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming

/** §2.E Structured Streaming — each entry runs real streaming code
  * (readStream → transform → writeStream, Trigger.AvailableNow) to a
  * memory table and returns the bounded result, which the DuckDB oracle
  * checks against the batch-equivalent SQL. Sessionization is checked via
  * the typed batch path (identical session logic); the
  * flatMapGroupsWithState variant is exercised in ScalaTest.
  */
object QueriesStream {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window" -> ((s, d) =>
      Streaming.runToMemory(s,
        Streaming.windowedCounts(Streaming.eventsStream(s, d)),
        "graft_stream_window", OutputMode.Complete())),

    // sliding windows: every event lands in window/slide = 4 windows —
    // the moving-average shape tumbling windows can't express
    "stream_sliding" -> ((s, d) =>
      Streaming.runToMemory(s,
        Streaming.slidingCounts(Streaming.eventsStream(s, d)),
        "graft_stream_sliding", OutputMode.Complete())),

    "stream_enrich" -> ((s, d) =>
      Streaming.runToMemory(s,
        Streaming.enrichedSegmentCounts(
          Streaming.eventsStream(s, d), Tables.customer(s, d)),
        "graft_stream_enrich", OutputMode.Complete())),

    "stream_dedup" -> ((s, d) =>
      Streaming.runToMemory(s,
        Streaming.dedupKeys(Streaming.eventsStream(s, d), "1 hour",
          "user_id", "event_type"),
        "graft_stream_dedup", OutputMode.Append())),

    // watermark-BOUNDED dedup state (dropDuplicatesWithinWatermark):
    // the horizon covers the whole bounded dataset here, so the result
    // equals DISTINCT — while the state contract (one horizon of keys,
    // not the all-time universe) is what survives an infinite stream
    "stream_dedup_wm" -> ((s, d) =>
      Streaming.runToMemory(s,
        Streaming.dedupKeysWithinWatermark(
          Streaming.eventsStream(s, d), "87600 hours",
          "user_id", "event_type"),
        "graft_stream_dedup_wm", OutputMode.Append())),

    // stream-stream interval join: the purchase-attribution shape of
    // q_range_join, run as a real watermarked two-stream join (state
    // evicted as the watermark passes); the bounded join result is
    // aggregated batch-side. Same oracle as the batch range join — the
    // streaming operator must agree with the binned equi-join exactly.
    "stream_join" -> ((s, d) => {
      val joined = Streaming.purchaseAttribution(
        Streaming.eventsStream(s, d), Streaming.eventsStream(s, d))
      Streaming.runToMemory(s, joined, "graft_stream_join", OutputMode.Append())
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("purchase_id")).as("n_windows"))
    }),

    "stream_session" -> ((s, d) =>
      Streaming.sessionizeBatch(Tables.events(s, d)).toDF()
        .select(col("user_id"), col("session_id"),
          expr("CAST(timestamp_micros(start_us) AS TIMESTAMP_NTZ)").as("session_start"),
          expr("CAST(timestamp_micros(end_us) AS TIMESTAMP_NTZ)").as("session_end"),
          col("n_events"))),

    // engine-native session_window sessionization, run as a REAL
    // Append-mode stream: one sentinel event per user far beyond the
    // data's range advances the watermark past every real session's end
    // (Append emits a session only once the watermark passes it; the
    // post-data no-data micro-batch then flushes state), and the
    // sentinel sessions are filtered back out of the bounded result
    "stream_session_native" -> ((s, d) => {
      val root = s"/tmp/graft_rt/sessnat_${d.replace('/', '_')}"
      val ev = Tables.events(s, d).select("user_id", "ts", "event_id")
      val sentinels = ev.select(col("user_id")).distinct()
        .withColumn("ts", lit("2030-01-01 00:00:00").cast("timestamp"))
        .withColumn("event_id", lit(-1L))
      ev.unionByName(sentinels).write.mode("overwrite").parquet(root)
      val schema = s.read.parquet(root).schema
      val stream = s.readStream.schema(schema).parquet(root)
      Streaming.runToMemory(s,
          Streaming.sessionWindowNative(stream),
          "graft_stream_session_native", OutputMode.Append())
        .where(col("session_start") < lit("2029-01-01").cast("timestamp_ntz"))
    }),

    // streaming drift monitor: per-day PSI of the live value
    // distribution vs the first-half baseline — the stream side is one
    // watermarked (window, bin) counter aggregate; PSI math runs batch
    // over the bounded windows × bins frame
    "stream_drift" -> ((s, d) =>
      Streaming.driftPerWindow(s, d, cutoff = "2024-01-16", bins = 10)),

    // streaming upsert materialization: events re-staged as 4 files,
    // streamed one file per micro-batch, each batch MERGEd into a
    // versioned parquet target via foreachBatch — the final target must
    // equal the batch upsert (same oracle as etl_upsert) regardless of
    // how rows were split across batches
    // REAL multi-batch watermark semantics: 3 single-file batches
    // (time tertiles, every 10th event one batch late), append-mode
    // hourly counts — pins watermark progression, late-row dropping,
    // and open-window withholding against a SQL simulation
    "stream_late_data" -> ((s, d) =>
      Streaming.lateDataCounts(s, d,
        s"/tmp/graft_rt/late_${d.replace('/', '_')}")),

    // per-key RUNNING totals: mapGroupsWithState in Update mode over a
    // real 4-batch file stream — each batch emits every touched user's
    // cumulative (count, exact-micros sum); the gate reduces to the
    // final state per user, which must equal the batch GROUP BY no
    // matter how rows split across batches
    "stream_running" -> ((s, d) =>
      Streaming.runningTotals(s, d,
        s"/tmp/graft_rt/running_${d.replace('/', '_')}")),

    // the SAME running-totals contract on Spark 4's transformWithState
    // (named ValueState on the RocksDB store — the arbitrary-state API
    // that supersedes mapGroupsWithState); shares stream_running's
    // oracle, so the two state APIs are pinned to one semantics
    "stream_running_tws" -> ((s, d) =>
      Streaming.runningTotalsTws(s, d,
        s"/tmp/graft_rt/running_tws_${d.replace('/', '_')}")),

    // transformWithState's MAP state surface: MapState[type, count] per
    // user — per-batch state IO touches only the sub-keys the batch
    // saw (RocksDB point ops), never a serialized whole-user blob;
    // final state per (user, type) == the batch GROUP BY
    "stream_typecounts_tws" -> ((s, d) =>
      Streaming.typeCountsTws(s, d,
        s"/tmp/graft_rt/tctws_${d.replace('/', '_')}")),

    // transformWithState's LIST state surface: bounded per-user
    // recent-3 buffer (merge/resort/truncate per batch) + a ValueState
    // row-counter tamper seal — the gate reduces to each user's final
    // stamped emission, so lost list state fails the oracle compare
    "stream_lastn_tws" -> ((s, d) =>
      Streaming.lastNTws(s, d,
        s"/tmp/graft_rt/lastn_${d.replace('/', '_')}")),

    // stream-stream LEFT OUTER interval join: matched pairs emit when
    // both sides meet; unmatched clicks null-pad only once the
    // watermark proves no purchase can arrive. The harness closes the
    // stream with a year-2030 sentinel batch so the bounded result is
    // deterministic (outer-null timing near the live tail is
    // batch-split-dependent — measured, see leftJoinCounts scaladoc)
    "stream_join_left" -> ((s, d) =>
      Streaming.leftJoinCounts(s, d,
        s"/tmp/graft_rt/leftjoin_${d.replace('/', '_')}")),

    // streaming split sink: clean rows → one parquet table, rule
    // violators → the quarantine table with WHY — the streaming error
    // channel; routing is the SAME violationArray the batch gate runs
    "stream_quarantine" -> ((s, d) =>
      Streaming.quarantineSplit(s, d,
        s"/tmp/graft_rt/quarantine_${d.replace('/', '_')}")),

    // stream-stream FULL OUTER interval join: both sides null-pad —
    // unmatched purchases emit too, once the watermark proves no
    // trailing-window click can arrive. Sentinel-closed like the left
    // join, so the bounded result is the plain batch FULL JOIN; the
    // sentinel filter keys on the COALESCED user (a side-column filter
    // would null-kill every padded row)
    "stream_join_full" -> ((s, d) =>
      Streaming.fullJoinCounts(s, d,
        s"/tmp/graft_rt/fulljoin_${d.replace('/', '_')}")),

    // TWO stateful operators chained in ONE query (Spark 4):
    // dropDuplicatesWithinWatermark → tumbling hourly counts, Append
    // mode, sentinel-closed. Dedup keys include ts so the surviving
    // row is arrival-order-independent; watermark delay exceeds the
    // data span so no real row is ever late, whatever the batch split
    "stream_chained" -> ((s, d) =>
      Streaming.chainedDedupCounts(s, d,
        s"/tmp/graft_rt/chained_${d.replace('/', '_')}")),

    // checkpoint RECOVERY: the same windowed agg as stream_window, run
    // as two query lifetimes over one checkpoint — stop after the
    // first half's batches commit, restart, drain the rest. The final
    // table equals the batch GROUP BY over ALL events (shared oracle):
    // replaying committed batches would double first-half counts,
    // losing state would zero them. Batch-id continuity and
    // no-reprocessing input counts are pinned in StreamingSpec.
    "stream_recover" -> ((s, d) =>
      Streaming.recoverWindowCounts(s, d,
        s"/tmp/graft_rt/recover_${d.replace('/', '_')}")),

    "stream_upsert" -> ((s, d) => {
      val root = s"/tmp/graft_rt/upsert_${d.replace('/', '_')}"
      // the bucketed target merges into what exists — start from a
      // clean slate so a previous run's state can't leak in
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$root/target"))
      Tables.events(s, d).repartition(4)
        .write.mode("overwrite").parquet(s"$root/stage")
      val schema = s.read.parquet(s"$root/stage").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/stage")
      Streaming.upsertStream(s, stream,
          Seq("user_id", "event_type"), Seq("ts", "event_id"),
          s"$root/target")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), expr("CAST(ROUND(value, 4) AS DOUBLE)").as("val_r"))
    }),

    // exactly-once streaming publish: each micro-batch is one
    // IDEMPOTENT tagged Txn append (tag = batch id, the Delta
    // txnAppId/version dedup shape) — the harness replays batch 0's
    // commit and REQUIRES the head version unchanged before returning,
    // so the gate hash-fails on a double-commit OR a lost batch
    "stream_txn_publish" -> ((s, d) => {
      val root = s"/tmp/graft_rt/stxn_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      Streaming.txnPublishStream(s, d, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // exactly-once streaming CONSUMER over a Txn table (the half
    // stream_txn_publish leaves open): TxnTail drains the commit log
    // in per-commit micro-batches into a downstream Txn table, cursor
    // persisted AS the sink's idempotence tags. The history includes a
    // REWRITE commit (compact) — the tail must see its self-cancelling
    // delete+insert, not re-fed rows — and the drain is split across
    // the history plus replayed once: a lost batch, a double-applied
    // batch, or a cursor that drifts past/behind a commit hash-fails
    "stream_txn_tail" -> ((s, d) => {
      val base = s"/tmp/graft_rt/stail_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val src = s"$base/src"; val sink = s"$base/sink"
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, src,
        ev.where(col("user_id") % 2 === 0))                        // v1
      graft.operators.Txn.commitAppend(s, src,
        ev.where(col("user_id") % 2 === 1))                        // v2
      // drain mid-history, then extend the history and drain again —
      // the second drain resumes from the tag-derived cursor, and a
      // replayed drain must be a zero-batch no-op (exactly-once)
      require(graft.streaming.TxnTail.drain(s, src, sink) == 2,
        "tail did not land one batch per commit")
      graft.operators.Txn.compact(s, src, numFiles = 2)            // v3
      graft.operators.Txn.commitDelete(s, src,
        ev.where(col("user_id") % 10 === 3).select("user_id").distinct(),
        "user_id")                                                 // v4
      require(graft.streaming.TxnTail.drain(s, src, sink) == 2,
        "resumed tail did not land the new commits")
      require(graft.streaming.TxnTail.drain(s, src, sink) == 0,
        "replayed drain was not idempotent")
      graft.operators.Txn.read(s, sink)
        .groupBy(col("_change_type").as("change"),
          col("_commit_version").as("v"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // ENGINE-NATIVE streaming source over the same exactly-once core
    // (r15): `readStream.format("graft-txn")` — commit versions as
    // offsets, micro-batches = per-commit CDF spans, and the cursor is
    // SPARK'S OWN offset log under checkpointLocation (no hand-rolled
    // drain loop). Same history as stream_txn_tail — one semantics,
    // third machinery, SHARED oracle: the first AvailableNow run
    // drains v1..v2 into a parquet file sink, the history then extends
    // (compact + copy-on-write delete) and the SAME checkpoint resumes
    // through Spark's offset log, and a third run with no new commits
    // must append nothing. A re-fed span, a lost batch, or a cursor
    // that drifts hash-fails against the recomputed per-commit feed
    "stream_txn_source" -> ((s, d) => {
      val base = s"/tmp/graft_rt/ssrc_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val src = s"$base/src"; val out = s"$base/out"
      val ckpt = s"$base/ckpt"
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"))
      graft.operators.Txn.commitOverwrite(s, src,
        ev.where(col("user_id") % 2 === 0))                        // v1
      graft.operators.Txn.commitAppend(s, src,
        ev.where(col("user_id") % 2 === 1))                        // v2
      def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
        val q = s.readStream.format("graft-txn").option("path", src)
          .option("maxCommitsPerTrigger", "1").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(); q
      }
      drain()
      graft.operators.Txn.compact(s, src, numFiles = 2)            // v3
      graft.operators.Txn.commitDelete(s, src,
        ev.where(col("user_id") % 10 === 3).select("user_id").distinct(),
        "user_id")                                                 // v4
      // record the resumed run's executed plan (real batches) for the
      // PlanHygiene streaming sweep — the final caught-up drain runs
      // no batch and would record an empty shell
      Streaming.recordPlan("stream_txn_source", drain())
      drain() // caught up: Spark's offset log must add nothing
      s.read.parquet(out)
        .groupBy(col("_change_type").as("change"),
          col("_commit_version").as("v"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    }),

    // ENGINE-NATIVE streaming SINK (r16): the write half of the
    // graft-txn pair — `writeStream.format("graft-txn")` lands each
    // micro-batch as ONE idempotent tagged Txn commit
    // (tag = <txnAppId>-<batchId>, the Delta DeltaSink discipline).
    // Same oracle as stream_txn_publish (one semantics, native
    // machinery instead of a hand-rolled foreachBatch): after the
    // drain, batch 0's tag is REPLAYED with an arbitrary payload —
    // the head must not move (a re-delivered batch appends nothing)
    "stream_txn_sink" -> ((s, d) => {
      val base = s"/tmp/graft_rt/stsk_${d.replace('/', '_')}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      val stage = s"$base/in"; val table = s"$base/table"
      Tables.events(s, d).repartition(3)
        .write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
        .writeStream.format("graft-txn")
        .option("path", table).option("txnAppId", "sink")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Streaming.recordPlan("stream_txn_sink", q)
      val head = graft.operators.Txn.currentVersion(s, table)
      val replay = graft.operators.Txn.commitAppendIdempotent(
        s, table, s.read.parquet(stage).limit(1), "sink-0")
      require(replay.isEmpty &&
        graft.operators.Txn.currentVersion(s, table) == head,
        "replayed micro-batch commit was not idempotent")
      graft.operators.Txn.read(s, table)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)")
            .as("sum_val"))
    })
  )

  val oracle: Map[String, String] = Map(
    // the published Txn table must hold the stream's rows exactly once:
    // a replayed batch doubling counts, or a torn/lost batch, mismatches
    "stream_txn_publish" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1""".stripMargin,

    // the native sink shares the publish oracle verbatim — one
    // semantics, second (engine-API) machinery
    "stream_txn_sink" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1""".stripMargin,

    // the tailed sink must hold EXACTLY the per-commit CDF multisets:
    // v1 insert = even users, v2 insert = odd, v3 (compact) a
    // self-cancelling delete+insert of everything, v4 (delete) the
    // full rewrite minus the purged users — a lost/duplicated batch
    // or a re-fed rewrite breaks a slice
    "stream_txn_tail" ->
      """WITH agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |  FROM events GROUP BY 1)
        |SELECT 'insert' AS change, CAST(1 AS INTEGER) AS v, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 2 = 0 GROUP BY 3
        |UNION ALL
        |SELECT 'insert', CAST(2 AS INTEGER), event_type,
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 2 = 1 GROUP BY 3
        |UNION ALL
        |SELECT 'delete', CAST(3 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'insert', CAST(3 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'delete', CAST(4 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'insert', CAST(4 AS INTEGER), event_type,
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 10 <> 3 GROUP BY 3""".stripMargin,

    // identical feed, third machinery (readStream.format("graft-txn")
    // through Spark's own offset log) — shares stream_txn_tail's
    // recomputed per-commit CDF oracle verbatim
    "stream_txn_source" ->
      """WITH agg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |  FROM events GROUP BY 1)
        |SELECT 'insert' AS change, CAST(1 AS INTEGER) AS v, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events WHERE user_id % 2 = 0 GROUP BY 3
        |UNION ALL
        |SELECT 'insert', CAST(2 AS INTEGER), event_type,
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 2 = 1 GROUP BY 3
        |UNION ALL
        |SELECT 'delete', CAST(3 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'insert', CAST(3 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'delete', CAST(4 AS INTEGER), event_type, n, sum_val FROM agg
        |UNION ALL
        |SELECT 'insert', CAST(4 AS INTEGER), event_type,
        |  CAST(COUNT(*) AS BIGINT),
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |FROM events WHERE user_id % 10 <> 3 GROUP BY 3""".stripMargin,

    "stream_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2""".stripMargin,

    // reconstruct the 4 overlapping 2h/30m windows per event: starts
    // are the 4 slide-aligned points in (ts - 2h, ts], epoch-0 aligned
    // like Spark's window()
    "stream_sliding" ->
      """SELECT
        |  make_timestamp(((epoch_us(ts) // 1800000000) - i) * 1800000000)
        |    AS window_start,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events, range(0, 4) r(i)
        |GROUP BY 1, 2""".stripMargin,

    "stream_enrich" ->
      """SELECT date_trunc('day', ts) AS window_start, c_mktsegment,
        |event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2, 3""".stripMargin,

    // dedup-then-window chain: DISTINCT (user, type, ts) then hourly
    // counts — the ts-in-key choice makes the kept row deterministic
    "stream_chained" ->
      """WITH dd AS (SELECT DISTINCT user_id, event_type, ts FROM events)
        |SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM dd GROUP BY 1, 2""".stripMargin,

    // recovery must reproduce the full-data aggregate exactly — same
    // oracle string as stream_window by construction
    "stream_recover" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2""".stripMargin,

    "stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "stream_dedup_wm" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "stream_join" ->
      """SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_windows
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id AND p.event_type = 'purchase'
        | AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 2 HOUR
        |GROUP BY e.event_type""".stripMargin,

    // batch reconstruction: same baseline bin edges, per-day windows
    // via date_trunc, add-1 smoothed ROUND(·,6) PSI terms + exact
    // decimal per-window sums (mirrors Streaming.driftPerWindow)
    "stream_drift" ->
      """WITH base AS (
        |  SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL),
        |st AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM base),
        |bb AS (
        |  SELECT CAST(LEAST(GREATEST(
        |      CASE WHEN (SELECT mx FROM st) = (SELECT mn FROM st) THEN 0.0
        |           ELSE FLOOR((v - (SELECT mn FROM st))
        |             / (((SELECT mx FROM st) - (SELECT mn FROM st)) / 10)) END,
        |    0.0), 9.0) AS INT) AS bin, COUNT(*) AS n_base
        |  FROM base GROUP BY 1),
        |cur AS (
        |  SELECT date_trunc('day', ts) AS window_start,
        |    CAST(LEAST(GREATEST(
        |      CASE WHEN (SELECT mx FROM st) = (SELECT mn FROM st) THEN 0.0
        |           ELSE FLOOR((CAST(value AS DOUBLE) - (SELECT mn FROM st))
        |             / (((SELECT mx FROM st) - (SELECT mn FROM st)) / 10)) END,
        |    0.0), 9.0) AS INT) AS bin, COUNT(*) AS n_cur
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |frame AS (
        |  SELECT w.window_start, r.bin,
        |    COALESCE(bb.n_base, 0) AS n_base, COALESCE(c.n_cur, 0) AS n_cur
        |  FROM (SELECT DISTINCT window_start FROM cur) w
        |  CROSS JOIN range(0, 10) r(bin)
        |  LEFT JOIN cur c ON c.window_start = w.window_start AND c.bin = r.bin
        |  LEFT JOIN bb ON bb.bin = r.bin),
        |tot AS (SELECT window_start, SUM(n_cur) AS tc FROM frame GROUP BY 1),
        |tbase AS (SELECT COUNT(*) AS tb FROM base),
        |terms AS (
        |  SELECT f.window_start, f.n_cur,
        |    CAST(ROUND(
        |      ((f.n_base + 1.0) / ((SELECT tb FROM tbase) + 10)
        |        - (f.n_cur + 1.0) / (t.tc + 10))
        |      * ln(((f.n_base + 1.0) / ((SELECT tb FROM tbase) + 10))
        |          / ((f.n_cur + 1.0) / (t.tc + 10))),
        |    6) AS DOUBLE) AS term
        |  FROM frame f JOIN tot t USING (window_start))
        |SELECT window_start, CAST(SUM(n_cur) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE) AS psi
        |FROM terms GROUP BY window_start""".stripMargin,

    // one-batch-late rows land while their window's state is still
    // live (eviction lags one batch), so they MERGE — full per-window
    // counts; the append-mode cutoff withholds windows the final
    // watermark (global max − delay) has not passed. If the engine
    // wrongly dropped in-state late rows, these counts would shrink
    // and the gate would catch it. The evicted-window DROP path is
    // deterministic only per state-eviction timing, so it is pinned in
    // StreamingSpec with a crafted 2-batch-late fixture, not here.
    // sentinel-closed stream ⇒ plain batch LEFT JOIN, no cutoff: a
    // click matching k purchases contributes k rows, unmatched one
    "stream_join_left" ->
      """WITH p AS (SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |j AS (SELECT c.click_id, c.user_id, p.purchase_id
        |  FROM c LEFT JOIN p ON c.user_id = p.p_user
        |    AND c.ts >= p.p_ts AND c.ts <= p.p_ts + INTERVAL 2 HOUR)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(purchase_id) AS BIGINT) AS n_matched
        |FROM j GROUP BY user_id""".stripMargin,

    // stateless routing ⇒ the batch quarantine over the same table,
    // whatever the micro-batch split
    "stream_quarantine" ->
      """WITH f AS (
        |  SELECT event_id, list_filter([
        |    CASE WHEN (value <= 300) IS NOT TRUE THEN 'value_le_300' END,
        |    CASE WHEN (event_type <> 'error') IS NOT TRUE THEN 'type_no_error' END
        |  ], x -> x IS NOT NULL) AS fr
        |  FROM events)
        |SELECT event_id, CAST(len(fr) AS INT) AS n_failed,
        |  array_to_string(fr, ',') AS failed_rules
        |FROM f WHERE len(fr) > 0""".stripMargin,

    // sentinel-closed stream ⇒ plain batch FULL JOIN: matched pairs,
    // click-only and purchase-only paddings all counted per user
    "stream_join_full" ->
      """WITH p AS (SELECT user_id AS p_user, event_id AS purchase_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |j AS (SELECT c.click_id, c.user_id, p.p_user, p.purchase_id
        |  FROM c FULL JOIN p ON c.user_id = p.p_user
        |    AND c.ts >= p.p_ts AND c.ts <= p.p_ts + INTERVAL 2 HOUR)
        |SELECT COALESCE(user_id, p_user) AS user_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(CASE WHEN click_id IS NOT NULL AND purchase_id IS NOT NULL
        |    THEN 1 END) AS BIGINT) AS n_matched,
        |  CAST(COUNT(CASE WHEN click_id IS NOT NULL AND purchase_id IS NULL
        |    THEN 1 END) AS BIGINT) AS n_click_only,
        |  CAST(COUNT(CASE WHEN click_id IS NULL THEN 1 END) AS BIGINT)
        |    AS n_purchase_only
        |FROM j GROUP BY 1""".stripMargin,

    // final state per user == the batch GROUP BY (count + exact
    // decimal-micros sum); the per-batch emission cadence itself is
    // pinned by StreamingSpec's multi-batch fixture
    // COALESCE(...,0) pins the stream side's null-as-0-micros rule: a
    // user whose events are ALL null-valued sums to 0.0, not NULL
    "stream_running" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(ROUND(CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0)
        |    AS DOUBLE), 4) + 0.0 AS DOUBLE) AS sum_r
        |FROM events GROUP BY user_id""".stripMargin,

    // final recent-3 buffer per user == batch window top-3 by event time
    "stream_lastn_tws" ->
      """SELECT user_id, CAST(rn AS INT) AS rn, event_id FROM (
        |  SELECT user_id, event_id, ROW_NUMBER() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 3""".stripMargin,

    // MapState final counts per (user, type) == plain batch GROUP BY
    "stream_typecounts_tws" ->
      """SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    // same totals contract through the transformWithState pipeline
    "stream_running_tws" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(ROUND(CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6))), 0)
        |    AS DOUBLE), 4) + 0.0 AS DOUBLE) AS sum_r
        |FROM events GROUP BY user_id""".stripMargin,

    "stream_late_data" ->
      """WITH fw AS (SELECT max(ts) - INTERVAL 24 HOUR AS f FROM events)
        |SELECT window_start, event_type, n FROM (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |    event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2) g, fw
        |WHERE g.window_start + INTERVAL 1 HOUR <= fw.f""".stripMargin,

    "stream_upsert" ->
      """SELECT user_id, event_type, event_id, ts,
        |  CAST(ROUND(value, 4) AS DOUBLE) AS val_r
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,

    // session_window merges an event exactly `gap` after its
    // predecessor (merge condition: next start <= previous end), the
    // same `diff > gap` split as the fMGWS oracle; end = last event+gap
    "stream_session_native" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "stream_session" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, CAST(sid AS INT) AS session_id,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin
  )
}
