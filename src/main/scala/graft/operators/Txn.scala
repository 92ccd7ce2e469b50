package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Manifest-based ATOMIC multi-partition table commit — the lakehouse
  * primitive the ETL family's directory writers (partition overwrite,
  * compaction, index swaps) lack on their own: those mutate directories
  * in place, so a reader listing mid-publish can see a torn table. Here
  * a table is a directory convention
  *
  * {{{
  *   root/data/b00001-3f9a2c1d/…        // unpartitioned commit: its own
  *                                      // batch dir, version + random
  *                                      // suffix — UNIQUE per attempt, so
  *                                      // racing committers never stage
  *                                      // into one directory
  *   root/data/k=v/b00002-9c41ab7e-…    // partitioned commit (r15):
  *                                      // partition dirs OUTSIDE the batch
  *                                      // segment, files attempt-unique by
  *                                      // batch-tag PREFIX — one basePath
  *                                      // spans every commit, so snapshot
  *                                      // reads stay ONE scan relation
  *   root/_manifests/v00001.manifest
  * }}}
  *
  * and the CURRENT table state is defined exclusively by the
  * highest-versioned manifest. A manifest is newline-delimited:
  * metadata lines first (`#schema:<json>` — the committing frame's
  * schema, so an EMPTY snapshot stays readable; `#kind:<verb>` — the
  * commit's own verb, the [[history]] primitive; `#txn:<tag>` — one
  * per idempotence tag ever committed, carried forward by every
  * commit type so rewrites cannot forget them, checkpointed through
  * `#tagbase`), then one line per data file: root/data-relative path
  * plus TAB-separated `col:min:max:nulls` per declared stats column
  * ([[readWhere]]/[[readWhereAll]] file skipping, row-level commit
  * pruning, [[commitDeleteWhere]]'s read-free file drops). Commits
  * write ALL data files first, then publish through the ONE storage
  * primitive the protocol needs — [[TxnLogStore.putIfAbsent]]
  * ("create `v<next>.manifest` unless it exists, atomically"; r15
  * seam, default impl = temp write + rename-no-overwrite). That
  * claim is the commit point:
  *
  *  - ATOMIC VISIBILITY — putIfAbsent's all-or-nothing contract makes
  *    the manifest appear fully-written or not at all; data files it
  *    references are already complete. Torn reads are impossible BY
  *    CONSTRUCTION, not by timing.
  *  - OPTIMISTIC CONCURRENCY — putIfAbsent REFUSES an existing
  *    destination, so two racing committers cannot both win one
  *    version number; the loser re-reads the head and restages
  *    against the next version (Delta/Iceberg's commit protocol
  *    shape). The default [[HadoopRenameLogStore]]: on HDFS the
  *    rename refusal is atomic server-side; on LOCAL filesystems it
  *    is an exists-check over clobbering rename(2), so the claim is
  *    additionally serialized in-JVM (Delta's LocalLogStore draws the
  *    same single-machine boundary; TxnRenameProbe pins the
  *    contract). OBJECT STORES implement putIfAbsent directly as a
  *    conditional PUT (S3 If-None-Match, GCS generation-match-0) —
  *    TxnLogStoreSpec proves the protocol is exactly-once on a store
  *    offering only that, and breaks on one that clobbers: the seam
  *    IS the correctness boundary.
  *  - TIME TRAVEL — previous manifests (and the files they reference,
  *    which commits never delete) remain readable: `read(root, v)` is a
  *    snapshot read at version v, the file-layer form of
  *    etl_bitemporal's as-of semantics.
  *  - CRASH SAFETY — a crash before the rename leaves orphan data files
  *    under an unreferenced batch dir and a hidden temp manifest;
  *    neither is visible to any reader, and `vacuum` (retention-gated:
  *    a file younger than the window is NEVER reclaimed, so vacuum
  *    cannot race a concurrent committer's stage-then-publish span)
  *    reclaims them.
  *
  * Scale: commit metadata is one file listing + one small file write —
  * O(files), no data pass beyond the write itself (stats add ONE
  * distributed pass over the staged batch); reads prune to exactly the
  * listed files (partition-directory values survive via per-batch
  * basePath). A 100 TB table's manifest at ~1e5 files is a few MB —
  * the same order Delta JSON actions or an Iceberg manifest list carry.
  *
  * Reference basis: the reference's connector protocol treats a sink as
  * a transactional unit (protocols.clj connector verbs); this realizes
  * that contract for multi-partition parquet tables. */
object Txn {
  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(s"$root/_manifests")

  private def manifestPath(root: String, v: Int) =
    new Path(manifestDir(root), f"v$v%05d.manifest")

  private def isMeta(line: String): Boolean = line.startsWith("#")
  private def linePath(line: String): String = line.split('\t')(0)

  private def txnTags(lines: Seq[String]): Seq[String] =
    lines.collect { case l if l.startsWith("#txn:") => l.stripPrefix("#txn:") }

  private def schemaLine(lines: Seq[String]): Option[StructType] =
    lines.find(_.startsWith("#schema:"))
      .map(l => DataType.fromJson(l.stripPrefix("#schema:"))
        .asInstanceOf[StructType])

  // ---- delta-log commit format --------------------------------------
  // Pre-r14, every commit carried ALL prior data lines forward into its
  // manifest — O(table files) driver text per commit, which at 100 TB
  // (~1M files) and streaming-publish cadence is a ~100 MB write per
  // micro-batch. A manifest may instead be a DELTA over the previous
  // snapshot (Delta Lake's per-commit action files, Iceberg's reused
  // manifests): a `#base:<v-1>` meta line, `#rm:<path>` lines for the
  // files the commit removes, and data lines ONLY for the files it
  // adds — so commit metadata cost is O(touched files). Snapshot
  // resolution folds the chain back to the nearest FULL listing: a
  // baseless manifest (overwrite/compact/restore-of-everything — and
  // every pre-r14 manifest, which therefore read unchanged) or a
  // sidecar CHECKPOINT `c<v>.checkpoint` holding version v's resolved
  // data lines. Checkpoints roll automatically once a chain reaches
  // [[checkpointEvery]] delta steps (post-publish, best-effort, like
  // the `_latest` hint — a failed roll only lengthens the walk, never
  // changes the snapshot) and their bytes are a pure function of the
  // committed chain, so racing writers produce identical content
  // (rename-no-overwrite, same discipline as the tags files).
  // Writers never re-add a path that already exists in the base (adds
  // come from fresh attempt-unique batch dirs), so a delta's add/rm
  // lines ARE the commit's exact file-set diff — [[readChangesCdf]]
  // and conflict detection read them directly instead of diffing two
  // resolved snapshots.

  /** Delta-chain length that triggers a sidecar checkpoint roll. */
  private[graft] val checkpointEvery = 16

  private def checkpointPath(root: String, v: Int) =
    new Path(manifestDir(root), f"c$v%05d.checkpoint")

  private def baseOf(lines: Seq[String]): Option[Int] =
    lines.find(_.startsWith("#base:")).map(_.stripPrefix("#base:").toInt)

  private def rmPaths(lines: Seq[String]): Seq[String] =
    lines.collect { case l if l.startsWith("#rm:") => l.stripPrefix("#rm:") }

  /** `#base` + `#rm` delta block for a commit built on snapshot
    * `baseV` that removes `removed` and adds `adds` (full stats
    * lines). `baseV == 0` (first commit) writes a baseless full
    * listing — there is nothing to delta against. */
  private def deltaLines(baseV: Int, removed: Seq[String],
      adds: Seq[String]): Seq[String] =
    if (baseV == 0) adds
    else s"#base:$baseV" +: (removed.sorted.map(p => s"#rm:$p") ++ adds)

  /** Resolved DATA lines of snapshot `v`: walk the delta chain back to
    * the nearest full listing (sidecar checkpoint or baseless
    * manifest), then replay each step's removes + adds oldest-first.
    * Walk length is bounded by [[checkpointEvery]] once checkpoints
    * roll; every step is one small driver read. */
  private def resolvedData(spark: SparkSession, root: String,
      v: Int): Seq[String] = {
    val f = fs(spark, root)
    val steps =
      scala.collection.mutable.ArrayBuffer.empty[(Set[String], Seq[String])]
    var cur = v
    var base: Seq[String] = null
    while (base == null) {
      val cp = checkpointPath(root, cur)
      if (f.exists(cp)) {
        val in = f.open(cp)
        base = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
      } else {
        val raw = rawLines(spark, root, cur)
        baseOf(raw) match {
          case None => base = raw.filterNot(isMeta)
          case Some(w) =>
            steps += ((rmPaths(raw).toSet, raw.filterNot(isMeta)))
            cur = w
        }
      }
    }
    steps.reverseIterator.foldLeft(base) { case (acc, (rm, adds)) =>
      (if (rm.isEmpty) acc else acc.filterNot(l => rm(linePath(l)))) ++ adds
    }
  }

  /** Strip bloom fields (`c:bf:` / `c:bfs:`) from a data line — TEXT
    * checkpoints drop them (r16): a bloom is ~11 KB of base64 PER FILE
    * per column, so a 1M-file table's text checkpoint would be ~11 GB
    * read onto the driver by every snapshot resolution. Blooms live in
    * the PARQUET checkpoint sidecar (read as a Spark job by the prune
    * surfaces) and in each commit's own delta add lines (O(touched));
    * ranges/nulls/string bounds — the small fields driver-side
    * consumers (commitDeleteWhere's metadata drop) actually use — stay
    * in the text. Everything else (`__dv`, stats) is semantic and is
    * never stripped. */
  private def stripBloomFields(line: String): String =
    if (!line.contains(":bf")) line // covers both :bf: and :bfs:
    else line.split('\t').filterNot { field =>
      val a = field.split(':')
      a.length == 4 && (a(1) == "bf" || a(1) == "bfs")
    }.mkString("\t")

  /** Write version `v`'s resolved data lines as a sidecar checkpoint —
    * deterministic bytes (pure function of the committed chain), so a
    * racer's identical write losing the rename changes nothing. Bloom
    * fields are stripped (see [[stripBloomFields]]); the parquet
    * sidecar written alongside carries them for the prune surfaces. */
  private def writeCheckpointIfAbsent(spark: SparkSession, root: String,
      v: Int, dataLines: Seq[String]): Unit = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    // same seam as the commit point; a lost race means a racer wrote
    // the identical bytes (pure function of the committed chain)
    activeStore.putIfAbsent(f, checkpointPath(root, v),
      dataLines.map(stripBloomFields(_) + "\n").mkString.getBytes("UTF-8"))
    ()
  }

  // ---- parquet checkpoint sidecar: distributed stats resolution ------
  // The text manifest chain bounds the WALK, but until r16 nothing
  // bounded the driver MATERIALIZATION: every prune parsed the full
  // resolved listing — 8 KiB of bloom bits per file per column — into
  // a driver-side Seq[Entry] (at 1M files × 2 bloom columns that is
  // ~16 GB resident per prune). Delta solves this with
  // checkpoint.parquet read as a Spark job; Iceberg with manifest-list
  // avro. Same shape here: each checkpoint roll ALSO writes the
  // resolved entries as a parquet directory `c<v>.cpq` (path + typed
  // stats/bloom/dv columns), and [[entriesFrame]] resolves any
  // snapshot's entries AS A DATAFRAME — parquet base + the small delta
  // tail — so the prune surfaces (touchedFiles, filesForKeys,
  // filesForPreds, filesForRange, filesForStrRange) run as Spark jobs
  // where bloom bytes stay on executors and candidate PATHS are the
  // only collect. Tables without a parquet checkpoint yet (young, or
  // legacy text-only) resolve through a driver-parsed local frame —
  // identical prune semantics, today's cost.

  import org.apache.spark.sql.types.{ArrayType, BinaryType, IntegerType,
    MapType, StringType, StructField}

  private def parquetCheckpointPath(root: String, v: Int) =
    new Path(manifestDir(root), f"c$v%05d.cpq")

  /** The entries-frame schema — one row per data file. */
  private[graft] val entriesFrameSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("nstats", MapType(StringType, StructType(Seq(
      StructField("lo", org.apache.spark.sql.types.DoubleType),
      StructField("hi", org.apache.spark.sql.types.DoubleType),
      StructField("nulls", org.apache.spark.sql.types.LongType))))),
    StructField("blooms", MapType(StringType, StructType(Seq(
      StructField("k", IntegerType),
      StructField("bits", BinaryType))))),
    StructField("sstats", MapType(StringType, StructType(Seq(
      StructField("lo", StringType),
      StructField("hi", StringType),
      StructField("nulls", org.apache.spark.sql.types.LongType))))),
    StructField("sblooms", MapType(StringType, StructType(Seq(
      StructField("k", IntegerType),
      StructField("bits", BinaryType))))),
    StructField("dvs", ArrayType(StringType))))

  private def entryToRow(e: Entry): Row = Row(
    e.path,
    e.stats.map { case (c, (lo, hi)) =>
      c -> Row(lo, hi, e.nulls.get(c).map(Long.box).orNull) },
    e.blooms.map { case (c, (k, b)) => c -> Row(k, b) },
    e.strStats.map { case (c, (lo, hi)) =>
      c -> Row(lo, hi, e.nulls.get(c).map(Long.box).orNull) },
    e.strBlooms.map { case (c, (k, b)) => c -> Row(k, b) },
    e.dvs)

  private def entriesToFrame(spark: SparkSession,
      entries: Seq[Entry]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(entries.map(entryToRow).asJava,
      entriesFrameSchema)
  }

  /** Snapshot `v`'s entries AS A DATAFRAME ([[entriesFrameSchema]]):
    * walk the delta chain to the nearest full listing — preferring the
    * PARQUET checkpoint (read distributedly, bloom bytes never on the
    * driver) over the text one — then replay each step's removes
    * (anti-filter) and adds (parsed from the step's OWN raw add lines,
    * so recent files keep their blooms even though text checkpoints
    * strip them). The prune surfaces run over this frame as Spark
    * jobs; only candidate paths are ever collected. */
  private[graft] def entriesFrame(spark: SparkSession, root: String,
      v: Int): DataFrame = {
    val f = fs(spark, root)
    val steps =
      scala.collection.mutable.ArrayBuffer.empty[(Set[String], Seq[String])]
    var cur = v
    var base: DataFrame = null
    while (base == null) {
      val pq = parquetCheckpointPath(root, cur)
      val tc = checkpointPath(root, cur)
      if (f.exists(pq))
        base = spark.read.schema(entriesFrameSchema).parquet(pq.toString)
      else if (f.exists(tc)) {
        // text checkpoint without a parquet twin (legacy table, or the
        // best-effort parquet roll failed): driver-parse — post-r16
        // text carries no bloom bytes, so this stays small; pre-r16
        // text still parses its blooms (nothing lost on old tables)
        val in = f.open(tc)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toList
        finally in.close()
        base = entriesToFrame(spark, lines.map(parseEntryLine))
      } else {
        val raw = rawLines(spark, root, cur)
        baseOf(raw) match {
          case None =>
            base = entriesToFrame(spark,
              raw.filterNot(isMeta).map(parseEntryLine))
          case Some(w) =>
            steps += ((rmPaths(raw).toSet, raw.filterNot(isMeta)))
            cur = w
        }
      }
    }
    steps.reverseIterator.foldLeft(base) { case (acc, (rm, adds)) =>
      val kept =
        if (rm.isEmpty) acc
        else acc.where(!col("path").isInCollection(rm))
      if (adds.isEmpty) kept
      else kept.unionByName(
        entriesToFrame(spark, adds.map(parseEntryLine)))
    }
  }

  /** True when snapshot `v`'s chain resolves through a PARQUET
    * checkpoint — the signal that entry stats are too big to sit on
    * the driver (bloom bytes live only there post-roll). */
  private def hasParquetBase(spark: SparkSession, root: String,
      v: Int): Boolean = {
    val f = fs(spark, root)
    var cur = v
    while (true) {
      if (f.exists(parquetCheckpointPath(root, cur))) return true
      if (f.exists(checkpointPath(root, cur))) return false
      baseOf(rawLines(spark, root, cur)) match {
        case None => return false
        case Some(w) => cur = w
      }
    }
    false
  }

  /** Entry resolution for the prune surfaces, in whichever mode the
    * table's size warrants: `Right(frame)` once a parquet checkpoint
    * anchors the chain (prunes run as Spark jobs — bloom bytes never
    * driver-resident), `Left(entries)` before one exists (young or
    * text-only tables — the text chain is driver-parsed anyway, so a
    * metadata-only prune loop beats paying a Spark job per call). One
    * semantics, two costs; both sides share the same conservative
    * rules. */
  private def resolveEntries(spark: SparkSession, root: String,
      v: Int): Either[Seq[Entry], DataFrame] =
    if (hasParquetBase(spark, root, v)) Right(entriesFrame(spark, root, v))
    else Left(snapshotEntries(spark, root, v))

  /** Roll version `v`'s resolved entries as a parquet checkpoint
    * sidecar — advisory like the text one (a failed roll only means
    * prunes keep resolving through older checkpoints + a longer delta
    * tail), content a pure function of the committed chain. Written
    * to a hidden temp dir then dir-renamed-no-overwrite: a lost racer
    * wrote identical logical content. MUST run BEFORE the text
    * checkpoint roll at `v` (the text twin strips blooms; resolving
    * through it would strip them from the parquet sidecar too). */
  private def writeParquetCheckpointIfAbsent(spark: SparkSession,
      root: String, v: Int): Unit =
    try {
      val f = fs(spark, root)
      val target = parquetCheckpointPath(root, v)
      if (f.exists(target)) return
      val tmp = new Path(manifestDir(root),
        s".tmpcpq-${java.util.UUID.randomUUID().toString}")
      entriesFrame(spark, root, v).write.parquet(tmp.toString)
      if (f.exists(target) || !f.rename(tmp, target))
        f.delete(tmp, true) // racer won — identical content, fine
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Post-publish checkpoint roll: if `v`'s delta chain has reached
    * [[checkpointEvery]] steps without a materialized full listing,
    * roll one at `v`. Best-effort (advisory, like the head hint): a
    * failure lengthens future resolution walks but never changes any
    * snapshot. */
  private def maybeCheckpoint(spark: SparkSession, root: String,
      v: Int): Unit =
    try {
      val f = fs(spark, root)
      var depth = 0
      var cur = v
      var stop = false
      while (!stop && depth < checkpointEvery) {
        if (f.exists(checkpointPath(root, cur))) stop = true
        else baseOf(rawLines(spark, root, cur)) match {
          case None => stop = true
          case Some(w) => depth += 1; cur = w
        }
      }
      if (depth >= checkpointEvery) {
        // parquet FIRST: its resolution must see the raw chain (delta
        // add lines carry blooms; the text twin strips them)
        writeParquetCheckpointIfAbsent(spark, root, v)
        writeCheckpointIfAbsent(spark, root, v,
          resolvedData(spark, root, v))
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Version `v`'s exact file-set diff vs `v-1`: (added, removed).
    * A delta manifest's own action lines carry the answer in O(touched)
    * (writers never re-add a base path); a full manifest falls back to
    * the resolved-set difference. The unit [[readChangesCdf]] and the
    * partition-conflict check fold over. */
  private def fileDiff(spark: SparkSession, root: String,
      v: Int): (Seq[String], Seq[String]) = {
    val raw = rawLines(spark, root, v)
    baseOf(raw) match {
      case Some(w) if w == v - 1 =>
        (raw.filterNot(isMeta).map(linePath), rmPaths(raw))
      case _ =>
        val before =
          if (v == 1) Set.empty[String]
          else snapshotFiles(spark, root, v - 1).toSet
        val after = snapshotFiles(spark, root, v).toSet
        ((after -- before).toSeq.sorted, (before -- after).toSeq.sorted)
    }
  }

  /** The head's META lines (schema, tag block) without resolving the
    * data chain — what commit staging needs from the previous
    * snapshot when it writes a delta instead of carrying data lines
    * forward. Empty for v = 0 (first commit). */
  private def headMetaLines(spark: SparkSession, root: String,
      v: Int): Seq[String] =
    if (v == 0) Nil else rawLines(spark, root, v).filter(isMeta)

  // ---- tag checkpointing -------------------------------------------
  // Every commit used to carry EVERY `#txn:` tag ever committed — at a
  // streaming publish cadence that's an O(commits) line block rewritten
  // into each new manifest (the verdict's "O(versions) per commit").
  // A manifest may instead carry `#tagbase:<w>`: tags committed at or
  // before version w live in `_manifests/t<w>.tags`, and the manifest
  // lists only tags committed SINCE w. The tags file is written
  // (rename-no-overwrite, like manifests) BEFORE any manifest
  // references it, and its content is a pure function of committed
  // manifest w — racing committers derive identical bytes, so the
  // loser's failed rename changes nothing. Readers without the file
  // (defensive) fall back to resolving manifest w recursively.
  // Manifests with no `#tagbase` line resolve exactly as before.

  /** Manifest suffix-tag budget before a commit rolls a checkpoint. */
  private[graft] val tagCheckpointEvery = 32

  private def tagsFilePath(root: String, w: Int) =
    new Path(manifestDir(root), f"t$w%05d.tags")

  private def tagBase(lines: Seq[String]): Option[Int] =
    lines.find(_.startsWith("#tagbase:"))
      .map(_.stripPrefix("#tagbase:").toInt)

  /** FULL committed-tag set of a snapshot: checkpoint base + suffix. */
  private def resolveTags(spark: SparkSession, root: String,
      lines: Seq[String]): Seq[String] = {
    val suffix = txnTags(lines)
    tagBase(lines) match {
      case None => suffix
      case Some(w) =>
        val f = fs(spark, root)
        val p = tagsFilePath(root, w)
        val base =
          if (f.exists(p)) {
            val in = f.open(p)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().filter(_.nonEmpty).toList
            finally in.close()
          } else resolveTags(spark, root, snapshotLines(spark, root, w))
        (base ++ suffix).distinct
    }
  }

  private def writeTagsFileIfAbsent(spark: SparkSession, root: String,
      w: Int, tags: Seq[String]): Unit = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    // same seam as the commit point; a lost race means a racer wrote
    // the identical bytes (pure function of committed manifest w)
    activeStore.putIfAbsent(f, tagsFilePath(root, w),
      (tags.mkString("\n") + "\n").getBytes("UTF-8"))
    ()
  }

  // ---- column mapping: rename/drop as metadata (r16) ----------------
  // #schema names are LOGICAL; data files are written under stable
  // PHYSICAL column names. `#colmap:log=phys,...` (identity entries
  // omitted; names restricted to plain identifiers) maps one to the
  // other, so RENAME is a manifest-only commit — the Delta/Iceberg
  // column-id shape: at 100 TB a rename must not rewrite the table —
  // and DROP hides a column without touching a byte (`#physdrop:`
  // lines retire the storage name forever, so a later ADD of the same
  // logical name maps to a FRESH physical and can never resurrect the
  // dropped column's bytes). Reads translate: the parquet scan gets
  // the physical schema, the frame renames back to logical; stats
  // fields record under PHYSICAL names (old and new files agree), and
  // every prune surface translates its predicate column through the
  // snapshot's own colmap. Time travel needs nothing special — each
  // version's manifest carries its own #schema + #colmap.

  private def requirePlainName(c: String): Unit =
    require(c.nonEmpty && !c.exists(ch => ch == ':' || ch == '\t' ||
        ch == '\n' || ch == ',' || ch == '='),
      s"column name must be a plain identifier (no ':,=' or tab): '$c'")

  private[graft] def colmapOf(lines: Seq[String]): Map[String, String] =
    lines.find(_.startsWith("#colmap:")).map {
      _.stripPrefix("#colmap:").split(',').map { kv =>
        val i = kv.indexOf('=')
        kv.take(i) -> kv.drop(i + 1)
      }.toMap
    }.getOrElse(Map.empty)

  private def physDrops(lines: Seq[String]): Set[String] =
    lines.collect { case l if l.startsWith("#physdrop:") =>
      l.stripPrefix("#physdrop:") }.toSet

  private def colmapLines(cm: Map[String, String],
      drops: Set[String]): Seq[String] =
    (if (cm.isEmpty) Nil
     else Seq("#colmap:" + cm.toSeq.sorted
       .map { case (l, p) => s"$l=$p" }.mkString(","))) ++
      drops.toSeq.sorted.map("#physdrop:" + _)

  /** The physical (storage) name of logical column `c`. */
  private def physName(cm: Map[String, String], c: String): String =
    cm.getOrElse(c, c)

  /** Rename `df`'s columns logical→physical for staging. */
  private def physicalize(df: DataFrame, cm: Map[String, String]): DataFrame =
    if (cm.isEmpty) df
    else df.select(df.columns.map(c =>
      col(s"`$c`").as(cm.getOrElse(c, c))).toSeq: _*)

  /** colmap additions for schema evolution: a batch-only logical name
    * that collides with a USED physical (another column's storage, or
    * a dropped column's retired name) gets a fresh physical
    * `<name>_r<v>`; everything else stays identity. */
  private def evolveColmap(cm: Map[String, String], drops: Set[String],
      committed: Option[StructType], evolved: StructType,
      v: Int): Map[String, String] = {
    val existing = committed.map(_.fieldNames.toSet).getOrElse(Set.empty)
    val used = cm.values.toSet ++ drops ++
      existing.map(l => cm.getOrElse(l, l))
    val fresh = evolved.fieldNames
      .filterNot(existing).filterNot(cm.contains)
    cm ++ fresh.collect { case l if used.contains(l) => l -> s"${l}_r$v" }
  }

  /** Meta lines for the NEXT commit built on `prevLines` (the head the
    * attempt restages against): #schema, the commit's own #kind (the
    * verb that produced it — NOT carried forward; each version records
    * what made it, the DESCRIBE HISTORY primitive), the column-mapping
    * block (#colmap/#physdrop — carried forward verbatim unless the
    * commit overrides it), then the tag block — carried forward as
    * (#tagbase + suffix), rolling a new checkpoint at `prevV` when the
    * suffix would exceed [[tagCheckpointEvery]]. */
  private def metaForNext(spark: SparkSession, root: String, prevV: Int,
      prevLines: Seq[String], schema: StructType,
      addTags: Seq[String] = Nil, kind: String = "",
      colmapOverride: Option[Map[String, String]] = None,
      dropsOverride: Option[Set[String]] = None): Seq[String] = {
    val suffix = (txnTags(prevLines) ++ addTags).distinct.sorted
    val base = tagBase(prevLines)
    val head = Seq(s"#schema:${schema.json}") ++
      (if (kind.nonEmpty) Seq(s"#kind:$kind") else Nil) ++
      colmapLines(
        colmapOverride.getOrElse(colmapOf(prevLines))
          .filter { case (l, p) => l != p },
        dropsOverride.getOrElse(physDrops(prevLines)))
    if (prevV >= 1 && suffix.size > tagCheckpointEvery) {
      writeTagsFileIfAbsent(spark, root, prevV,
        resolveTags(spark, root, prevLines).distinct.sorted)
      head ++ (s"#tagbase:$prevV" +:
        addTags.distinct.sorted.map(t => s"#txn:$t"))
    } else
      head ++ (base.map(w => s"#tagbase:$w").toSeq ++
        suffix.map(t => s"#txn:$t"))
  }

  // ---- head pointer -------------------------------------------------
  // `_manifests/_latest` holds the last published version as a HINT
  // (Delta's _last_checkpoint discipline): written best-effort AFTER a
  // winning publish, so it may be stale (a racer published since, a
  // crash landed between rename and hint write) or absent (pre-pointer
  // tables, the delete→rename swap window). Readers therefore treat it
  // as a LOWER BOUND only — verify the hinted manifest exists, then
  // probe FORWARD until the next version is missing. Head resolution
  // is O(1 + lag) exists-probes instead of an O(versions) directory
  // listing (the r12 verdict's one remaining O(versions) read path);
  // any corrupt/missing/backward hint falls back to the full listing,
  // so the pointer can never change WHAT the head is, only how fast
  // it resolves.

  private def latestPath(root: String) = new Path(manifestDir(root), "_latest")

  private def readLatestHint(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val p = latestPath(root)
    if (!f.exists(p)) return 0
    try {
      val in = f.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val v = s.toInt
      if (v >= 1) v else 0
    } catch { case scala.util.control.NonFatal(_) => 0 } // hint only
  }

  /** Advance the head hint to `v` (never backwards). Whole-file content
    * swap via tmp+delete+rename — a reader in the swap window sees a
    * missing hint and falls back to the listing; every failure mode is
    * recoverable because the hint is advisory. */
  private def writeLatestHint(spark: SparkSession, root: String,
      v: Int): Unit =
    try {
      if (readLatestHint(spark, root) >= v) return
      val f = fs(spark, root)
      val tmp = new Path(manifestDir(root),
        s".tmp-${java.util.UUID.randomUUID().toString}")
      val os = f.create(tmp, false)
      try os.write(s"$v\n".getBytes("UTF-8")) finally os.close()
      val target = latestPath(root)
      f.delete(target, false)
      if (!f.rename(tmp, target)) f.delete(tmp, false) // racer won — fine
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort

  /** Highest committed version, 0 if the table has none. Resolution:
    * verified `_latest` hint + forward probe (O(1 + publish lag)),
    * falling back to the full `_manifests/` listing when the hint is
    * absent, stale past an expiry, or unparsable. */
  def currentVersion(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) return 0
    val hint = readLatestHint(spark, root)
    if (hint > 0 && f.exists(manifestPath(root, hint))) {
      var v = hint
      while (f.exists(manifestPath(root, v + 1))) v += 1
      v
    } else
      f.listStatus(dir).map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
        .foldLeft(0)(math.max)
  }

  /** Committed versions still present (expiry leaves holes at the
    * tail): the manifest listing, parsed once — maintenance surfaces
    * ([[vacuum]], [[expireManifests]]) iterate THIS, never 1..head. */
  private def survivingVersions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .sorted.toSeq
  }

  /** One manifest entry: a data file plus per-column min/max of the
    * table's DECLARED stats columns within that file — the
    * Iceberg/Delta file-skipping metadata (Delta records 32 columns by
    * default; here the writer declares which). Stats are NAMED in the
    * manifest line (`path TAB col:min:max TAB col2:...`), so a reader
    * can verify a predicate column against what was actually recorded
    * instead of trusting the caller's claim — the r12-advice hazard
    * where pruning on a column whose stats were never collected
    * silently skipped files. Legacy unnamed lines (`path TAB min TAB
    * max`) parse under the reserved name "" and are honored by the
    * read-side range APIs but never by row-level commit pruning. */
  final case class Entry(path: String, stats: Map[String, (Double, Double)],
      nulls: Map[String, Long] = Map.empty,
      blooms: Map[String, (Int, Array[Byte])] = Map.empty,
      strStats: Map[String, (String, String)] = Map.empty,
      strBlooms: Map[String, (Int, Array[Byte])] = Map.empty,
      dvs: Seq[String] = Nil) {
    /** Recorded range of `c`, falling back to a legacy unnamed range. */
    def statsFor(c: String): Option[(Double, Double)] =
      stats.get(c).orElse(stats.get(""))
    /** Range recorded FOR THIS NAME only — the row-level prune gate. */
    def namedStats(c: String): Option[(Double, Double)] = stats.get(c)
    /** NULL count recorded for `c` within this file, when the writer
      * declared it (r13+ manifests; min/max ignore NULLs, so
      * metadata-only decisions about "every row matches" need this —
      * Delta records nullCount for the same reason). */
    def nullsFor(c: String): Option[Long] = nulls.get(c)
    /** Bloom filter recorded for `c` within this file — (hash count,
      * bit buffer); the point-key prune gate
      * ([[graft.functions.Bloom]], r14+ manifests). */
    def bloomFor(c: String): Option[(Int, Array[Byte])] = blooms.get(c)
    /** STRING min/max recorded for `c` (r15+ manifests,
      * `c:str:b64lo:b64hi:nulls` fields) — binary UTF8 ordering, the
      * Iceberg string-bound shape: a string-typed stats column records
      * its raw bounds instead of TRY_CAST-to-double NULLs. */
    def strStatsFor(c: String): Option[(String, String)] = strStats.get(c)
    /** String-key bloom recorded for `c` (r15+, `c:bfs:k:b64` fields —
      * raw UTF-8 byte hashing; the GDPR UUID/user-id prune gate). */
    def strBloomFor(c: String): Option[(Int, Array[Byte])] = strBlooms.get(c)
  }

  /** Manifest file `v` VERBATIM — meta lines plus, for a delta
    * manifest, its `#base`/`#rm`/add action lines rather than the full
    * snapshot (see the delta-log section above). */
  private def rawLines(spark: SparkSession, root: String,
      v: Int): Seq[String] = {
    val f = fs(spark, root)
    val p = manifestPath(root, v)
    if (!f.exists(p))
      sys.error(s"Txn: version $v at $root was never committed or has " +
        "been expired (expireManifests) — time travel reaches only the " +
        "retained window")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** LOGICAL manifest lines of snapshot `v`: the manifest's meta block
    * (minus the internal `#base`/`#rm` delta encoding) followed by the
    * RESOLVED data lines — exactly what a pre-delta-log full manifest
    * held, so every consumer (entries, reads, history, carry-verbatim
    * assertions) is format-agnostic. */
  private def snapshotLines(spark: SparkSession, root: String,
      v: Int): Seq[String] = {
    val raw = rawLines(spark, root, v)
    if (baseOf(raw).isEmpty) raw
    else raw.filter(l => isMeta(l) && !l.startsWith("#base:") &&
      !l.startsWith("#rm:")) ++ resolvedData(spark, root, v)
  }

  /** Logical manifest lines of snapshot `v` — test/debug visibility
    * into the meta block (tag checkpointing, carried-verbatim
    * entries). */
  private[graft] def snapshotLines0(spark: SparkSession, root: String,
      v: Int): Seq[String] = snapshotLines(spark, root, v)

  /** Raw manifest FILE lines of `v` (delta action encoding included) —
    * the spec surface that pins commit write cost ∝ touched files. */
  private[graft] def rawManifestLines0(spark: SparkSession, root: String,
      v: Int): Seq[String] = rawLines(spark, root, v)

  /** Parse ONE manifest data line into an [[Entry]]
    * (path [TAB col:min:max[:nulls]]... | legacy path TAB min TAB max). */
  private def parseEntryLine(line: String): Entry =
    line.split('\t') match {
      case Array(p) => Entry(p, Map.empty)
      case Array(p, lo, hi)
          if !lo.contains(':') && !hi.contains(':') =>
        Entry(p, Map("" -> (lo.toDouble, hi.toDouble))) // legacy unnamed
      case arr if arr.length >= 2 =>
        val blooms =
          scala.collection.mutable.Map.empty[String, (Int, Array[Byte])]
        val strBloomsM =
          scala.collection.mutable.Map.empty[String, (Int, Array[Byte])]
        val strStatsM =
          scala.collection.mutable.Map.empty[String, (String, String)]
        val strNullsM = scala.collection.mutable.Map.empty[String, Long]
        val dvsM = scala.collection.mutable.ArrayBuffer.empty[String]
        def b64dec(x: String) = java.util.Base64.getDecoder.decode(x)
        val fields = arr.tail.flatMap { f =>
          f.split(':') match {
            case Array("__dv", b64) => // deletion-vector sidecar (r16+)
              dvsM += new String(b64dec(b64), "UTF-8")
              None
            case Array(c, "bf", k, b64) => // numeric bloom (r14+)
              blooms(c) = (k.toInt, b64dec(b64))
              None
            case Array(c, "bfs", k, b64) => // string bloom (r15+)
              strBloomsM(c) = (k.toInt, b64dec(b64))
              None
            case Array(c, "str", lo, hi, n) => // string range (r15+)
              strStatsM(c) = (new String(b64dec(lo), "UTF-8"),
                new String(b64dec(hi), "UTF-8"))
              strNullsM(c) = n.toLong
              None
            case Array(c, lo, hi) =>
              Some((c, (lo.toDouble, hi.toDouble), None: Option[Long]))
            case Array(c, lo, hi, n) =>
              Some((c, (lo.toDouble, hi.toDouble), Some(n.toLong)))
            case _ => sys.error(s"Txn: malformed stats field '$f': $line")
          }
        }
        Entry(arr(0), fields.map(t => t._1 -> t._2).toMap,
          fields.collect { case (c, _, Some(n)) => c -> n }.toMap ++
            strNullsM,
          blooms.toMap, strStatsM.toMap, strBloomsM.toMap, dvsM.toSeq)
      case _ => sys.error(s"Txn: malformed manifest line: $line")
    }

  /** Manifest DATA entries of snapshot `v`. */
  def snapshotEntries(spark: SparkSession, root: String,
      v: Int): Seq[Entry] =
    snapshotLines(spark, root, v).filterNot(isMeta).map(parseEntryLine)

  /** Data-file paths (relative to `root/data`) of snapshot `v`. */
  def snapshotFiles(spark: SparkSession, root: String, v: Int): Seq[String] =
    snapshotEntries(spark, root, v).map(_.path)

  /** Idempotence tags snapshot `v` has ever committed (checkpoint base
    * + manifest suffix). */
  def committedTags(spark: SparkSession, root: String, v: Int): Seq[String] =
    resolveTags(spark, root, snapshotLines(spark, root, v))

  /** Version `v`'s committed `#schema` — ONE small manifest read (the
    * meta block rides every manifest verbatim; no data-chain
    * resolution, no scan construction). None only for pre-schema
    * manifests. The cheap path stream attachment and schema-only
    * callers should take instead of `read(...).schema`. */
  def committedSchema(spark: SparkSession, root: String,
      v: Int): Option[StructType] =
    schemaLine(rawLines(spark, root, v))

  /** One surviving-version row of [[history]]. `kind` is the commit
    * verb recorded at publish time ("" for pre-r13 manifests);
    * `committedAtMs` is the manifest file's mtime — wall-clock
    * metadata, not part of any correctness contract. */
  final case class Commit(version: Int, kind: String, nFiles: Int,
      nTags: Int, committedAtMs: Long)

  /** DESCRIBE HISTORY: every SURVIVING version (expiry leaves holes),
    * newest first, with the verb that produced it, its file count,
    * its manifest-suffix tag count, and the publish wall-clock. Pure
    * driver metadata — one listing plus one small read per surviving
    * manifest, bounded by the retention window after
    * [[expireManifests]]. */
  def history(spark: SparkSession, root: String): Seq[Commit] = {
    val f = fs(spark, root)
    survivingVersions(spark, root).sorted(Ordering[Int].reverse).map { v =>
      val lines = snapshotLines(spark, root, v)
      Commit(v,
        lines.find(_.startsWith("#kind:"))
          .map(_.stripPrefix("#kind:")).getOrElse(""),
        lines.count(!isMeta(_)),
        txnTags(lines).size,
        f.getFileStatus(manifestPath(root, v)).getModificationTime)
    }
  }

  /** Write `df`'s files under attempt-unique names; returns their
    * manifest lines (root-relative path, plus TAB-separated
    * `col:min:max` per declared stats column) WITHOUT publishing
    * anything. However many columns are declared, stats come from ONE
    * distributed pass grouped by input_file_name — the driver receives
    * only (file, min1, max1, ...), bounded by file count.
    *
    * LAYOUT (r15): an UNPARTITIONED batch lands under its own batch
    * dir `data/<batchTag>/part-*`; a PARTITIONED batch is RE-ROOTED so
    * the partition dirs sit OUTSIDE the batch segment —
    * `data/k=v/<batchTag>-part-*` — because that is what lets a
    * snapshot spanning hundreds of commits read as ONE scan relation
    * (a single `basePath = data` recovers the partition columns for
    * every commit at once; with partition dirs nested INSIDE per-batch
    * dirs, Spark's partition discovery sees a conflicting structure
    * and the read degrades to one relation PER commit — BenchTxnLog
    * measured 201 relations making plan size, not data, the read cost
    * on a 200-append table). Files stay attempt-unique via the
    * batchTag prefix (version + random suffix), so racing committers
    * still cannot collide; the write goes to a hidden
    * `data/.stage-<batchTag>/` dir first and each part file renames
    * into its partition dir — O(files) namespace ops, the same order
    * as the listing this method already does (on an object store the
    * rename is a copy; Delta/Iceberg avoid it by naming files at write
    * time, which Spark's partitionBy writer does not expose).
    * A crash mid-rename leaves unreferenced files only — [[vacuum]]
    * reclaims both the stage dir and any moved-but-unpublished files
    * past retention, exactly like a lost batch dir. */
  private def stageBatch(spark: SparkSession, root: String, df0: DataFrame,
      partitionBy0: Seq[String], batchTag: String,
      statsCols0: Seq[String] = Nil, bloomCols0: Seq[String] = Nil,
      bloomBits: Int = graft.functions.Bloom.DefaultBits,
      colmap: Map[String, String] = Map.empty): Seq[String] = {
    // column mapping (r16): files are written — and stats recorded —
    // under PHYSICAL names, so every file in the table agrees across
    // renames; the caller passes logical names throughout
    val df = physicalize(df0, colmap)
    val partitionBy = partitionBy0.map(physName(colmap, _))
    val statsCols = statsCols0.map(physName(colmap, _))
    val bloomCols = bloomCols0.map(physName(colmap, _))
    (statsCols ++ bloomCols).foreach { c =>
      require(!c.contains(':') && !c.contains('\t') && c.nonEmpty,
        s"stats column name must be a plain identifier (no ':'/tab): '$c'")
    }
    val f = fs(spark, root)
    val base = new Path(s"$root/data").toUri.getPath
    val dir = if (partitionBy.isEmpty) s"$root/data/$batchTag"
      else s"$root/data/.stage-$batchTag"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir)
    def listParts(d: String): Seq[Path] = {
      val it = f.listFiles(new Path(d), true)
      val out = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
          out += st.getPath
      }
      out.toSeq.sortBy(_.toUri.getPath)
    }
    val paths: Seq[String] =
      if (partitionBy.isEmpty)
        listParts(dir).map(_.toUri.getPath.stripPrefix(base)
          .stripPrefix("/"))
      else {
        val stageBase = new Path(dir).toUri.getPath
        val moved = listParts(dir).map { p =>
          val rel = p.toUri.getPath.stripPrefix(stageBase).stripPrefix("/")
          val segs = rel.split('/')
          val target = (segs.init :+ s"$batchTag-${segs.last}")
            .mkString("/")
          val tp = new Path(s"$root/data/$target")
          f.mkdirs(tp.getParent)
          if (!f.rename(p, tp))
            sys.error(s"Txn: failed to place staged file $p at $tp")
          target
        }
        f.delete(new Path(dir), true) // only _SUCCESS/empty dirs remain
        moved.sorted
      }
    // an empty frame stages zero part files — nothing to list or stat;
    // the snapshot stays readable through its #schema line
    if (paths.isEmpty) return Nil
    if (statsCols.isEmpty && bloomCols.isEmpty) paths
    else {
      // The NUMERIC stats surface (this pass, every prune predicate,
      // commitDeleteWhere's row filter) evaluates TRY_CAST(c AS
      // DOUBLE) — total under ANSI mode, and one consistent
      // semantics: a non-numeric string value IS null everywhere.
      // NULLs are therefore counted on the cast column too: counting
      // pre-cast would record nulls=0 for a file holding cast-null
      // rows and let commitDeleteWhere's metadata-only whole-file
      // drop silently delete rows the row-level filter keeps
      // (r13 advice).
      //
      // A STRING-TYPED declared column takes the string path instead
      // (r15): raw min/max in binary UTF8 order + a raw-byte bloom —
      // under the double cast a UUID/user-id column records NOTHING
      // (every value casts NULL; r14 even recorded an all-zero bloom
      // that made point deletes silently no-op, the r14-advice bug),
      // so the realistic GDPR key shape never pruned. Type dispatch
      // happens on the read-back schema — the same frame the
      // aggregates evaluate over. A partitioned batch's files were
      // re-rooted above, so they read back by explicit path with the
      // data dir as basePath (recovering partition columns, the same
      // shape the snapshot read uses).
      // EXPLICIT schema — the frame just written — so type dispatch
      // matches the writer's types: inference on a partitioned
      // read-back would re-infer partition-column types (a STRING
      // partition column with date-like values infers DateType,
      // making isStr false and silently recording no string stats for
      // it — r15 advice)
      val src =
        if (partitionBy.isEmpty) spark.read.schema(df.schema).parquet(dir)
        else spark.read.schema(df.schema).option("basePath", s"$root/data")
          .parquet(paths.map(r => s"$root/data/$r"): _*)
      def isStr(c: String): Boolean =
        src.schema(c).dataType == org.apache.spark.sql.types.StringType
      val aggs = statsCols.flatMap { c =>
        if (isStr(c)) Seq(
          min(col(c)).as(s"__lo_$c"),
          max(col(c)).as(s"__hi_$c"),
          count(when(col(c).isNull, 1)).as(s"__nn_$c"))
        else Seq(
          min(col(c).try_cast("double")).as(s"__lo_$c"),
          max(col(c).try_cast("double")).as(s"__hi_$c"),
          count(when(col(c).try_cast("double").isNull, 1)).as(s"__nn_$c"))
      } ++
        // bloom bits ride the SAME single pass — one more map-side-
        // combinable aggregate per declared bloom column
        bloomCols.map(c => graft.functions.BloomStats.agg(spark,
          if (isStr(c)) col(c) else col(c).try_cast("double"),
          bloomBits).as(s"__bf_$c"))
      val stats = src
        .groupBy(input_file_name().as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect() // bounded by file count — manifest metadata, not data
        .map { r =>
          // input_file_name() yields a URL-ENCODED URI string (space →
          // %20, a literal '%' in an escaped partition dir → %25…);
          // the listing side above decodes once via Path→URI. Wrapping
          // this string in new Path(...) treats it as RAW and
          // re-escapes, so escaped/space partition values never match
          // and their stats silently drop (r10 advice; spec-pinned).
          // Parse it as the URI it is — one decode, same routine as
          // the listing side's getPath.
          val p = r.getString(0)
          val decoded =
            try new java.net.URI(p).getPath
            catch { case _: java.net.URISyntaxException =>
              new Path(p).toUri.getPath }
          val rel = decoded.stripPrefix(base).stripPrefix("/")
          // a column all-NULL within a file records no range for it —
          // readers treat missing stats as "cannot skip", never a
          // filter; present ranges also carry the file's NULL count
          // (min/max ignore NULLs, so "every row is in range" needs it)
          // a NaN bound is never recorded either (r13 advice): Spark's
          // max treats NaN as largest, but the driver-side prunes use
          // JVM comparisons where NaN >= lo is false — a recorded NaN
          // range would silently SKIP a file holding in-range rows.
          // No range recorded = "cannot skip", the safe direction.
          val fields = statsCols.zipWithIndex.flatMap { case (c, i) =>
            if (r.isNullAt(1 + 3 * i) || r.isNullAt(2 + 3 * i)) None
            else if (isStr(c)) {
              // string bounds ship base64'd (the field grammar is
              // ':'/tab-delimited; base64's alphabet avoids both) —
              // but a long-string stats column would bloat the
              // manifest per file, so bounds past 256 UTF-8 bytes
              // record no range (the bloom still prunes; Iceberg
              // solves this with truncate+increment, which is subtle
              // to get right across code points — skipping is the
              // conservative option)
              val (lo, hi) = (r.getString(1 + 3 * i), r.getString(2 + 3 * i))
              val (lb, hb) = (lo.getBytes("UTF-8"), hi.getBytes("UTF-8"))
              if (lb.length > 256 || hb.length > 256) None
              else {
                val e = java.util.Base64.getEncoder
                Some(s"$c:str:${e.encodeToString(lb)}:" +
                  s"${e.encodeToString(hb)}:${r.getLong(3 + 3 * i)}")
              }
            } else {
              val (lo, hi) = (r.getDouble(1 + 3 * i), r.getDouble(2 + 3 * i))
              if (lo.isNaN || hi.isNaN) None
              else Some(s"$c:$lo:$hi:${r.getLong(3 + 3 * i)}")
            }
          } ++ bloomCols.zipWithIndex.map { case (c, j) =>
            // an all-(cast-)null column yields an all-zero filter,
            // which correctly answers "no non-null key is in this
            // file"
            val b = r.getAs[Array[Byte]](1 + 3 * statsCols.size + j)
            val tag = if (isStr(c)) "bfs" else "bf"
            s"$c:$tag:${graft.functions.Bloom.DefaultHashes}:" +
              java.util.Base64.getEncoder.encodeToString(b)
          }
          rel -> fields
        }.toMap
      paths.map { p =>
        stats.get(p).filter(_.nonEmpty)
          .fold(p)(fields => (p +: fields).mkString("\t"))
      }
    }
  }

  /** Attempt-unique batch directory name: the version makes it
    * human-traceable, the random suffix makes it COLLISION-FREE when
    * two committers race the same version number — the loser's staged
    * files can never be overwritten by (or confused with) the
    * winner's, they just become vacuum-able orphans. */
  private def batchDir(v: Int): String =
    f"b$v%05d-" + java.util.UUID.randomUUID().toString.take(8)

  // ---- commit seam: the ONE atomicity the protocol needs (r15) -------
  // Everything the commit protocol requires of storage is a single
  // primitive: CREATE THIS FILE UNLESS IT EXISTS, atomically — S3's
  // conditional PUT (If-None-Match), GCS's x-goog-if-generation-match:0,
  // HDFS's server-side rename-no-overwrite all provide it. Extracting
  // it as [[TxnLogStore.putIfAbsent]] makes that dependency a stated
  // contract instead of an implementation detail buried in publish():
  // TxnLogStoreSpec proves the protocol commits exactly once on a
  // store offering ONLY conditional-put (no rename at all), and that
  // a store which CLOBBERS instead of refusing breaks it — i.e. the
  // boundary is exactly this method. Deployment note: on S3, implement
  // putIfAbsent with a conditional PUT (one call); the default
  // Hadoop-rename impl below covers HDFS-class stores and local
  // filesystems (with the in-JVM claim lock — cross-PROCESS local
  // writers remain out of scope, the Delta LocalLogStore boundary).

  /** Storage seam for the commit point: atomically create `target`
    * with `content` — true iff THIS call created it. Implementations
    * must be atomic (a lost racer sees false, never a torn file);
    * content visibility must be all-or-nothing. */
  trait TxnLogStore {
    def putIfAbsent(f: FileSystem, target: Path,
        content: Array[Byte]): Boolean
  }

  /** Default store: write a hidden temp file, then rename-no-overwrite
    * onto `target` — the rename IS the claim. On HDFS the refusal is
    * atomic server-side; Hadoop's LOCAL rename refusal is an
    * exists-check over clobbering rename(2) (POSIX), so two same-JVM
    * committers racing that window could BOTH win (observed once in
    * the six-thread soak; TxnRenameProbe pins the single-threaded
    * contract) — `file:` URIs additionally serialize the
    * exists+rename pair in-JVM. Cross-JVM local racers stay out of
    * scope — the same single-machine boundary Delta's LocalLogStore
    * draws. */
  object HadoopRenameLogStore extends TxnLogStore {
    private val localClaimLock = new Object
    override def putIfAbsent(f: FileSystem, target: Path,
        content: Array[Byte]): Boolean = {
      if (f.exists(target)) return false
      val tmp = new Path(target.getParent,
        s".tmp-${java.util.UUID.randomUUID().toString}")
      val os = f.create(tmp, false)
      try os.write(content) finally os.close()
      def claim(): Boolean = !f.exists(target) && f.rename(tmp, target)
      val local = f.getUri.getScheme == null || f.getUri.getScheme == "file"
      val won = if (local) localClaimLock.synchronized(claim()) else claim()
      if (!won) f.delete(tmp, false)
      won
    }
  }

  /** The deployment store — reassign ONCE at startup to plug in an
    * object-store impl (e.g. an S3 conditional-put store); never
    * toggled at runtime. */
  @volatile var logStore: TxnLogStore = HadoopRenameLogStore

  /** TEST SEAM: thread-confined store override (the raceOnce
    * discipline — ScalaTest suites share one JVM and run in PARALLEL,
    * so swapping the global `logStore` would route UNRELATED suites'
    * commits through a fake/broken store for the window; observed
    * failure class pinned at raceOnce). INHERITABLE so a spec's own
    * worker pool — whose threads are created inside the test — sees
    * the override, while pre-existing threads of other suites never
    * do. Never set outside tests. */
  private[graft] val logStoreOverride:
      InheritableThreadLocal[Option[TxnLogStore]] =
    new InheritableThreadLocal[Option[TxnLogStore]] {
      override def initialValue(): Option[TxnLogStore] = None
    }

  /** Test seams are consulted ONLY under `-Dgraft.txn.test-seams=true`
    * (set by the build for forked test JVMs): the override is an
    * InheritableThreadLocal, so a long-lived pool spawned while one
    * was set would inherit it permanently — gating on the property
    * means a production JVM can never route a commit through a leaked
    * fake store (r15 advice). */
  private[graft] val testSeamsEnabled: Boolean =
    java.lang.Boolean.getBoolean("graft.txn.test-seams")

  private def activeStore: TxnLogStore =
    if (testSeamsEnabled) logStoreOverride.get().getOrElse(logStore)
    else logStore

  /** Atomically publish `lines` as version `v` (expects `v` free).
    * Returns false when another committer already took `v`. */
  private def publish(spark: SparkSession, root: String, v: Int,
      lines: Seq[String]): Boolean = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    // putIfAbsent IS the commit point (see the commit-seam section and
    // TxnRenameProbe for the default store's exact contract)
    val won = activeStore.putIfAbsent(f, manifestPath(root, v),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    if (won) { // best-effort advisories, after the commit point
      writeLatestHint(spark, root, v)
      maybeCheckpoint(spark, root, v)
    }
    won
  }

  /** Commit `df` as the COMPLETE new snapshot (full overwrite).
    * `statsCol`/`statsCols` (numeric) record per-file min/max in the
    * manifest for [[readWhere]]/[[readWhereAll]] file skipping — any
    * number of columns, still ONE stats pass. Idempotence tags
    * committed by earlier versions carry forward — a rewrite does not
    * reopen already-committed micro-batches. */
  def commitOverwrite(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, maxRetries: Int = 5,
      statsCol: Option[String] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Int =
    retry(spark, root, maxRetries) { v =>
      val prev = headMetaLines(spark, root, v - 1)
      // an overwrite IS the complete listing — a baseless full
      // manifest, which also resets the delta chain for free; it
      // references no prior files, so the column mapping resets to
      // identity (old versions keep their own #colmap for time travel)
      metaForNext(spark, root, v - 1, prev, df.schema,
          kind = "overwrite", colmapOverride = Some(Map.empty),
          dropsOverride = Some(Set.empty)) ++
        stageBatch(spark, root, df, partitionBy, batchDir(v),
          (statsCol.toSeq ++ statsCols).distinct, bloomCols)
    }

  /** Commit `df` as an APPEND: new snapshot = previous files + df's.
    *
    * Schema discipline (the Delta mergeSchema gate, enforced at the
    * COMMIT point where it can still fail loudly): by default the
    * appended frame's (name → type) map must equal the table's
    * committed `#schema` — a renamed or re-typed column is a writer
    * bug and throws instead of silently producing half-NULL columns
    * downstream. Pass `mergeSchema = true` for INTENTIONAL evolution:
    * snapshot reads then fill columns missing from older (or newer)
    * files with NULL per file-group, and time travel still returns
    * each version's original shape. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, maxRetries: Int = 5,
      statsCol: Option[String] = None, mergeSchema: Boolean = false,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Int =
    retry(spark, root, maxRetries) { v =>
      val prev = headMetaLines(spark, root, v - 1)
      if (!mergeSchema) requireSameSchema(prev, df, "commitAppend")
      // mergeSchema commits the EVOLVED schema (committed ∪ batch,
      // types widened where the batch is wider) — committing df.schema
      // verbatim would silently NARROW the table when the batch lacks
      // committed columns, and would flip-flop types across appends
      val schema =
        if (!mergeSchema) df.schema
        else schemaLine(prev)
          .map(evolveSchema(_, df.schema, "commitAppend"))
          .getOrElse(df.schema)
      val cm = evolveColmap(colmapOf(prev), physDrops(prev),
        schemaLine(prev), schema, v)
      metaForNext(spark, root, v - 1, prev, schema,
          kind = "append", colmapOverride = Some(cm)) ++
        deltaLines(v - 1, Nil,
          stageBatch(spark, root, df, partitionBy, batchDir(v),
            (statsCol.toSeq ++ statsCols).distinct, bloomCols,
            colmap = cm))
    }

  /** Fail loudly when an (un-merged) append's schema drifts from the
    * table's committed one — compares (name → dataType), ignoring
    * nullability and column order. No-op when the table has no schema
    * line yet (first commit, or pre-schema manifests). */
  private def requireSameSchema(prevLines: Seq[String], df: DataFrame,
      who: String): Unit =
    schemaLine(prevLines).foreach { committed =>
      def m(s: StructType) = s.fields.map(f => f.name -> f.dataType).toMap
      val (a, b) = (m(committed), m(df.schema))
      require(a == b,
        s"$who: schema drift without mergeSchema=true — table has " +
          s"${a.toSeq.sortBy(_._1).mkString(", ")}; batch has " +
          s"${b.toSeq.sortBy(_._1).mkString(", ")}")
    }

  // ---- schema evolution: add-column + type WIDENING (r15) ------------
  // mergeSchema=true commits evolve the #schema line through
  // [[evolveSchema]]: new columns append (the r10 behavior), and a
  // batch column WIDER than its committed counterpart widens the
  // committed type (int→long, float→double, int→double, decimal
  // growth — the Delta type-widening set). Old files stay readable
  // because snapshot reads pass the committed schema EXPLICITLY to the
  // parquet reader, which up-casts narrow physical types at scan time
  // (Spark 4 widening promotion) and NULL-fills missing columns —
  // mergeSchema footer-merging would refuse an int/long mix outright,
  // which is also why reads stopped using it wherever a #schema line
  // exists. Time travel still returns each version's original types
  // (read(v) uses v's OWN schema line). Everything else — rename,
  // narrowing the COMMITTED type, string→int — stays a loud reject:
  // those are writer bugs, not evolution.

  import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType,
    FloatType, IntegerType, LongType, ShortType}

  private val intChain: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType)

  /** True when a value of `from` reads up losslessly as `to` AND the
    * parquet reader performs that promotion at scan time (verified
    * set; long→double is excluded — lossy past 2^53). */
  private[graft] def widensTo(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (f, t) if intChain.contains(f) && intChain.contains(t) =>
        intChain.indexOf(f) < intChain.indexOf(t)
      case (FloatType, DoubleType) => true
      case (f, DoubleType) if intChain.contains(f) && f != LongType => true
      case (f: DecimalType, t: DecimalType) =>
        t.precision - t.scale >= f.precision - f.scale &&
          t.scale >= f.scale &&
          (t.precision > f.precision || t.scale > f.scale)
      case _ => false
    }

  /** The evolved #schema for a mergeSchema=true write: committed
    * fields in committed order (widened where the batch is wider;
    * unchanged where the batch is narrower — the batch's files read
    * up), then batch-only fields appended. Incompatible retypes throw
    * at the COMMIT point, where they can still fail loudly. */
  private def evolveSchema(committed: StructType, batch: StructType,
      who: String): StructType = {
    val byName = batch.fields.map(f => f.name -> f).toMap
    val kept = committed.fields.map { cf =>
      byName.get(cf.name) match {
        case None => cf
        case Some(bf) if bf.dataType == cf.dataType => cf
        case Some(bf) if widensTo(cf.dataType, bf.dataType) =>
          cf.copy(dataType = bf.dataType)
        case Some(bf) if widensTo(bf.dataType, cf.dataType) => cf
        case Some(bf) => sys.error(
          s"$who: incompatible type change for column '${cf.name}': " +
            s"${cf.dataType.simpleString} -> ${bf.dataType.simpleString}" +
            " — mergeSchema evolves add-column and widenings " +
            "(byte/short/int->long, float->double, int->double, " +
            "decimal growth) only; rename/narrow/retype is a writer bug")
      }
    }
    StructType(kept ++
      batch.fields.filterNot(f => committed.fieldNames.contains(f.name)))
  }

  /** RENAME a column as a METADATA-ONLY commit (Delta/Iceberg column
    * mapping): the new head's #schema carries the new logical name and
    * #colmap maps it to the column's stable PHYSICAL (storage) name —
    * no data file moves, a 100 TB rename costs one manifest write.
    * Reads under the new name (including stats/bloom pruning — stats
    * record under physical names) work across ALL files, old and new;
    * appends after the rename write under the new logical name; time
    * travel returns each version's own names. Renaming to an existing
    * logical name throws. Returns the new version. */
  def renameColumn(spark: SparkSession, root: String, from: String,
      to: String, maxRetries: Int = 5): Int = {
    requirePlainName(to)
    retry(spark, root, maxRetries) { v =>
      require(v >= 2, s"Txn.renameColumn: no committed version at $root")
      val prev = headMetaLines(spark, root, v - 1)
      val committed = schemaLine(prev).getOrElse(
        sys.error(s"Txn.renameColumn: no #schema line at $root"))
      require(committed.fieldNames.contains(from),
        s"Txn.renameColumn: unknown column '$from'")
      require(!committed.fieldNames.contains(to),
        s"Txn.renameColumn: column '$to' already exists")
      val cm = colmapOf(prev)
      val ncm = (cm - from) + (to -> physName(cm, from))
      val schema = StructType(committed.fields.map(f =>
        if (f.name == from) f.copy(name = to) else f))
      metaForNext(spark, root, v - 1, prev, schema,
          kind = s"rename:$from:$to", colmapOverride = Some(ncm)) ++
        deltaLines(v - 1, Nil, Nil)
    }
  }

  /** DROP a column as a METADATA-ONLY commit: the new head's #schema
    * omits it and its physical name is RETIRED (`#physdrop`), so reads
    * never materialize the bytes and a later add of the same logical
    * name maps to a fresh physical — the dropped column's data can
    * never resurrect (physical erasure of the bytes themselves =
    * a later rewrite + [[vacuum]], the same boundary as row deletes).
    * Refuses when a live DV sidecar keys on the column (its masks
    * could no longer apply — compact first) and when it would drop the
    * last column. Returns the new version. */
  def dropColumn(spark: SparkSession, root: String, name: String,
      maxRetries: Int = 5): Int =
    retry(spark, root, maxRetries) { v =>
      require(v >= 2, s"Txn.dropColumn: no committed version at $root")
      val prev = headMetaLines(spark, root, v - 1)
      val committed = schemaLine(prev).getOrElse(
        sys.error(s"Txn.dropColumn: no #schema line at $root"))
      require(committed.fieldNames.contains(name),
        s"Txn.dropColumn: unknown column '$name'")
      require(committed.fields.length >= 2,
        s"Txn.dropColumn: cannot drop the last column '$name'")
      val cm = colmapOf(prev)
      val phys = physName(cm, name)
      // a surviving DV sidecar keyed on this column could no longer
      // anti-mask — silent row resurrection; bounded check: one
      // parquet-footer schema read per DISTINCT live sidecar
      val headData = snapshotLines(spark, root, v - 1).filterNot(isMeta)
      dvByPath(headData).values.flatten.toSet.foreach { (dv: String) =>
        require(!spark.read.parquet(s"$root/data/$dv")
            .schema.fieldNames.contains(phys),
          s"Txn.dropColumn: live deletion-vector sidecar $dv keys on " +
            s"'$name' — compact (materialize the DVs) before dropping")
      }
      metaForNext(spark, root, v - 1, prev,
          StructType(committed.fields.filterNot(_.name == name)),
          kind = s"drop:$name", colmapOverride = Some(cm - name),
          dropsOverride = Some(physDrops(prev) + phys)) ++
        deltaLines(v - 1, Nil, Nil)
    }

  /** IDEMPOTENT tagged append — the exactly-once streaming-sink
    * primitive (Delta's txnAppId/txnVersion dedup): the committed-tag
    * set rides IN the manifest as `#txn:` lines and survives every
    * commit type — including full rewrites/compactions, which is
    * exactly where a path-prefix check would forget history and let a
    * replayed micro-batch double-append. If the head already carries
    * the tag, the commit short-circuits to None WITHOUT staging.
    * Single writer per tag assumed (a streaming query IS single-writer
    * per checkpoint); distinct tags from concurrent writers serialize
    * through the optimistic-rename retry like any other commit. */
  def commitAppendIdempotent(spark: SparkSession, root: String,
      df: DataFrame, tag: String, partitionBy: Seq[String] = Nil,
      maxRetries: Int = 5): Option[Int] = {
    require(tag.nonEmpty && !tag.exists(c => c == '\n' || c == '\t'),
      s"tag must be a non-empty single-line token: $tag")
    var attempt = 0
    while (attempt < maxRetries) {
      val v = currentVersion(spark, root) + 1
      val prev = headMetaLines(spark, root, v - 1)
      // already committed — by history or by a racer we lost to. None
      // WITHOUT publishing: the pre-fix branch published a brand-new
      // no-op version here (lines identical to the head), which was
      // indistinguishable from a real append for the caller and
      // padded history with a spurious version (r10 advice).
      if (resolveTags(spark, root, prev).contains(tag)) return None
      // a streaming sink's schema is fixed per query — drift here is
      // always a bug, so the strict gate has no mergeSchema escape
      requireSameSchema(prev, df, "commitAppendIdempotent")
      val lines = metaForNext(spark, root, v - 1, prev, df.schema,
          addTags = Seq(tag), kind = "append_idempotent") ++
        deltaLines(v - 1, Nil,
          stageBatch(spark, root, df, partitionBy, batchDir(v),
            colmap = colmapOf(prev)))
      if (publish(spark, root, v, lines)) return Some(v)
      attempt += 1 // lost the race: head moved; restage against new head
    }
    sys.error(s"Txn: lost the commit race $maxRetries times at $root")
  }

  /** Commit `df` as a PARTITION OVERWRITE on `partitionCol`: the new
    * snapshot replaces exactly the partition values `df` carries and
    * keeps every other partition's files — the dynamic-overwrite
    * semantics of etl_partition_overwrite, made atomic. The replaced
    * set is derived from the STAGED files' own directory segments, so
    * values needing path escaping (Spark writes `a:b` as `a%3Ab`) and
    * the null-partition sentinel compare in exactly the writer's
    * encoding — never a raw-value string match against escaped paths. */
  def commitReplacePartitions(spark: SparkSession, root: String,
      df: DataFrame, partitionCol: String, maxRetries: Int = 5,
      mergeSchema: Boolean = false): Int = {
    var attempt = 0
    var baseV = -1 // the head the FIRST attempt staged against
    while (attempt < maxRetries) {
      val v = currentVersion(spark, root) + 1
      val prev = headMetaLines(spark, root, v - 1)
      // same commit-point schema gate as commitAppend (r10 advice): a
      // partition overwrite KEEPS other partitions' files, so a
      // renamed/re-typed column would otherwise silently swap the
      // table's #schema and NULL-fill the kept files on read — the
      // exact half-NULL hazard the append gate documents
      if (!mergeSchema) requireSameSchema(prev, df, "commitReplacePartitions")
      val staged = stageBatch(spark, root, df, Seq(partitionCol), batchDir(v),
        colmap = colmapOf(prev))
      // path segments carry the PHYSICAL partition name (stable across
      // renames, so pre-rename partitions still match)
      val physPart = physName(colmapOf(prev), partitionCol)
      val replacedSegs = staged.map(linePath).flatMap(_.split("/")
        .find(_.startsWith(physPart + "="))).toSet
      // PARTITION-level write-write conflict detection (the
      // retryRowLevel discipline at directory granularity): after a
      // lost publish, any racing commit that added or removed files
      // in a partition we are replacing would be silently clobbered
      // by our restage (a racer's append into partition X vanishes;
      // a racer's replace of X is overwritten unseen — Delta raises
      // ConcurrentAppend/WriteException on both). Disjoint-partition
      // racers restage as before. Metadata-only check: the racers'
      // file-set deltas' directory segments (read straight off their
      // delta manifests' action lines), never a data read.
      if (baseV < 0) baseV = v - 1
      else if (v - 1 > baseV) {
        val racerSegs = ((baseV + 1) to (v - 1)).iterator.flatMap { rv =>
          val (added, removed) = fileDiff(spark, root, rv)
          (added.iterator ++ removed.iterator)
            .flatMap(_.split("/").find(_.startsWith(physPart + "=")))
        }.toSet
        val overlap = racerSegs & replacedSegs
        if (overlap.nonEmpty) throw new ConcurrentWriteException(
          s"Txn.commitReplacePartitions at $root: concurrent commit(s) " +
            s"v${baseV + 1}..v${v - 1} touched replaced partition(s) " +
            s"${overlap.toSeq.sorted.mkString(", ")} — re-read the new " +
            "head and rerun")
        baseV = v - 1
      }
      val removed =
        if (v == 1) Nil
        else snapshotFiles(spark, root, v - 1).filter { p =>
          p.split("/").exists(replacedSegs.contains)
        }
      val lines = metaForNext(spark, root, v - 1, prev, df.schema,
        kind = "replace_partitions") ++ deltaLines(v - 1, removed, staged)
      raceOnce.get().foreach { hook => raceOnce.set(None); hook() }
      if (publish(spark, root, v, lines)) return v
      attempt += 1 // lost the race: head moved; restage against new head
    }
    sys.error(s"Txn: lost the commit race $maxRetries times at $root")
  }

  /** TABLE COMPACTION: rewrite the head snapshot as one fresh commit —
    * the maintenance fold for a table accreting small files through
    * appends/streaming publishes ([[Compaction]]'s rationale at the
    * manifest layer, with none of the directory-swap hazards: the
    * rewrite is just another atomic commit, readers mid-compaction see
    * the old head, time travel to every prior version still works, and
    * committed `#txn` tags carry forward so replayed micro-batches
    * stay deduplicated). `numFiles` sizes the unpartitioned layout
    * (callers size by data volume); with `partitionBy` the rewrite
    * routes one file per partition value ([[AnnIndex.compactIvfPq]]'s
    * layout). Old files become time-travel history — [[vacuum]] (with
    * its retention window) reclaims them when the versions age out.
    * Returns the new version.
    *
    * Concurrency contract: publishes EXACTLY ONCE against the head it
    * read — any commit landing mid-rewrite throws
    * [[ConcurrentWriteException]] (a blind retry would restage the
    * stale frame and erase the racer's rows, the lost-update anomaly;
    * Delta's OPTIMIZE aborts on the same conflict). Rerunning the
    * verb on the new head is always safe — it is pure layout. */
  def compact(spark: SparkSession, root: String,
      partitionBy: Seq[String] = Nil, numFiles: Int = 1,
      statsCol: Option[String] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Int = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    val v0 = currentVersion(spark, root)
    require(v0 >= 1, s"Txn.compact: no committed version at $root")
    val head = read(spark, root, Some(v0))
    val folded =
      if (partitionBy.nonEmpty) head.repartition(partitionBy.map(col): _*)
      else head.repartition(numFiles)
    commitRewriteAt(spark, root, folded, v0, partitionBy,
      (statsCol.toSeq ++ statsCols).distinct, "compact", bloomCols)
  }

  /** PARTITION-SCOPED compaction — Delta's `OPTIMIZE WHERE partition
    * IN (...)`, the maintenance verb big tables actually run: at
    * 100 TB nobody rewrites the table to fold one hot partition's
    * small-file accretion (a streaming-ingest day partition, say);
    * this rewrites ONLY the files under the named partition values —
    * matched by their writer-encoded `col=value` path segment, so
    * values needing escaping compare in the encoding the writer used —
    * and carries every other partition's manifest lines VERBATIM (the
    * untouched bytes never move, spec-pinned). One atomic commit with
    * the same exactly-once contract as [[compact]]: a concurrent
    * commit landing mid-rewrite throws [[ConcurrentWriteException]]
    * (rerun on the new head — pure layout). Values absent from the
    * table no-op without committing (returns the current head).
    * Stats/blooms re-record for the rewritten files. */
  def compactWhere(spark: SparkSession, root: String, partitionCol: String,
      values: Seq[String], numFiles: Int = 1,
      statsCol: Option[String] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Int = {
    require(values.nonEmpty, "Txn.compactWhere: no partition values")
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    // a MULTI-COLUMN-partitioned table must restage under its FULL
    // spec, or the rewritten files silently lose the other partition
    // path segments (reads stay correct via the mixed-layout union,
    // but layout/pruning on those columns degrades — r15 advice);
    // default = the scoping column alone, the single-column layout
    val restageBy =
      if (partitionBy.nonEmpty) partitionBy else Seq(partitionCol)
    require(restageBy.contains(partitionCol),
      s"Txn.compactWhere: partitionBy $restageBy must include the " +
        s"scoping column '$partitionCol'")
    val v0 = currentVersion(spark, root)
    require(v0 >= 1, s"Txn.compactWhere: no committed version at $root")
    val lines = snapshotLines(spark, root, v0)
    val segs = values.map(v =>
      physName(colmapOf(lines), partitionCol) + "=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v)).toSet
    val touched = lines.filterNot(isMeta).map(linePath)
      .filter(_.split('/').exists(segs.contains))
    if (touched.isEmpty) return v0 // nothing under those partitions
    val v = v0 + 1
    val prev = headMetaLines(spark, root, v0)
    // ROUND-ROBIN into numFiles tasks: the partitionBy writer then
    // splits each task by value, so every rewritten partition folds to
    // AT MOST numFiles files. Hashing on the partition column here
    // would send each value to ONE task regardless of numFiles — a
    // 50 GB hot partition would fold to a single 50 GB file and lose
    // all read parallelism (r15 review).
    val folded = readMasked(spark, root, touched,
        dvByPath(lines.filterNot(isMeta)), schemaLine(lines),
        colmapOf(lines))
      .repartition(numFiles)
    val schema = schemaLine(lines).getOrElse(
      sys.error(s"Txn.compactWhere: no #schema line at $root"))
    val staged = stageBatch(spark, root, folded, restageBy,
      batchDir(v), (statsCol.toSeq ++ statsCols).distinct, bloomCols,
      colmap = colmapOf(lines))
    raceOnce.get().foreach { hook => raceOnce.set(None); hook() }
    val out = metaForNext(spark, root, v0, prev, schema,
      kind = "compact_where") ++ deltaLines(v0, touched, staged)
    if (!publish(spark, root, v, out))
      throw new ConcurrentWriteException(
        s"Txn.compactWhere at $root: a concurrent commit landed after " +
          s"v$v0 during the rewrite — rerun on the new head")
    v
  }

  /** Publish a FULL REWRITE of snapshot `readV` as version readV + 1,
    * throwing [[ConcurrentWriteException]] when any commit landed
    * after `readV` — layout maintenance ([[compact]]/
    * [[compactZOrder]]) captured the head at read time, so a blind
    * retry after a lost publish would restage the STALE frame and
    * silently erase the racer's rows (the lost-update anomaly; Delta's
    * OPTIMIZE aborts on the same conflict, r13 advice). Rerunning the
    * verb on the new head is always safe — it is pure layout. */
  private def commitRewriteAt(spark: SparkSession, root: String,
      df: DataFrame, readV: Int, partitionBy: Seq[String],
      statsCols: Seq[String], kind: String,
      bloomCols: Seq[String] = Nil): Int = {
    val v = readV + 1
    val prev = headMetaLines(spark, root, readV)
    val lines = metaForNext(spark, root, readV, prev, df.schema,
        kind = kind) ++
      stageBatch(spark, root, df, partitionBy, batchDir(v), statsCols,
        bloomCols, colmap = colmapOf(prev))
    raceOnce.get().foreach { hook => raceOnce.set(None); hook() }
    if (!publish(spark, root, v, lines))
      throw new ConcurrentWriteException(
        s"Txn.$kind at $root: a concurrent commit landed after v$readV " +
          "during the rewrite — rerun the maintenance verb on the new head")
    v
  }

  /** ROLLBACK as a forward commit — Delta's `RESTORE TABLE ... TO
    * VERSION`: publish a new head whose data lines are the restored
    * snapshot's VERBATIM (stats included). Metadata-only — no data
    * moves or rewrites, a 100 TB rollback costs one manifest write —
    * and the bad intermediate versions stay time-travelable for the
    * post-mortem (history is append-only; a rollback is new history,
    * not erased history). Idempotence tags carry from the HEAD chain,
    * not the restored version: committed micro-batches stay
    * committed, so a replayed tag cannot double-append after a
    * rollback (spec-pinned). The restored version must still be
    * within the retained window ([[expireManifests]]); its files are
    * re-referenced by the new head, which keeps them live through
    * [[vacuum]]. Returns the new version. */
  def restore(spark: SparkSession, root: String, toVersion: Int,
      maxRetries: Int = 5): Int = {
    require(toVersion >= 1, s"Txn.restore: bad version $toVersion")
    retry(spark, root, maxRetries) { v =>
      require(toVersion < v,
        s"Txn.restore: version $toVersion is not committed history at $root")
      val target = snapshotLines(spark, root, toVersion)
      val prev = headMetaLines(spark, root, v - 1)
      val schema = schemaLine(target).getOrElse(schemaLine(prev).getOrElse(
        sys.error(s"Txn.restore: no #schema line at $root")))
      // delta vs the HEAD, not a verbatim re-listing: rm what the head
      // has beyond the target, re-add what the target has beyond the
      // head (stats lines verbatim — a path's line is immutable once
      // staged); files in both carry through the base. The common
      // rollback (undo a recent bad commit) is O(that commit's churn).
      val targetData = target.filterNot(isMeta)
      val headPaths = snapshotFiles(spark, root, v - 1).toSet
      val targetPaths = targetData.map(linePath).toSet
      // the restored files were written under the TARGET era's
      // physical names — restore its colmap too (head's drops carry
      // so no later add can alias a retired physical)
      metaForNext(spark, root, v - 1, prev, schema,
          kind = s"restore:$toVersion",
          colmapOverride = Some(colmapOf(target)),
          dropsOverride = Some(physDrops(target) ++ physDrops(prev))) ++
        deltaLines(v - 1, (headPaths -- targetPaths).toSeq.sorted,
          targetData.filterNot(l => headPaths(linePath(l))))
    }
  }

  /** What [[optimize]] did: the rewrite's new head version, the
    * manifest versions expired, and the data files vacuumed. */
  final case class OptimizeReport(version: Int, expired: Seq[Int],
      filesRemoved: Int)

  /** ONE maintenance verb — Delta's `OPTIMIZE` composed with log
    * retention and vacuum in the only safe order, so callers stop
    * hand-sequencing verbs whose ordering constraints live in
    * scaladoc: (1) REWRITE the head first ([[compactZOrder]] when
    * `zorderBy` names two cluster columns, else [[compact]]) — the
    * new head references fresh files, making the old layout pure
    * history; (2) [[expireManifests]] bounds the log to `keepLast`
    * versions (consolidating tag + listing checkpoints BEFORE the
    * chain below them disappears); (3) [[vacuum]] reclaims files no
    * surviving manifest references plus crash orphans, gated by
    * `retentionMs` so an in-flight committer's staged batch is never
    * swept. Rewrite conflicts propagate as
    * [[ConcurrentWriteException]] (rerun on the new head); pass
    * `keepLast = Int.MaxValue` to keep all history or
    * `retentionMs = 0` only when no commit can be in flight. */
  def optimize(spark: SparkSession, root: String, numFiles: Int = 1,
      partitionBy: Seq[String] = Nil,
      zorderBy: Option[(String, String)] = None,
      zorderByCols: Seq[String] = Nil,
      where: Option[(String, Seq[String])] = None,
      statsCol: Option[String] = None, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, keepLast: Int = Int.MaxValue,
      retentionMs: Long = 24L * 3600 * 1000): OptimizeReport = {
    val zcols = zorderBy.map(p => Seq(p._1, p._2))
      .getOrElse(zorderByCols)
    require(where.isEmpty || zcols.isEmpty,
      "optimize: `where` (partition-scoped fold) and z-ordering are " +
        "exclusive — z-clustering is a whole-table layout")
    val v = (zcols, where) match {
      case (cs, _) if cs.nonEmpty => compactZOrder(spark, root, cs, numFiles)
      case (_, Some((c, vals))) => compactWhere(spark, root, c, vals,
        numFiles, statsCol, statsCols, bloomCols,
        partitionBy = partitionBy)
      case _ => compact(spark, root, partitionBy, numFiles, statsCol,
        statsCols = statsCols, bloomCols = bloomCols)
    }
    val expired =
      if (keepLast == Int.MaxValue) Nil
      else expireManifests(spark, root, keepLast)
    OptimizeReport(v, expired, vacuum(spark, root, retentionMs))
  }

  /** Z-CLUSTERED compaction — Delta's `OPTIMIZE ... ZORDER BY (x, y)`
    * as one atomic rewrite: the head snapshot re-lays out along the
    * Morton curve of two columns — NUMERIC (TRY_CAST-to-double
    * coordinates) or STRING (r15: order-preserving byte coordinates,
    * see below) — recording BOTH columns' per-file stats. Where a
    * plain [[compact]] leaves each file spanning the full domain of
    * everything but the sort column, every Z-clustered file covers a
    * small RECTANGLE of the (x, y) domain — so [[readWhereAll]] /
    * [[readWhereStr]] predicates on either or both columns prune to a
    * handful of files (spec-pinned file counts). Coordinates quantize
    * to 16-bit by min/max scaling (locality-preserving, unlike a hash
    * bucket); NULL coordinates sort together and simply record no
    * stats. Cost: ONE aggregate pass (string bounds reuse the same
    * pass — the coordinate mapping is monotone, so its bounds are
    * computed on the driver from the raw string min/max) + one range
    * exchange (sampled boundaries) + the commit's stats pass; at
    * 100 TB this is the periodic maintenance job that keeps
    * multi-column skip-scans effective as data accretes.
    *
    * STRING axes ([[graft.functions.ZOrder.stringCoord]]): strip the
    * column's GLOBAL COMMON PREFIX (the shared prefix of its min and
    * max — every value between them shares it by byte-order
    * transitivity; without the strip a "2024-01-XX" day column
    * collapses to ONE coordinate), then the next 7 UTF-8 bytes read
    * as an unsigned integer. Pre-r15, string columns cast to NULL and
    * silently degraded to a plain repartition.
    *
    * Same concurrency contract as [[compact]]: publishes exactly once,
    * throws [[ConcurrentWriteException]] on a mid-rewrite racer. */
  def compactZOrder(spark: SparkSession, root: String, xCol: String,
      yCol: String, numFiles: Int): Int =
    compactZOrder(spark, root, Seq(xCol, yCol), numFiles)

  /** N-COLUMN Z-order (r16): `ZORDER BY (c1, …, ck)` for any k ≥ 2 —
    * each axis quantizes to ⌊63/k⌋ bits (capped at 16, the 2-column
    * precision) by min/max scaling and the rewrite range-partitions on
    * the k-way Morton code ([[graft.functions.ZOrder.interleaveK]]),
    * so every output file covers a small k-RECTANGLE and a predicate
    * on ANY clustered column prunes (3-axis subset-opening pinned in
    * TxnSpec). String and numeric axes mix freely (same
    * coordinate mapping as the 2-column form). */
  def compactZOrder(spark: SparkSession, root: String,
      cols: Seq[String], numFiles: Int): Int = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    require(cols.size >= 2 && cols.size == cols.distinct.size,
      s"Txn.compactZOrder: need >= 2 distinct cluster columns: $cols")
    val v0 = currentVersion(spark, root)
    require(v0 >= 1, s"Txn.compactZOrder: no committed version at $root")
    val head = read(spark, root, Some(v0))
    def isStr(c: String): Boolean =
      head.schema(c).dataType == org.apache.spark.sql.types.StringType
    val aggs = cols.flatMap { c =>
      if (isStr(c)) Seq(min(col(c)), max(col(c)))
      else Seq(min(col(c).try_cast("double")),
        max(col(c).try_cast("double")))
    }
    val r = head.agg(aggs.head, aggs.tail: _*).head()
    // per axis: (coordinate column, its lo/hi) — string coordinate
    // bounds come from the monotone mapping applied to the raw string
    // bounds ON THE DRIVER (stringCoordValue is stringCoord's
    // bit-identical twin), so no second data pass
    def axis(c: String, i: Int): Option[(Column, Double, Double)] =
      if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) None
      else if (isStr(c)) {
        val (mn, mx) = (r.getString(2 * i), r.getString(2 * i + 1))
        val (a, b) = (mn.getBytes("UTF-8"), mx.getBytes("UTF-8"))
        var j = 0
        while (j < a.length && j < b.length && a(j) == b(j)) j += 1
        Some((graft.functions.ZOrder.stringCoord(col(c), j),
          graft.functions.ZOrder.stringCoordValue(mn, j),
          graft.functions.ZOrder.stringCoordValue(mx, j)))
      } else Some((col(c).try_cast("double"),
        r.getDouble(2 * i), r.getDouble(2 * i + 1)))
    val bitsPer = math.min(16, 63 / cols.size)
    val top = (1L << bitsPer) - 1
    def q(z: Column, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(floor((z - lit(lo)) / lit(span) * top.toDouble),
        lit(top.toDouble)).cast("long")
    }
    val axes = cols.zipWithIndex.map { case (c, i) => axis(c, i) }
    val clustered =
      if (axes.forall(_.isDefined)) {
        val coords = axes.flatten.map { case (z, lo, hi) => q(z, lo, hi) }
        graft.functions.ZOrder.clusterByK(head, coords, bitsPer, numFiles)
      } else head.repartition(numFiles) // an all-NULL axis: plain fold
    commitRewriteAt(spark, root, clustered, v0, Nil, cols, "zorder")
  }

  /** Files a row-level commit must rewrite: every entry WITHOUT stats
    * recorded under the NAME `keyCol` (including legacy unnamed
    * ranges — pruning never trusts a caller's claim the manifest
    * cannot verify; such files rewrite unconditionally, r12 advice),
    * plus every keyCol-ranged entry whose [min,max] can contain a key.
    * The range check is distributed — the keys frame is never
    * collected; only matched file PATHS come back (≤ file count). */
  private def touchedFiles(spark: SparkSession, root: String, v: Int,
      keyRows: DataFrame, keyCol: String): Set[String] = {
    val entriesDf = entriesFrame(spark, root, v)
    // stats fields record under PHYSICAL names (stable across renames)
    val keyPhys = physName(colmapOf(rawLines(spark, root, v)), keyCol)
    // An entry prunes by whatever it RECORDED for keyCol — numeric
    // range/bloom (TRY_CAST-to-double semantics), string range/bloom
    // (raw UTF8 order/bytes, r15), or any mix; every test is
    // independently conservative, so their conjunction is too. The
    // bloom answers the shape range stats cannot: a high-cardinality
    // uniform key (the GDPR-delete user id) where every file's
    // [min,max] spans the whole domain.
    //
    // PER-KEY soundness guards (r14 advice — the write-side twin of
    // filesForKeys' old global fallback):
    //  - a NUMERIC test can exclude only a key whose own TRY_CAST is
    //    non-NULL: a matching row's cast equals the key's cast, so a
    //    cast-null key (string user ids) says nothing about what the
    //    numeric stats recorded — r14 let such keys match no
    //    range/bloom and a GDPR delete silently kept every row;
    //  - a STRING test applies only when the key column IS
    //    string-typed: probing raw-byte stats with a casted
    //    non-string key would compare different renderings of one
    //    value ("7.0" vs "7") and false-skip.
    // Entries recording nothing usable — including NaN range bounds
    // (legacy pre-r14 manifests), unusable under JVM comparisons —
    // rewrite unconditionally: pruning stays an optimization, never
    // a filter.
    val keyIsString = keyRows.schema(keyCol).dataType ==
      org.apache.spark.sql.types.StringType
    // ONE projection over the entries frame (r16: a Spark job over the
    // parquet checkpoint + delta tail — bloom bytes stay on executors;
    // see the parquet-checkpoint section): per file, keyCol's usable
    // range (NaN bounds — legacy manifests — null out, the no-stats
    // fallback), bloom, and — string keys only — string range/bloom.
    val ns = col("nstats")(keyPhys)
    val validRange = ns.isNotNull && !isnan(ns("lo")) && !isnan(ns("hi"))
    val files = entriesDf.select(
      col("path").as("__p"),
      when(validRange, ns("lo")).as("__mn"),
      when(validRange, ns("hi")).as("__mx"),
      col("blooms")(keyPhys)("bits").as("__bf"),
      col("blooms")(keyPhys)("k").as("__bk"),
      (if (keyIsString) col("sstats")(keyPhys)("lo")
       else lit(null).cast("string")).as("__slo"),
      (if (keyIsString) col("sstats")(keyPhys)("hi")
       else lit(null).cast("string")).as("__shi"),
      (if (keyIsString) col("sblooms")(keyPhys)("bits")
       else lit(null).cast("binary")).as("__sbf"),
      (if (keyIsString) col("sblooms")(keyPhys)("k")
       else lit(null).cast("int")).as("__sbk"))
    val informedCond = col("__mn").isNotNull || col("__bf").isNotNull ||
      col("__slo").isNotNull || col("__sbf").isNotNull
    val keyed = keyRows.select(
      col(keyCol).try_cast("double").as("__kd"),
      (if (keyIsString) col(keyCol).cast("string")
       else lit(null).cast("string")).as("__ks"))
    // exclusion predicates: each must PROVE absence to fire; every
    // null (no key rendering, no recorded stat) falls to false
    val numExclude = col("__kd").isNotNull && (
      (col("__mn").isNotNull &&
        (col("__kd") < col("__mn") || col("__kd") > col("__mx"))) ||
        (col("__bf").isNotNull && !graft.functions.BloomStats
          .mightContain(spark, col("__bf"), col("__kd"), col("__bk"))))
    val strExclude = col("__ks").isNotNull && (
      (col("__slo").isNotNull &&
        (col("__ks") < col("__slo") || col("__ks") > col("__shi"))) ||
        (col("__sbf").isNotNull && !graft.functions.BloomStats
          .mightContain(spark, col("__sbf"), col("__ks"), col("__sbk"))))
    // the KEYS side broadcasts — a point-read/forget key set is small
    // by contract, while the files side is O(table files) carrying
    // 8 KiB blooms (pre-r16 this broadcast went the other way, which
    // at 1M files would ship gigabytes to every executor); file rows
    // stream through the nested-loop probe and only PATHS come back
    val hit = files.where(informedCond)
      .join(broadcast(keyed), !(numExclude || strExclude))
      .select("__p")
    val blind = files.where(!informedCond).select("__p")
    blind.union(hit).distinct()
      .collect().map(_.getString(0)).toSet
  }

  // ---- deletion vectors: merge-on-read delete (r16) ------------------
  // commitDelete REWRITES every candidate file to drop k rows — at
  // 100 TB with a daily forget queue, copy-on-write amplification is
  // the dominant cost (the r15 verdict's missing item #2). The DV mode
  // writes ONE small sidecar per delete commit (a parquet dir under
  // data/, holding the deleted keys under the key column's name) and
  // re-publishes each touched file's manifest line with a `__dv:<b64>`
  // field appended — a metadata-only commit: ZERO data files rewritten,
  // cost O(deleted keys) + O(touched manifest lines). Reads ANTI-MASK:
  // every reader groups a snapshot's files by their dv-ref set and
  // anti-joins each group against its sidecars' key frames (broadcast —
  // a forget queue is small by contract), so the observable table is
  // identical to the copy-on-write delete (one semantics, second
  // mechanism — the gates share one oracle). Delta's deletion vectors
  // and Iceberg's delete files are the positional/equality versions of
  // the same idea; keys (not positions) keep the sidecar independent of
  // row order and file paths, so nothing breaks if the table moves.
  // compact/compactWhere/merge re-stage through masked reads, so any
  // rewrite MATERIALIZES the DVs away; vacuum keeps referenced sidecars
  // live and reclaims them once no surviving manifest references them.

  private def addDvField(line: String, dvRel: String): String =
    line + "\t__dv:" + java.util.Base64.getEncoder
      .encodeToString(dvRel.getBytes("UTF-8"))

  /** dv-ref sets of `dataLines`, keyed by path — only lines carrying a
    * `__dv:` field are parsed (the fast screen keeps plain snapshot
    * reads at O(paths) string work). */
  private def dvByPath(dataLines: Seq[String]): Map[String, Seq[String]] =
    dataLines.iterator.filter(_.contains("\t__dv:")).map(parseEntryLine)
      .map(e => e.path -> e.dvs).toMap

  /** Snapshot-consistent read of `rels` under their dv masks: group by
    * dv-ref set (a file deleted-from twice carries two refs; a file
    * added after a delete carries none — masking it with an older
    * sidecar would wrongly drop re-inserted keys), anti-join each group
    * against its sidecars. Empty dv map = plain [[readFiles]]. */
  private def readMasked(spark: SparkSession, root: String,
      rels: Seq[String], dvs: Map[String, Seq[String]],
      schema: Option[StructType],
      colmap: Map[String, String] = Map.empty): DataFrame =
    if (dvs.isEmpty || !rels.exists(dvs.contains))
      readFiles(spark, root, rels, schema, colmap)
    else {
      // sidecars store the key under its PHYSICAL name (stable across
      // renames); map back to the CURRENT logical for the anti-join
      val logOf = colmap.map(_.swap)
      val groups = rels.groupBy(p => dvs.getOrElse(p, Nil).distinct)
      groups.toSeq.sortBy(_._1.mkString("|")).map { case (refs, ps) =>
        refs.foldLeft(readFiles(spark, root, ps, schema, colmap)) {
          (df, dv) =>
            val raw = spark.read.parquet(s"$root/data/$dv")
            val mask =
              if (colmap.isEmpty) raw
              else raw.select(raw.columns.map(c =>
                col(s"`$c`").as(logOf.getOrElse(c, c))).toSeq: _*)
            df.join(broadcast(mask), mask.columns.toSeq, "left_anti")
        }
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    }

  /** MERGE-ON-READ row-level DELETE — [[commitDelete]]'s semantics
    * (remove every row whose `keyCol` appears in `keys`) without
    * rewriting a single data file: publish the deleted keys as a
    * sidecar and annotate each touched file's manifest line with a dv
    * reference. The forget-queue verb at 100 TB — a scattered GDPR
    * delete costs one small parquet write + one manifest commit;
    * the next [[compact]]/[[compactWhere]]/[[commitMerge]] touching
    * those files materializes the mask away. Touched files prune
    * through the same stats/bloom surface as commitDelete; files the
    * stats PROVE keyless carry verbatim with no mask (reads stay
    * pure-scan there). Same conflict detection (a racing commit
    * changing an overlapping key throws [[ConcurrentWriteException]]),
    * same time-travel contract (pre-delete versions still read the
    * rows; physical erasure = a later rewrite + [[vacuum]]). */
  def commitDeleteDv(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, maxRetries: Int = 5): Int = {
    val keyRows = keys.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
    retryRowLevel(spark, root, maxRetries, keyRows, keyCol,
        "Txn.commitDeleteDv") { v =>
      require(v >= 2, s"Txn.commitDeleteDv: no committed version at $root")
      val prev = headMetaLines(spark, root, v - 1)
      val schema = schemaLine(prev).getOrElse(
        sys.error(s"Txn.commitDeleteDv: no #schema line at $root"))
      val touched = touchedFiles(spark, root, v - 1, keyRows, keyCol)
      if (touched.isEmpty)
        metaForNext(spark, root, v - 1, prev, schema, kind = "delete_dv") ++
          deltaLines(v - 1, Nil, Nil)
      else {
        val prevData = snapshotLines(spark, root, v - 1).filterNot(isMeta)
        // the sidecar: one small parquet of the deleted keys, named
        // attempt-unique like any staged batch (a lost retry's sidecar
        // is a vacuum-able orphan); coalesce(1) — a forget queue is
        // small by contract, and every masked read opens this file
        val dvRel = s"${batchDir(v)}-dv"
        // sidecar keys store under the PHYSICAL column name (stable
        // across renames; readMasked maps back to the current logical)
        physicalize(keyRows, colmapOf(prev)).coalesce(1)
          .write.parquet(s"$root/data/$dvRel")
        val newLines = prevData.filter(l => touched(linePath(l)))
          .map(addDvField(_, dvRel))
        metaForNext(spark, root, v - 1, prev, schema, kind = "delete_dv") ++
          deltaLines(v - 1, touched.toSeq.sorted, newLines)
      }
    }
  }

  /** COPY-ON-WRITE row-level DELETE (Delta/Iceberg's most-used write
    * verb after append): remove every row whose `keyCol` appears in
    * `keys`, rewriting ONLY the files that can contain a match and
    * carrying every untouched file's manifest line VERBATIM — the
    * untouched bytes never move, so at 100 TB a targeted delete (a
    * forget-user request, a bad-batch purge) touches a handful of
    * files, not the table. One atomic commit; prior versions stay
    * time-travelable (the pre-delete rows remain readable at v-1,
    * which is also the GDPR caveat: physical erasure = delete +
    * [[vacuum]] once retention passes).
    *
    * TOUCHED-file pruning mirrors [[readWhere]]: when `statsCol`
    * names the table's declared stats column AND equals `keyCol`,
    * a file is rewritten only if some key lands inside its recorded
    * [min, max] (checked distributedly — the keys frame is never
    * collected; only matched file PATHS come back, bounded by file
    * count). Stats-less files (or a non-stats key) are always
    * rewritten — pruning is an optimization, never a filter.
    *
    * `partitionBy` restages survivors in the table's partition layout
    * (the partition-directory values survive the re-read, so the
    * rewrite preserves layout when told what it is). Returns the new
    * version — including a legitimate no-op commit when no key
    * matched (callers polling readChangesCdf see an empty delta). */
  def commitDelete(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, partitionBy: Seq[String] = Nil,
      maxRetries: Int = 5, statsCol: Option[String] = None,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Int = {
    val keyRows = keys.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
    retryRowLevel(spark, root, maxRetries, keyRows, keyCol,
        "Txn.commitDelete") { v =>
      require(v >= 2, s"Txn.commitDelete: no committed version at $root")
      val prev = headMetaLines(spark, root, v - 1)
      val touched = touchedFiles(spark, root, v - 1, keyRows, keyCol)
      val staged =
        if (touched.isEmpty) Nil
        else {
          // masked read: rows an earlier DV delete already removed
          // must not resurrect into the rewritten survivors
          val prevDv = dvByPath(
            snapshotLines(spark, root, v - 1).filterNot(isMeta))
          val survivors = readMasked(spark, root, touched.toSeq.sorted,
              prevDv, schemaLine(prev), colmapOf(prev))
            .join(keyRows, Seq(keyCol), "left_anti")
          stageBatch(spark, root, survivors, partitionBy, batchDir(v),
            (statsCol.toSeq ++ statsCols).distinct, bloomCols,
            colmap = colmapOf(prev))
        }
      metaForNext(spark, root, v - 1, prev,
        schemaLine(prev).getOrElse(
          sys.error(s"Txn.commitDelete: no #schema line at $root")),
        kind = "delete") ++
        deltaLines(v - 1, touched.toSeq.sorted, staged)
    }
  }

  /** COPY-ON-WRITE predicate DELETE — `DELETE WHERE statsCol BETWEEN
    * lo AND hi`, the retention/TTL verb at the Txn layer: a file
    * whose recorded range lies ENTIRELY inside [lo, hi] and whose
    * recorded NULL count is zero is dropped by manifest arithmetic
    * alone (never opened — at 100 TB a time-keyed table's expiry
    * removes most files without a single read); files overlapping a
    * boundary rewrite minus the matching rows; disjoint files carry
    * verbatim. NULL-valued rows never match a range predicate and
    * always survive — which is exactly why the metadata drop demands
    * a recorded zero NULL count (min/max ignore NULLs; a file with
    * in-range stats can still hold NULL rows). Files without NAMED
    * statsCol stats rewrite conservatively. Write-write conflicts:
    * a racing commit that changed any in-range row throws
    * [[ConcurrentWriteException]] (same CDF-diff discipline as
    * [[commitDelete]]). Returns the new version; prior versions stay
    * time-travelable (physical erasure = this + [[vacuum]] after
    * retention, and [[expireManifests]] for the manifest tail). */
  def commitDeleteWhere(spark: SparkSession, root: String,
      statsCol: String, lo: Double, hi: Double,
      partitionBy: Seq[String] = Nil, maxRetries: Int = 5,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Int = {
    require(lo <= hi, s"commitDeleteWhere: empty range [$lo, $hi]")
    var attempt = 0
    var baseV = -1
    val c = col(statsCol).try_cast("double")
    while (attempt < maxRetries) {
      val v = currentVersion(spark, root) + 1
      require(v >= 2, s"Txn.commitDeleteWhere: no committed version at $root")
      val prev = headMetaLines(spark, root, v - 1)
      if (baseV < 0) baseV = v - 1
      else if (v - 1 > baseV) {
        val hit = readChangesCdf(spark, root, baseV, Some(v - 1))
          .where(c >= lo && c <= hi).limit(1).count()
        if (hit > 0) throw new ConcurrentWriteException(
          s"Txn.commitDeleteWhere at $root: concurrent commit(s) " +
            s"v${baseV + 1}..v${v - 1} changed rows inside " +
            s"[$lo, $hi] on $statsCol — re-read the new head and rerun")
        baseV = v - 1
      }
      val entries = snapshotEntries(spark, root, v - 1)
      val pStats = physName(colmapOf(prev), statsCol) // stats keys are physical
      val dropped = entries.filter { e =>
        e.namedStats(pStats).exists { case (mn, mx) =>
          lo <= mn && mx <= hi } && e.nullsFor(pStats).contains(0L)
      }.map(_.path).toSet
      val untouched = entries.filter { e =>
        !dropped.contains(e.path) &&
          e.namedStats(pStats).exists { case (mn, mx) =>
            mx < lo || mn > hi }
      }.map(_.path).toSet
      val boundary = entries.map(_.path)
        .filterNot(p => dropped.contains(p) || untouched.contains(p))
      val staged =
        if (boundary.isEmpty) Nil
        else {
          val survivors = readMasked(spark, root, boundary.sorted,
              dvByPath(snapshotLines(spark, root, v - 1)
                .filterNot(isMeta)), schemaLine(prev), colmapOf(prev))
            .where(c.isNull || c < lo || c > hi)
          stageBatch(spark, root, survivors, partitionBy, batchDir(v),
            (statsCol +: statsCols).distinct, bloomCols,
            colmap = colmapOf(prev))
        }
      val lines = metaForNext(spark, root, v - 1, prev,
        schemaLine(prev).getOrElse(
          sys.error(s"Txn.commitDeleteWhere: no #schema line at $root")),
        kind = "delete_where") ++
        deltaLines(v - 1, (dropped ++ boundary).toSeq.sorted, staged)
      raceOnce.get().foreach { hook => raceOnce.set(None); hook() }
      if (publish(spark, root, v, lines)) return v
      attempt += 1 // lost the race: head moved; restage against new head
    }
    sys.error(s"Txn: lost the commit race $maxRetries times at $root")
  }

  /** COPY-ON-WRITE MERGE (upsert — Delta's `MERGE INTO` with
    * whenMatched-update-all + whenNotMatched-insert-all, the most-used
    * lakehouse write verb after append): every target row whose
    * `keyCol` matches a source row is REPLACED by that source row,
    * source rows matching nothing are INSERTED, and only the files
    * that can contain a matched key are rewritten — the same
    * stats-pruning, carry-untouched-lines-verbatim discipline as
    * [[commitDelete]], so a 100 TB table absorbs a small changeset by
    * touching a handful of files plus one staged batch.
    *
    * Contract (Delta's): the SOURCE must be key-unique — two source
    * rows for one key would make the merge order-dependent, so it
    * throws (one count aggregate over the changeset, which is small
    * by definition at scale). NULL source keys are rejected for the
    * same reason. The source schema passes the commit-point gate
    * unless `mergeSchema = true` (schema evolution via the same
    * unionByName NULL-fill path appends use). Returns the new
    * version; prior versions stay time-travelable. */
  /** One WHEN MATCHED clause for [[commitMerge]] — Delta's conditional
    * merge shape. `condition` is a SQL boolean over the matched pair
    * (target row aliased `t`, source row `s` — e.g. "s.ts > t.ts");
    * None fires unconditionally. `delete = true` removes the matched
    * target row; otherwise `set` maps TARGET columns to expressions
    * over t/s ("t.n + 1", "s.value"), with an EMPTY set meaning
    * replace-all (every source column overwrites, target-only columns
    * null — the unconditional merge's semantics). Clauses evaluate in
    * order; the first whose condition holds decides; a matched pair no
    * clause claims keeps the target row unchanged. */
  final case class WhenMatched(condition: Option[String] = None,
      delete: Boolean = false, set: Map[String, String] = Map.empty)

  def commitMerge(spark: SparkSession, root: String, source: DataFrame,
      keyCol: String, partitionBy: Seq[String] = Nil,
      maxRetries: Int = 5, statsCol: Option[String] = None,
      mergeSchema: Boolean = false, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      whenMatched: Seq[WhenMatched] = Nil): Int = {
    require(whenMatched.isEmpty || !mergeSchema,
      "commitMerge: whenMatched clauses and mergeSchema are exclusive " +
        "— evolve the schema in a separate commit first")
    val src = source.cache()
    try {
      val counts = src.agg(
        count(lit(1)).as("n"),
        count_distinct(col(keyCol)).as("d"),
        count(when(col(keyCol).isNull, 1)).as("nulls")).head()
      require(counts.getLong(2) == 0,
        s"commitMerge: source has NULL $keyCol keys")
      require(counts.getLong(0) == counts.getLong(1),
        s"commitMerge: source not key-unique on $keyCol " +
          s"(${counts.getLong(0)} rows, ${counts.getLong(1)} keys) — " +
          "an ambiguous merge is order-dependent; dedupe the changeset")
      val keyRows = src.select(col(keyCol)).distinct()
      retryRowLevel(spark, root, maxRetries, keyRows, keyCol,
          "Txn.commitMerge") { v =>
        require(v >= 2, s"Txn.commitMerge: no committed version at $root")
        val prev = headMetaLines(spark, root, v - 1)
        // a CLAUSE merge's source may be a slim changeset (key + the
        // columns its SET expressions read) — require it a SUBSET of
        // the committed schema instead of equal; the unconditional
        // path keeps the strict gate
        if (whenMatched.nonEmpty)
          schemaLine(prev).foreach { committed =>
            val bad = src.columns.filterNot(committed.fieldNames.contains)
            require(bad.isEmpty,
              s"commitMerge: source columns ${bad.mkString(", ")} not " +
                "in the table schema (clause merges cannot add columns)")
          }
        else if (!mergeSchema) requireSameSchema(prev, src, "commitMerge")
        // mergeSchema commits the EVOLVED UNION (committed fields —
        // types widened where the source is wider, r15 — plus
        // src-only additions) — committing src.schema would silently
        // NARROW the table when the source lacks columns the target
        // has (allowed by unionByName allowMissingColumns), making a
        // later strict append throw spurious drift and an
        // empty-snapshot read lose columns (r12 advice; Delta's merge
        // evolution commits the union). Computed BEFORE staging so an
        // incompatible retype fails loudly instead of letting the
        // union coerce (string+int would silently widen to string).
        val evolved = schemaLine(prev).fold(src.schema) { committed =>
          if (!mergeSchema) committed
          else evolveSchema(committed, src.schema, "commitMerge")
        }
        val cm = evolveColmap(colmapOf(prev), physDrops(prev),
          schemaLine(prev), evolved, v)
        whenMatched.foreach(_.set.keys.foreach(k =>
          require(evolved.fieldNames.contains(k),
            s"commitMerge: SET targets unknown column '$k'")))
        val touched = touchedFiles(spark, root, v - 1, keyRows, keyCol)
        def touchedTarget() = readMasked(spark, root,
          touched.toSeq.sorted,
          dvByPath(snapshotLines(spark, root, v - 1).filterNot(isMeta)),
          schemaLine(prev).map(_ => evolved), cm)
        val srcCols = src.columns.toSet
        // project a source-only frame onto the table schema (clause
        // merges allow a slim changeset; absent columns insert NULL)
        def insertsFrom(unmatched: DataFrame): DataFrame =
          unmatched.select(evolved.fields.map(f =>
            (if (srcCols(f.name)) col(s"`${f.name}`")
             else lit(null)).cast(f.dataType).as(f.name)).toSeq: _*)
        val survivors =
          if (whenMatched.isEmpty) {
            if (touched.isEmpty) src
            else touchedTarget()
              .join(keyRows, Seq(keyCol), "left_anti")
              .unionByName(src, allowMissingColumns = mergeSchema)
          } else if (touched.isEmpty) insertsFrom(src)
          else {
            // CLAUSE merge: decide each matched (t, s) pair by the
            // first clause whose condition holds — delete drops the
            // row, update overlays SET expressions (empty SET =
            // replace-all); unclaimed pairs and unmatched target rows
            // keep the target row; source rows matching nothing
            // insert. A NULL-valued condition never fires (SQL WHERE
            // semantics), so a row cannot be dropped by a null.
            val target = touchedTarget()
            val joined = target.alias("t").join(src.alias("s"),
              col(s"t.`$keyCol`") === col(s"s.`$keyCol`"), "left_outer")
            val matchedC = col(s"s.`$keyCol`").isNotNull
            val conds = whenMatched.map(w => matchedC &&
              w.condition.map(e => coalesce(expr(e), lit(false)))
                .getOrElse(lit(true)))
            val fires = conds.zipWithIndex.map { case (c, i) =>
              conds.take(i).foldLeft(c)((acc, prior) => acc && !prior) }
            val killed = whenMatched.zip(fires)
              .collect { case (w, f) if w.delete => f }
              .foldLeft(lit(false))(_ || _)
            def outCol(f: StructField): Column = {
              val keep = col(s"t.`${f.name}`")
              whenMatched.zip(fires).reverse.foldLeft(keep) {
                case (acc, (w, fire)) =>
                  if (w.delete) acc
                  else {
                    val v0 =
                      if (w.set.nonEmpty) w.set.get(f.name).map(expr)
                        .getOrElse(keep)
                      else if (srcCols(f.name)) col(s"s.`${f.name}`")
                      else lit(null)
                    when(fire, v0.cast(f.dataType)).otherwise(acc)
                  }
              }.as(f.name)
            }
            val kept = joined.where(!killed)
              .select(evolved.fields.map(outCol).toSeq: _*)
            kept.unionByName(insertsFrom(
              src.join(target.select(col(keyCol)), Seq(keyCol),
                "left_anti")))
          }
        val staged = stageBatch(spark, root, survivors, partitionBy,
          batchDir(v), (statsCol.toSeq ++ statsCols).distinct, bloomCols,
          colmap = cm)
        metaForNext(spark, root, v - 1, prev, evolved,
          kind = "merge", colmapOverride = Some(cm)) ++
          deltaLines(v - 1, touched.toSeq.sorted, staged)
      }
    } finally src.unpersist()
  }

  /** Thrown when a row-level commit ([[commitDelete]]/[[commitMerge]]),
    * after losing the optimistic publish race, detects that the racing
    * commit(s) changed rows whose key intersects its own key set.
    * Restaging blindly would SERIALIZE the two writers and silently
    * drop one's effect (the lost-update anomaly); the caller must
    * re-read the new head and decide. Delta raises
    * ConcurrentAppend/DeleteException on the same shape. */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  /** The retry loop for ROW-LEVEL commits, with write-write conflict
    * DETECTION: a plain append restages blindly after losing the
    * publish race (pure addition commutes), but a delete/merge READ
    * the table to decide what to rewrite — if a racing commit changed
    * any row sharing a key with `keyRows`, the restage would re-apply
    * on top of (and clobber or resurrect) the racer's row-level
    * intent. Detection is key-granular via [[readChangesCdf]] over
    * exactly the raced version span (cost bounded by the racer's
    * changed files, never a table scan): any key overlap throws
    * [[ConcurrentWriteException]]; disjoint racers restage as before.
    *
    * Isolation level (Delta's WriteSerializable shape): write-write
    * conflicts on a key are detected; a rewrite commit (overwrite/
    * compact) that touches matching keys also throws (its CDF emits
    * the folded rows); cross-key read skew is not detected —
    * single-table key-level serializability, stated, not implied. */
  /** TEST SEAM: runs once per row-level attempt between staging and
    * publish, then self-clears — lets TxnSpec inject a racing commit
    * at the exact window real concurrency would (losing the publish,
    * entering the conflict check deterministically). THREAD-CONFINED:
    * ScalaTest suites share one JVM and run in parallel, so a global
    * hook set by TxnSpec could be consumed by an UNRELATED suite's
    * row-level commit on another thread (observed once as a flaky
    * conflict-matrix failure under the full suite); a ThreadLocal
    * pins the hook to the spec's own calling thread. Never set
    * outside tests. */
  private[graft] val raceOnce: ThreadLocal[Option[() => Unit]] =
    ThreadLocal.withInitial(() => None)

  private def retryRowLevel(spark: SparkSession, root: String,
      maxRetries: Int, keyRows: DataFrame, keyCol: String, who: String)(
      stage: Int => Seq[String]): Int = {
    var attempt = 0
    var baseV = -1 // the head the FIRST attempt staged against
    while (attempt < maxRetries) {
      val v = currentVersion(spark, root) + 1
      if (baseV < 0) baseV = v - 1
      else if (v - 1 > baseV) {
        val changed = readChangesCdf(spark, root, baseV, Some(v - 1))
          .select(col(keyCol)).distinct()
        val hit = changed.join(keyRows, Seq(keyCol), "left_semi")
          .limit(1).count()
        if (hit > 0) throw new ConcurrentWriteException(
          s"$who at $root: concurrent commit(s) " +
            s"v${baseV + 1}..v${v - 1} changed rows with overlapping " +
            s"$keyCol keys — re-read the new head and rerun")
        baseV = v - 1 // disjoint racer: safe to restage on the new head
      }
      val lines = stage(v)
      raceOnce.get().foreach { hook => raceOnce.set(None); hook() }
      if (publish(spark, root, v, lines)) return v
      attempt += 1 // lost the race: head moved; restage against new head
    }
    sys.error(s"Txn: lost the commit race $maxRetries times at $root")
  }

  private def retry(spark: SparkSession, root: String, maxRetries: Int)(
      stage: Int => Seq[String]): Int = {
    var attempt = 0
    while (attempt < maxRetries) {
      val v = currentVersion(spark, root) + 1
      val lines = stage(v)
      if (publish(spark, root, v, lines)) return v
      attempt += 1 // lost the race: head moved; restage against new head
    }
    sys.error(s"Txn: lost the commit race $maxRetries times at $root")
  }

  /** Snapshot read: the table at `version` (default: current head).
    * Reads EXACTLY the manifest's files — as ONE scan relation for
    * flat layouts and for r15's re-rooted partition layout
    * (`data/k=v/b<v>-part-*`, one `basePath = data` across every
    * commit), regardless of how many commits contributed; only legacy
    * pre-r15 partitioned batches (partition dirs nested inside batch
    * dirs) still read one relation per batch (see readFiles). An
    * EMPTY snapshot (overwrite with a frame that matched nothing)
    * reads as an empty frame with the committed `#schema`. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.read: no committed version at $root")
    val lines = snapshotLines(spark, root, v)
    val data = lines.filterNot(isMeta)
    val rels = data.map(linePath)
    if (rels.isEmpty) emptyFrame(spark, root, lines)
    else readMasked(spark, root, rels, dvByPath(data), schemaLine(lines),
      colmapOf(lines))
  }

  private def emptyFrame(spark: SparkSession, root: String,
      lines: Seq[String]): DataFrame = {
    val schema = schemaLine(lines).getOrElse(
      sys.error(s"Txn: empty snapshot without a #schema line at $root"))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def readFiles(spark: SparkSession, root: String,
      rels: Seq[String], schema: Option[StructType] = None,
      colmap: Map[String, String] = Map.empty): DataFrame = {
    // COLUMN MAPPING (r16): `schema` is the committed LOGICAL shape;
    // files store PHYSICAL names. The parquet reader gets the physical
    // schema (so every file — pre- and post-rename — matches by its
    // storage name), then the frame renames back to logical. A
    // colmap'd table always carries a #schema line, so the
    // mergeSchema fallback below never needs translation.
    // Snapshots read as the FEWEST scan relations the layout allows —
    // one relation per contributing commit makes plan size, not data,
    // the read cost on a streaming-publish table (BenchTxnLog measured
    // 201 relations / 16.5s for 20k rows before the r14 flat fast
    // path; the r15 re-rooted partition layout extends the same fix to
    // partitioned tables). Three file groups:
    //  - FLAT files (no k=v segment): one relation, no basePath;
    //  - RE-ROOTED partitioned files (r15 staging — the partition dir
    //    is the FIRST segment, `k=v/b<v>-part-*`): one relation with
    //    `basePath = data`, so Spark's own partition discovery
    //    recovers the partition columns across every commit at once
    //    (grouped by partition-column signature — two eras partitioned
    //    on DIFFERENT columns cannot share one discovery);
    //  - LEGACY partitioned files (pre-r15 — partition dirs nested
    //    inside batch dirs) keep the one-relation-per-batch shape,
    //    because no single basePath spans batch segments (Spark reads
    //    the non-k=v batch dir as a conflicting structure).
    //
    // SCHEMA: when the caller passes the snapshot's committed #schema,
    // every group reads with it EXPLICITLY — the parquet reader
    // NULL-fills missing columns and up-casts narrower physical types
    // (Spark 4 widening promotion), which is what makes r15 type
    // widening readable AND removes the per-file footer read
    // mergeSchema pays; partition values cast to the committed type
    // instead of re-inferring per read. Without a schema (pre-schema
    // manifests), mergeSchema keeps the old NULL-fill semantics —
    // footer merging refuses an int/long mix, so widened tables
    // always carry a schema line (every r15 writer records one).
    // allowMissingColumns unions the groups for the same reason.
    val (partitioned, flat) =
      rels.partition(_.split('/').exists(_.contains('=')))
    val (rooted, legacy) =
      partitioned.partition(_.takeWhile(_ != '/').contains('='))
    def rd = schema.fold(spark.read.option("mergeSchema", "true"))(s =>
      // nullable everywhere: older files may lack columns entirely
      spark.read.schema(
        StructType(s.fields.map(f => f.copy(
          name = physName(colmap, f.name), nullable = true)))))
    def partSig(r: String): String = r.split('/').init
      .filter(_.contains('=')).map(_.takeWhile(_ != '=')).mkString(",")
    val groups =
      (if (flat.isEmpty) Nil
       else Seq(rd.parquet(flat.map(r => s"$root/data/$r"): _*))) ++
      rooted.groupBy(partSig).toSeq.sortBy(_._1).map { case (_, fs0) =>
        rd.option("basePath", s"$root/data")
          .parquet(fs0.map(r => s"$root/data/$r"): _*)
      } ++
      legacy.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
        .map { case (batch, fs0) =>
          rd.option("basePath", s"$root/data/$batch")
            .parquet(fs0.map(r => s"$root/data/$r"): _*)
        }
    val out = groups.reduce(_.unionByName(_, allowMissingColumns = true))
    if (colmap.isEmpty || schema.isEmpty) out
    else out.select(schema.get.fields.map(f =>
      col(s"`${physName(colmap, f.name)}`").as(f.name)).toSeq: _*)
  }

  /** The snapshot's files that can intersect EVERY `(col, lo, hi)`
    * predicate — per predicate, a file survives when it has no
    * recorded range for that column (skipping is an optimization,
    * never a filter; legacy unnamed ranges answer any column) or the
    * range overlaps [lo, hi]. A conjunction, so each extra predicate
    * can only SHRINK the file set — the Delta multi-column
    * data-skipping shape. */
  def filesForPreds(spark: SparkSession, root: String,
      preds: Seq[(String, Double, Double)],
      version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.filesForPreds: no committed version at $root")
    // a Spark job over the entries frame (r16) — per predicate a file
    // survives when it records no usable range for the column (a NaN
    // bound — legacy manifests — means "cannot skip", the same
    // no-stats fallback as touchedFiles; a legacy UNNAMED range
    // answers any column) or the range overlaps [lo, hi]
    val cm = colmapOf(rawLines(spark, root, v))
    resolveEntries(spark, root, v) match {
      case Left(entries) =>
        entries.collect {
          case e if preds.forall { case (c0, lo, hi) =>
            e.statsFor(physName(cm, c0)).forall { case (mn, mx) =>
              mn.isNaN || mx.isNaN || (mx >= lo && mn <= hi) }
          } => e.path
        }.sorted
      case Right(df) =>
        val cond = preds.map { case (c0, lo, hi) =>
          val c = physName(cm, c0) // stats keys are physical
          val st = coalesce(col("nstats")(c), col("nstats")(""))
          st.isNull || isnan(st("lo")) || isnan(st("hi")) ||
            (st("hi") >= lit(lo) && st("lo") <= lit(hi))
        }.reduce(_ && _)
        df.where(cond)
          .select("path").collect().map(_.getString(0)).toSeq.sorted
    }
  }

  /** Single-predicate form of [[filesForPreds]], kept for callers on
    * tables that declared EXACTLY ONE stats column (it cannot name
    * which column the range means — prefer the named
    * [[filesForPreds]]). On a multi-column-stats table an entry is
    * always KEPT: matching "any recorded range" there could silently
    * false-skip a file whose intended column has no recorded stats
    * while an unrelated column's range misses (r13 advice) — the
    * conservative keep is the only correct unnamed answer. NaN bounds
    * (legacy manifests) also keep. */
  def filesForRange(spark: SparkSession, root: String, lo: Double,
      hi: Double, version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.filesForRange: no committed version at $root")
    resolveEntries(spark, root, v) match {
      case Left(entries) =>
        entries.collect {
          case e if e.stats.size != 1 => e.path
          case e if e.stats.values.exists { case (mn, mx) =>
            mn.isNaN || mx.isNaN || (mx >= lo && mn <= hi) } => e.path
        }.sorted
      case Right(df) =>
        val keep = size(map_keys(col("nstats"))) =!= 1 ||
          exists(map_values(col("nstats")), st =>
            isnan(st("lo")) || isnan(st("hi")) ||
              (st("hi") >= lit(lo) && st("lo") <= lit(hi)))
        df.where(keep)
          .select("path").collect().map(_.getString(0)).toSeq.sorted
    }
  }

  /** SKIP-SCAN snapshot read under a CONJUNCTION of range predicates:
    * reads ONLY the files whose manifest stats can hold matches on
    * every predicate (plus any files missing a predicate's stats) —
    * the Iceberg/Delta multi-column data-skipping shape: at 100 TB a
    * selective two-column slice (date AND customer, say) touches the
    * manifest (driver metadata) and the files in the INTERSECTION of
    * both ranges, not the union either column would open alone. The
    * residual predicates still apply, so the result is exactly the
    * filtered snapshot regardless of how files overlap. */
  def readWhereAll(spark: SparkSession, root: String,
      preds: Seq[(String, Double, Double)],
      version: Option[Int] = None): DataFrame = {
    require(preds.nonEmpty, "Txn.readWhereAll: no predicates")
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.readWhereAll: no committed version at $root")
    val files = filesForPreds(spark, root, preds, Some(v))
    val lines = snapshotLines(spark, root, v)
    val base =
      if (files.isEmpty) emptyFrame(spark, root, lines)
      else readMasked(spark, root, files,
        dvByPath(lines.filterNot(isMeta)), schemaLine(lines),
        colmapOf(lines))
    preds.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.where(col(c).try_cast("double") >= lo && col(c).try_cast("double") <= hi)
    }
  }

  /** Single-column [[readWhereAll]]: `statsCol BETWEEN lo AND hi`. */
  def readWhere(spark: SparkSession, root: String, statsCol: String,
      lo: Double, hi: Double, version: Option[Int] = None): DataFrame =
    readWhereAll(spark, root, Seq((statsCol, lo, hi)), version)

  /** THE ordering Spark's string min/max and comparisons use —
    * UTF8String's own binary comparator, not a re-implementation
    * (Scala's String compare works in UTF-16 code units and disagrees
    * past the BMP; a disagreement in the skip direction would
    * silently drop in-range rows). */
  private def utf8Cmp(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** The snapshot's files whose recorded STRING range for `c` can
    * intersect [lo, hi] (binary UTF8 order, the collation the string
    * stats were collected under) — files recording no string range
    * for `c` always survive: skipping is an optimization, never a
    * filter. */
  def filesForStrRange(spark: SparkSession, root: String, c: String,
      lo: String, hi: String, version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.filesForStrRange: no committed version at $root")
    // Spark's own string comparison IS binary UTF8 order (the
    // collation the stats were collected under — utf8Cmp delegates to
    // the same UTF8String.compareTo), so running the overlap test as
    // a Spark job over the entries frame cannot disagree with the
    // residual predicate's skip direction
    val cp = physName(colmapOf(rawLines(spark, root, v)), c)
    resolveEntries(spark, root, v) match {
      case Left(entries) =>
        entries.collect {
          case e if e.strStatsFor(cp).forall { case (mn, mx) =>
            utf8Cmp(mx, lo) >= 0 && utf8Cmp(mn, hi) <= 0 } => e.path
        }.sorted
      case Right(df) =>
        val ss = col("sstats")(cp)
        df.where(ss.isNull || (ss("hi") >= lit(lo) && ss("lo") <= lit(hi)))
          .select("path").collect().map(_.getString(0)).toSeq.sorted
    }
  }

  /** STRING-RANGE skip-scan — `SELECT * WHERE c BETWEEN lo AND hi` on
    * a string stats column: the date-string / id-prefix slice shape
    * (a `day` column laid out by range folds a month's query to the
    * month's files — at 100 TB the dominant slice predicate is very
    * often a STRING date). Reads only [[filesForStrRange]]'s
    * survivors, then applies the exact residual predicate (binary
    * UTF8 comparison both sides), so the result is exact however
    * files overlap; NULLs never match (SQL BETWEEN), and an inverted
    * range returns the typed empty result exactly like the numeric
    * siblings (SQL BETWEEN semantics — never a throw). */
  def readWhereStr(spark: SparkSession, root: String, c: String,
      lo: String, hi: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.readWhereStr: no committed version at $root")
    val files = filesForStrRange(spark, root, c, lo, hi, Some(v))
    val lines = snapshotLines(spark, root, v)
    val base =
      if (files.isEmpty) emptyFrame(spark, root, lines)
      else readMasked(spark, root, files,
        dvByPath(lines.filterNot(isMeta)), schemaLine(lines),
        colmapOf(lines))
    base.where(col(c) >= lit(lo) && col(c) <= lit(hi))
  }

  /** Candidate files for a POINT-KEY lookup: every file whose recorded
    * `keyCol` stats (numeric range/bloom over TRY_CAST-to-double, or
    * string range/bloom over raw UTF8 — r15) can contain a key — the
    * read-side twin of [[commitDelete]]'s touched-file pruning, ONE
    * shared routine since r15 so the two sides cannot drift.
    * Distributed: the keys frame is never collected, only matched
    * file paths come back. Soundness guards are PER KEY (see
    * touchedFiles): a key the stats surface cannot reason about
    * (cast-null on a numeric-stats table, non-string key against
    * string stats) excludes nothing and keeps every informed file a
    * candidate — pruning is an optimization, never a filter. */
  def filesForKeys(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.filesForKeys: no committed version at $root")
    val keyRows = keys.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
    touchedFiles(spark, root, v, keyRows, keyCol).toSeq.sorted
  }

  /** POINT-KEY snapshot read — `SELECT * WHERE keyCol IN (keys)`, the
    * serving-path lookup (and the read half of the GDPR flow: show me
    * this user's rows): opens ONLY [[filesForKeys]]' candidates —
    * with per-file blooms recorded, a k-key lookup on a 100 TB table
    * whose every [min,max] spans the key domain opens ≤ k files plus
    * false positives instead of the table — then an exact semi-join
    * on the ORIGINAL key column keeps the result independent of how
    * files overlap. NULL keys match nothing (SQL IN semantics). */
  def readKeys(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.readKeys: no committed version at $root")
    val keyRows = keys.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
    val files = filesForKeys(spark, root, keys, keyCol, Some(v))
    val lines = snapshotLines(spark, root, v)
    if (files.isEmpty) emptyFrame(spark, root, lines)
    else readMasked(spark, root, files,
        dvByPath(lines.filterNot(isMeta)), schemaLine(lines),
        colmapOf(lines))
      .join(keyRows, Seq(keyCol), "left_semi")
  }

  /** INCREMENTAL CHANGE READ: the rows ADDED between `sinceVersion`
    * (exclusive) and `untilVersion` (inclusive, default head) — the
    * poll-the-manifest consumer pattern: a downstream job remembers the
    * last version it processed and reads exactly the new files, never
    * rescanning the table (appends and streaming publishes are
    * file-additive, so file-set difference IS the row delta). NOTE the
    * contract: overwrite/replace/compact commits REWRITE data — their
    * "new" files repeat rows an incremental consumer may have seen;
    * consumers of such tables should key on the version kind or
    * consume snapshots instead (the same caveat Delta's CDF solves by
    * writing explicit change files). Returns an empty typed frame when
    * nothing changed. */
  def readChanges(spark: SparkSession, root: String, sinceVersion: Int,
      untilVersion: Option[Int] = None): DataFrame = {
    val until = untilVersion.getOrElse(currentVersion(spark, root))
    require(sinceVersion >= 0 && until >= sinceVersion,
      s"readChanges: bad version range $sinceVersion..$until")
    val untilLines = snapshotLines(spark, root, until)
    val before =
      if (sinceVersion == 0) Set.empty[String]
      else snapshotFiles(spark, root, sinceVersion).toSet
    val added = untilLines.filterNot(isMeta).map(linePath)
      .filterNot(before)
    if (added.isEmpty) emptyFrame(spark, root, untilLines)
    else readMasked(spark, root, added,
      dvByPath(untilLines.filterNot(isMeta)), schemaLine(untilLines),
      colmapOf(untilLines))
  }

  /** CHANGE DATA FEED across ALL commit kinds — the rewrite-safe
    * sibling of [[readChanges]] (whose file-additive contract breaks
    * the day someone compacts): every row changed between
    * `sinceVersion` (exclusive) and `untilVersion` (inclusive), with
    * `_change_type` ('insert' | 'delete') and `_commit_version` (the
    * commit that made the change). Derived from per-commit file-set
    * deltas: a commit's added files are its inserts, its removed
    * files re-read as deletes — so an overwrite emits delete+insert,
    * a [[commitDelete]] emits exactly the purged rows as deletes plus
    * the rewritten survivors' churn, and a [[compact]] emits a
    * self-cancelling delete+insert of the folded rows (net zero to a
    * multiset consumer, the honest representation of a rewrite
    * computed AFTER the fact — Delta avoids the re-read by writing
    * explicit change files at commit time; this computes the same
    * feed from the manifests alone). Cost is bounded by the files
    * that actually changed per commit, never a table rescan; applying
    * inserts minus deletes as multisets reproduces exactly
    * snapshot(until) from snapshot(since) (spec + gate-pinned).
    * Rows in files carried VERBATIM across commits never appear.
    *
    * Schema across the span (the Delta CDF contract): every step reads
    * under UNTIL's committed schema — change rows carry the table's
    * CURRENT shape, older files NULL-fill missing columns and narrow
    * types read up. Consequently a span crossing an OVERWRITE that
    * incompatibly RETYPED a column (int → string) throws at the
    * parquet scan (the old era's physical type cannot read as the new
    * one), and old-era columns absent from UNTIL's schema are dropped
    * from the change rows — read such histories in two spans split at
    * the overwrite, each under its own era's schema. */
  def readChangesCdf(spark: SparkSession, root: String, sinceVersion: Int,
      untilVersion: Option[Int] = None): DataFrame = {
    val until = untilVersion.getOrElse(currentVersion(spark, root))
    require(sinceVersion >= 0 && until >= sinceVersion,
      s"readChangesCdf: bad version range $sinceVersion..$until")
    val untilLines = snapshotLines(spark, root, until)
    val empty = emptyFrame(spark, root, untilLines)
      .withColumn("_change_type", lit("").cast("string"))
      .withColumn("_commit_version", lit(0))
    cdfStepFrames(spark, root, sinceVersion, until)
      .foldLeft(empty)(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[readChangesCdf]]'s per-step frames, WITHOUT the typed
    * empty-frame fold seed — the ONE copy of the CDF step
    * construction (the batch read folds these over its seed; the
    * streaming source unions them bare, because the seed's RDD leaf
    * cannot be re-flagged streaming and "no steps" maps to the
    * source's own empty streaming frame). Per-commit diffs come
    * straight off each delta manifest's own add/rm action lines
    * (O(touched) per commit); only full-listing commits
    * (overwrite/compact) pay a resolved-set difference. Every step
    * reads under UNTIL's committed schema (the Delta/Iceberg CDF
    * contract: change rows carry the table's current shape — older
    * files NULL-fill missing columns and read narrow types up);
    * without it, a removed-set spanning a widening commit would hand
    * mergeSchema an unmergeable int/long mix. */
  private[graft] def cdfStepFrames(spark: SparkSession, root: String,
      sinceVersion: Int, untilVersion: Int): Seq[DataFrame] = {
    require(sinceVersion >= 0 && untilVersion >= sinceVersion,
      s"cdfStepFrames: bad version range $sinceVersion..$untilVersion")
    val untilLines = snapshotLines(spark, root, untilVersion)
    val schema = schemaLine(untilLines)
    val cm = colmapOf(untilLines) // CDF contract: rows carry UNTIL's shape
    // DV-aware feed: each side reads under ITS version's masks (the
    // insert side of a delete_dv commit is the file's post-mask state,
    // the delete side its pre-mask state — multiset net = exactly the
    // newly-masked rows, the same self-cancelling-rewrite shape a
    // compact emits). prevDv threads forward so each version's lines
    // resolve once per span.
    var prevDv: Map[String, Seq[String]] =
      if (sinceVersion == 0) Map.empty
      else dvByPath(snapshotLines(spark, root, sinceVersion)
        .filterNot(isMeta))
    ((sinceVersion + 1) to untilVersion).flatMap { v =>
      val (added, removed) = fileDiff(spark, root, v)
      val curDv = dvByPath(snapshotLines(spark, root, v).filterNot(isMeta))
      val out = Seq(("insert", v, added, curDv),
          ("delete", v, removed, prevDv))
        .filter(_._3.nonEmpty).map { case (kind, vv, fs0, dvm) =>
          readMasked(spark, root, fs0, dvm, schema, cm)
            .withColumn("_change_type", lit(kind))
            .withColumn("_commit_version", lit(vv))
        }
      prevDv = curDv
      out
    }
  }

  /** EXPIRE the oldest manifests, keeping the newest `keepLast`
    * versions time-travelable — the Delta log-retention / Iceberg
    * `expire_snapshots` maintenance verb, and the bound that keeps a
    * streaming-publish-cadence table's `_manifests/` from growing
    * O(commits) forever: after expiry, every metadata walk
    * ([[vacuum]]'s live set, tag resolution, head fallback listing)
    * touches only the retained window.
    *
    * Tag consolidation first: a surviving manifest's `#tagbase:<w>`
    * resolves through `t<w>.tags` with a defensive fallback of
    * re-reading manifest w — which is exactly what expiry deletes. So
    * for every base a SURVIVOR references, the tags file is
    * materialized (rename-no-overwrite, deterministic bytes) BEFORE
    * any manifest is removed; idempotence checks — including tags
    * committed long before the window — stay exact across expiry.
    * Tags files themselves are never expired (they are the
    * checkpoint, a few KB bounded by tags/[[tagCheckpointEvery]]).
    *
    * Expired versions' DATA files are not touched here: once no
    * surviving manifest references them they leave [[vacuum]]'s live
    * set and age out under its retention gate. Reading an expired
    * version throws with a clear message. Single-maintainer verb
    * (like Delta's retention): run it from the table's owner, not
    * concurrently with time-travel readers of the expiring tail.
    *
    * Tags files a surviving manifest references are never expired
    * (they ARE the checkpoint); SUPERSEDED checkpoints — tag files
    * whose every referencing manifest has itself expired (later
    * rolls consolidate them into newer files) — are reclaimed, so
    * `_manifests/` stays bounded by the window, not by table age.
    * Returns the versions removed. */
  def expireManifests(spark: SparkSession, root: String,
      keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val f = fs(spark, root)
    val versions = survivingVersions(spark, root)
    if (versions.isEmpty) return Nil
    val head = versions.max
    val expiring = versions.filter(_ <= head - keepLast)
    if (expiring.isEmpty) return Nil
    val expSet = expiring.toSet
    val survivors = versions.filterNot(expSet)
    // a surviving DELTA manifest's chain walks v → v-1 → … through
    // versions about to be deleted: materialize the OLDEST survivor's
    // full listing as a sidecar checkpoint while the chain is still
    // intact — every later survivor's walk passes through it (bases
    // are always v-1) and stops there, so expiry never strands a
    // resolvable snapshot
    survivors.minOption.foreach { s =>
      if (!f.exists(checkpointPath(root, s))) {
        writeParquetCheckpointIfAbsent(spark, root, s)
        writeCheckpointIfAbsent(spark, root, s,
          resolvedData(spark, root, s))
      }
    }
    // consolidate: every base a survivor references must have its
    // tags file on disk before the fallback chain disappears
    val referenced = survivors.flatMap { v =>
      tagBase(rawLines(spark, root, v))
    }.toSet
    referenced.foreach { w =>
      if (!f.exists(tagsFilePath(root, w)))
        writeTagsFileIfAbsent(spark, root, w,
          resolveTags(spark, root, snapshotLines(spark, root, w))
            .distinct.sorted)
    }
    expiring.foreach(v => f.delete(manifestPath(root, v), false))
    // superseded checkpoints: an expiring-version tags file no
    // survivor references can never be read again (future rolls
    // checkpoint at the then-head, never at an expired version)
    f.listStatus(manifestDir(root))
      .filter(_.getPath.getName.matches("t\\d+\\.tags"))
      .map(s => s.getPath)
      .filter { p =>
        val w = p.getName.stripPrefix("t").stripSuffix(".tags").toInt
        expSet.contains(w) && !referenced.contains(w)
      }
      .foreach(f.delete(_, false))
    // expired-version sidecar checkpoints are unreachable (no
    // survivor's chain walks below the oldest survivor's checkpoint)
    f.listStatus(manifestDir(root))
      .filter(_.getPath.getName.matches("c\\d+\\.checkpoint"))
      .map(_.getPath)
      .filter { p =>
        val w = p.getName.stripPrefix("c").stripSuffix(".checkpoint").toInt
        expSet.contains(w)
      }
      .foreach(f.delete(_, false))
    // ...and their parquet twins (directories)
    f.listStatus(manifestDir(root))
      .filter(_.getPath.getName.matches("c\\d+\\.cpq"))
      .map(_.getPath)
      .filter { p =>
        val w = p.getName.stripPrefix("c").stripSuffix(".cpq").toInt
        expSet.contains(w)
      }
      .foreach(f.delete(_, true))
    expiring
  }

  /** Delete data files no committed manifest references and stale temp
    * manifests (crash leftovers) — RETENTION-GATED: only files older
    * than `olderThanMs` are touched, so vacuum can never reclaim a
    * concurrent committer's just-staged batch out from under its
    * publish (the Delta retention-period discipline; pass 0 only when
    * no commit can be in flight). Keeps every committed snapshot
    * readable — time travel survives vacuum; after
    * [[expireManifests]], the live set is built from the SURVIVING
    * manifests only, so expired history's files become reclaimable.
    * Returns files removed. */
  def vacuum(spark: SparkSession, root: String,
      olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs(spark, root)
    val cutoff = System.currentTimeMillis() - olderThanMs
    val allData = survivingVersions(spark, root)
      .flatMap(v => snapshotLines(spark, root, v).filterNot(isMeta))
    val live = allData.map(linePath).toSet
    // DV sidecars any surviving manifest references stay live — their
    // part files sit under data/ but are referenced through `__dv:`
    // fields, not data lines; once every referencing version expires
    // they age out like any orphan
    val liveDv = allData.iterator.filter(_.contains("\t__dv:"))
      .flatMap(l => parseEntryLine(l).dvs).toSet
    def underLiveDv(rel: String): Boolean =
      liveDv.exists(d => rel.startsWith(d + "/"))
    var removed = 0
    val dataDir = new Path(s"$root/data")
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val base = dataDir.toUri.getPath
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
        val name = st.getPath.getName
        if (st.isFile && !live.contains(rel) && !underLiveDv(rel) &&
            st.getModificationTime < cutoff &&
            !name.startsWith("_") && !name.startsWith(".")) {
          f.delete(st.getPath, false); removed += 1
        }
      }
    }
    // abandoned batch/stage directories (losers of commit races,
    // vacuumed histories, crashed partitioned stages) would otherwise
    // accumulate forever holding only _SUCCESS/hidden markers the
    // file sweep skips (r10 advice): remove such a dir when it holds
    // NO live or data file at all and is past the retention window —
    // a mid-commit stage dir always holds young data files, so it is
    // never eligible. ATTEMPT-SCOPED DIRS ONLY (`b<ver>-…` /
    // `.stage-…`): a SHARED partition dir (`k=v`, r15 layout) is
    // never deleted even when empty, because a concurrent partitioned
    // commit may be renaming a just-staged young file INTO it between
    // this sweep's scan and the recursive delete — the scan's
    // emptiness is stale the moment it returns for a dir more than
    // one writer can target, so the "always holds young files" shield
    // only holds for dirs exactly one attempt writes (r15 review). An
    // empty partition dir is harmless: bounded by partition
    // cardinality and reused by the next commit to that value.
    def attemptScoped(name: String): Boolean = !name.contains('=')
    if (f.exists(dataDir)) {
      val base = dataDir.toUri.getPath
      f.listStatus(dataDir)
        .filter(d => d.isDirectory && attemptScoped(d.getPath.getName))
        .foreach { d =>
        val it2 = f.listFiles(d.getPath, true)
        var hasData = false
        while (it2.hasNext && !hasData) {
          val st = it2.next()
          val rel = st.getPath.toUri.getPath.stripPrefix(base)
            .stripPrefix("/")
          val name = st.getPath.getName
          if (st.isFile && (live.contains(rel) ||
              (!name.startsWith("_") && !name.startsWith("."))))
            hasData = true
        }
        if (!hasData && d.getModificationTime < cutoff)
          f.delete(d.getPath, true)
      }
    }
    val md = manifestDir(root)
    if (f.exists(md))
      f.listStatus(md).filter(s => s.getPath.getName.startsWith(".tmp-") &&
          s.getModificationTime < cutoff)
        .foreach(s => f.delete(s.getPath, false))
    removed
  }
}
