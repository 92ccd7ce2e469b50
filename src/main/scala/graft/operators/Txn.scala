package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-based ATOMIC multi-partition table commit — the lakehouse
  * primitive the ETL family's directory writers (partition overwrite,
  * compaction, index swaps) lack on their own: those mutate directories
  * in place, so a reader listing mid-publish can see a torn table. Here
  * a table is a directory convention
  *
  * {{{
  *   root/data/b00001/…            // each commit's files, own subdir
  *   root/_manifests/v00001.manifest
  * }}}
  *
  * and the CURRENT table state is defined exclusively by the
  * highest-versioned manifest: a newline list of data-file paths
  * relative to `root/data`. Commits write ALL data files first (under a
  * fresh per-commit batch directory — file names can never collide with
  * a live snapshot), then publish by writing the manifest to a hidden
  * temp name and renaming it to `v<next>.manifest`. The rename is the
  * commit point:
  *
  *  - ATOMIC VISIBILITY — a file rename is atomic on POSIX and HDFS, so
  *    a reader resolving the manifest list sees the new version fully
  *    or not at all; data files referenced by it are already complete.
  *    Torn reads are impossible BY CONSTRUCTION, not by timing.
  *  - OPTIMISTIC CONCURRENCY — rename(+create) onto an existing name
  *    fails, so two racing committers cannot both win one version
  *    number; the loser re-reads the head and retries against the next
  *    version (Delta/Iceberg's commit protocol shape).
  *  - TIME TRAVEL — previous manifests (and the files they reference,
  *    which commits never delete) remain readable: `read(root, v)` is a
  *    snapshot read at version v, the file-layer form of
  *    etl_bitemporal's as-of semantics.
  *  - CRASH SAFETY — a crash before the rename leaves orphan data files
  *    under an unreferenced batch dir and a hidden temp manifest;
  *    neither is visible to any reader, and `vacuum` reclaims them.
  *
  * Scale: commit metadata is one file listing + one small file write —
  * O(files), no data pass beyond the write itself; reads prune to
  * exactly the listed files (and partition-directory values survive via
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

  /** Highest committed version, 0 if the table has none. */
  def currentVersion(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val dir = manifestDir(root)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .foldLeft(0)(math.max)
  }

  /** One manifest entry: a data file plus (optionally) the min/max of
    * the table's declared stats column within that file — the
    * Iceberg/Delta file-skipping metadata, one numeric column's worth. */
  final case class Entry(path: String, min: Option[Double],
      max: Option[Double])

  /** Raw manifest lines of snapshot `v` — the carry-forward unit, so
    * appends and partition replaces preserve sibling files' stats. */
  private def snapshotLines(spark: SparkSession, root: String,
      v: Int): Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  private def linePath(line: String): String = line.split('\t')(0)

  /** Manifest entries of snapshot `v` (path [TAB min TAB max]). */
  def snapshotEntries(spark: SparkSession, root: String,
      v: Int): Seq[Entry] =
    snapshotLines(spark, root, v).map { line =>
      line.split('\t') match {
        case Array(p)         => Entry(p, None, None)
        case Array(p, lo, hi) => Entry(p, Some(lo.toDouble), Some(hi.toDouble))
        case _ => sys.error(s"Txn: malformed manifest line: $line")
      }
    }

  /** Data-file paths (relative to `root/data`) of snapshot `v`. */
  def snapshotFiles(spark: SparkSession, root: String, v: Int): Seq[String] =
    snapshotEntries(spark, root, v).map(_.path)

  /** Write `df`'s files under a fresh batch dir; returns their manifest
    * LINES (root-relative path, plus TAB-separated min/max of
    * `statsCol` when declared) WITHOUT publishing anything. Stats come
    * from ONE distributed pass grouped by input_file_name — the driver
    * receives only (file, min, max), bounded by the file count. */
  private def stageBatch(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String], batchTag: String,
      statsCol: Option[String] = None): Seq[String] = {
    val dir = s"$root/data/$batchTag"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir)
    val f = fs(spark, root)
    val it = f.listFiles(new Path(dir), true)
    val base = new Path(s"$root/data").toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
    }
    val paths = out.toSeq.sorted
    statsCol.fold(paths) { c =>
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("__f"))
        .agg(min(col(c).cast("double")).as("__lo"),
          max(col(c).cast("double")).as("__hi"))
        .collect() // bounded by file count — manifest metadata, not data
        .flatMap { r =>
          val rel = new Path(r.getString(0)).toUri.getPath
            .stripPrefix(base).stripPrefix("/")
          if (r.isNullAt(1) || r.isNullAt(2)) None
          else Some(rel -> (r.getDouble(1), r.getDouble(2)))
        }.toMap
      paths.map { p =>
        stats.get(p).fold(p) { case (lo, hi) => s"$p\t$lo\t$hi" }
      }
    }
  }

  /** Atomically publish `files` as version `v` (expects `v` free).
    * Returns false when another committer already took `v`. */
  private def publish(spark: SparkSession, root: String, v: Int,
      files: Seq[String]): Boolean = {
    val f = fs(spark, root)
    f.mkdirs(manifestDir(root))
    val target = manifestPath(root, v)
    if (f.exists(target)) return false
    val tmp = new Path(manifestDir(root),
      s".tmp-${java.util.UUID.randomUUID().toString}")
    val os = f.create(tmp, false)
    try os.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()
    // rename-no-overwrite IS the commit point: atomic on POSIX/HDFS,
    // fails (not clobbers) if a racing committer won the version
    val won = f.rename(tmp, target)
    if (!won) f.delete(tmp, false)
    won
  }

  /** Commit `df` as the COMPLETE new snapshot (full overwrite).
    * `statsCol` (numeric) records per-file min/max in the manifest for
    * [[readWhere]] file skipping. */
  def commitOverwrite(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, maxRetries: Int = 5,
      statsCol: Option[String] = None): Int =
    retry(spark, root, maxRetries) { v =>
      stageBatch(spark, root, df, partitionBy, f"b$v%05d", statsCol)
    }

  /** Commit `df` as an APPEND: new snapshot = previous files + df's. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, maxRetries: Int = 5,
      statsCol: Option[String] = None): Int =
    retry(spark, root, maxRetries) { v =>
      val prev = if (v == 1) Nil else snapshotLines(spark, root, v - 1)
      prev ++ stageBatch(spark, root, df, partitionBy, f"b$v%05d", statsCol)
    }

  /** IDEMPOTENT tagged append — the exactly-once streaming-sink
    * primitive (Delta's txnAppId/txnVersion dedup, keyed here by the
    * batch `tag`): if the current snapshot already carries files under
    * `data/<tag>/`, the commit short-circuits to None WITHOUT staging —
    * a replayed micro-batch (checkpoint recovery, task retry at the
    * driver level) cannot double-append. Single writer per tag assumed
    * (a streaming query IS single-writer per checkpoint); distinct tags
    * from concurrent writers serialize through the optimistic-rename
    * retry like any other commit. */
  def commitAppendIdempotent(spark: SparkSession, root: String,
      df: DataFrame, tag: String, partitionBy: Seq[String] = Nil,
      maxRetries: Int = 5): Option[Int] = {
    require(tag.nonEmpty && !tag.contains("/") && !tag.startsWith("b"),
      s"tag must be a non-empty dir name not colliding with b<version> dirs: $tag")
    val head = currentVersion(spark, root)
    val committed = head >= 1 &&
      snapshotFiles(spark, root, head).exists(_.startsWith(tag + "/"))
    if (committed) None
    else Some(retry(spark, root, maxRetries) { v =>
      val prev = if (v == 1) Nil else snapshotLines(spark, root, v - 1)
      if (prev.exists(l => linePath(l).startsWith(tag + "/"))) prev // raced
      else prev ++ stageBatch(spark, root, df, partitionBy, tag)
    })
  }

  /** Commit `df` as a PARTITION OVERWRITE on `partitionCol`: the new
    * snapshot replaces exactly the partition values `df` carries and
    * keeps every other partition's files — the dynamic-overwrite
    * semantics of etl_partition_overwrite, made atomic. */
  def commitReplacePartitions(spark: SparkSession, root: String,
      df: DataFrame, partitionCol: String, maxRetries: Int = 5): Int = {
    val vals = df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet // bounded: distinct partition values
    retry(spark, root, maxRetries) { v =>
      val prev = if (v == 1) Nil else snapshotLines(spark, root, v - 1)
      val kept = prev.filterNot { line =>
        linePath(line).split("/").exists { seg =>
          val i = seg.indexOf('=')
          i > 0 && seg.substring(0, i) == partitionCol &&
            vals.contains(seg.substring(i + 1))
        }
      }
      kept ++ stageBatch(spark, root, df, Seq(partitionCol), f"b$v%05d")
    }
  }

  private def retry(spark: SparkSession, root: String, maxRetries: Int)(
      stage: Int => Seq[String]): Int = {
    var attempt = 0
    while (attempt < maxRetries) {
      val v = currentVersion(spark, root) + 1
      val files = stage(v)
      if (publish(spark, root, v, files)) return v
      attempt += 1 // lost the race: head moved; restage against new head
    }
    sys.error(s"Txn: lost the commit race $maxRetries times at $root")
  }

  /** Snapshot read: the table at `version` (default: current head).
    * Reads EXACTLY the manifest's files. Files are grouped by their
    * batch directory and each group reads with ITS batch dir as
    * basePath (recovering partition-directory columns); groups union
    * by name — one scan relation per contributing commit, the same
    * shape Delta/Iceberg readers produce per file-group. Spark's
    * partition discovery cannot take one basePath across batch dirs
    * (the non-`k=v` batch segment between root and the partition dirs
    * reads as a conflicting structure). */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.read: no committed version at $root")
    readFiles(spark, root, snapshotFiles(spark, root, v))
  }

  private def readFiles(spark: SparkSession, root: String,
      rels: Seq[String]): DataFrame = {
    require(rels.nonEmpty, s"Txn: empty file selection at $root")
    val byBatch = rels.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
    byBatch.map { case (batch, fs0) =>
      spark.read.option("basePath", s"$root/data/$batch")
        .parquet(fs0.map(r => s"$root/data/$r"): _*)
    }.reduce(_ unionByName _)
  }

  /** The snapshot's files whose recorded [min, max] can intersect
    * [lo, hi] on the stats column — files committed WITHOUT stats are
    * kept (skipping is an optimization, never a filter). */
  def filesForRange(spark: SparkSession, root: String, lo: Double,
      hi: Double, version: Option[Int] = None): Seq[String] = {
    val v = version.getOrElse(currentVersion(spark, root))
    require(v >= 1, s"Txn.filesForRange: no committed version at $root")
    snapshotEntries(spark, root, v).collect {
      case Entry(p, None, None) => p
      case Entry(p, Some(mn), Some(mx)) if mx >= lo && mn <= hi => p
    }
  }

  /** SKIP-SCAN snapshot read: `statsCol BETWEEN lo AND hi`, reading
    * ONLY the files whose manifest stats can hold matches (plus any
    * stats-less files) — the Iceberg/Delta data-skipping shape: at
    * 100 TB a selective range touches the manifest (driver metadata)
    * and a handful of files, not the table. The residual predicate is
    * still applied, so the result is exactly the filtered snapshot
    * regardless of how files overlap. */
  def readWhere(spark: SparkSession, root: String, statsCol: String,
      lo: Double, hi: Double, version: Option[Int] = None): DataFrame = {
    val files = filesForRange(spark, root, lo, hi, version)
    if (files.isEmpty)
      read(spark, root, version)
        .where(col(statsCol).cast("double") >= lo &&
          col(statsCol).cast("double") <= hi)
        .limit(0)
    else
      readFiles(spark, root, files)
        .where(col(statsCol).cast("double") >= lo &&
          col(statsCol).cast("double") <= hi)
  }

  /** Delete data files no live manifest references and stale temp
    * manifests (crash leftovers). Keeps every committed snapshot
    * readable — time travel survives vacuum. */
  def vacuum(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    val live = (1 to currentVersion(spark, root))
      .filter(v => f.exists(manifestPath(root, v)))
      .flatMap(v => snapshotFiles(spark, root, v)).toSet
    var removed = 0
    val dataDir = new Path(s"$root/data")
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val base = dataDir.toUri.getPath
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
        val name = st.getPath.getName
        if (st.isFile && !live.contains(rel) &&
            !name.startsWith("_") && !name.startsWith(".")) {
          f.delete(st.getPath, false); removed += 1
        }
      }
    }
    val md = manifestDir(root)
    if (f.exists(md))
      f.listStatus(md).filter(_.getPath.getName.startsWith(".tmp-"))
        .foreach(s => f.delete(s.getPath, false))
    removed
  }
}
