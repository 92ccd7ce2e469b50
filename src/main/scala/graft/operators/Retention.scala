package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted record deletion over a bucketed keyed store — the
  * right-to-be-forgotten / retention-sweep primitive: given a key set
  * to erase, rewrite ONLY the bucket directories holding those keys,
  * leaving the rest of a 100 TB store untouched on disk.
  *
  * Same layout contract as the streaming upsert target
  * ([[graft.streaming.Streaming]] `upsertBatch`): the store is
  * partitioned by `graft_kb = pmod(xxhash64(keys), nBuckets)`. A
  * delete (a) computes the touched-bucket set from the DELETE keys
  * (≤ nBuckets ints to the driver, never key data), (b) reads back
  * just those buckets via partition pruning, (c) left-anti joins the
  * delete keys (broadcast — a forget list is always the bounded side),
  * and (d) dynamic-partition-overwrites only the touched directories.
  * Cost is O(|touched-bucket state| + |deletes|), not O(|store|) — at
  * nBuckets = 2¹⁴ over 100 TB, forgetting one user touches ~6 GB.
  *
  * A bucket whose every row is deleted needs special handling: dynamic
  * partition overwrite only replaces partitions PRESENT in the output,
  * so an all-deleted bucket would silently keep its old files — the
  * exact failure a deletion sweep cannot have. Those directories are
  * removed explicitly (their ids are already on the driver).
  */
object Retention {
  private val BucketCol = "graft_kb"

  /** Partition-level TTL sweep over a date-partitioned store: drop
    * every partition directory strictly OLDER than `cutoff` — the
    * retention policy a time-partitioned lake table runs nightly.
    * METADATA-ONLY: expired data is removed by deleting whole
    * partition directories from the listing; no data file is ever
    * opened, so sweeping 100 TB costs a directory listing plus one
    * delete per expired day. Surviving partitions keep their files
    * byte-identical (nothing is rewritten). The partition column must
    * be an ISO `yyyy-MM-dd` day string (lexicographic order == date
    * order — the reason ISO day strings are the standard partition
    * key).
    *
    * @return the dropped partition values, sorted. */
  def ttlSweep(spark: SparkSession, targetRoot: String,
      partitionCol: String, cutoff: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(targetRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partitionCol="
    val dropped = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath)
      .filter(_.getName.stripPrefix(prefix) < cutoff)
      .sortBy(_.getName)
    dropped.foreach(p => fs.delete(p, true))
    dropped.map(_.getName.stripPrefix(prefix))
  }

  /** Erase every row of `target` whose key tuple appears in `deletes`.
    * `deletes` carries the key columns only (extra columns ignored).
    * No-op (and no error) if the target does not exist yet. */
  def forgetKeys(spark: SparkSession, targetRoot: String,
      keyCols: Seq[String], deletes: DataFrame,
      nBuckets: Int = 16): Unit = {
    require(keyCols.nonEmpty, "forgetKeys: need key columns")
    val root = new org.apache.hadoop.fs.Path(targetRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val kb = pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets))
    val delKeys = deletes.select(keyCols.map(col): _*).distinct()
      .withColumn(BucketCol, kb)
      .localCheckpoint() // two consumers: bucket set + anti-join probe
    val touched = delKeys.select(BucketCol).distinct()
      .collect().map(_.getLong(0)) // bounded by nBuckets, never key data
    if (touched.isEmpty) return
    val prev = spark.read.parquet(targetRoot)
      .where(col(BucketCol).isin(touched: _*))
      .withColumn(BucketCol, col(BucketCol).cast("long"))
    val kept = prev.join(broadcast(delKeys.drop(BucketCol)),
      keyCols, "left_anti").localCheckpoint()
    // buckets that still hold rows rewrite via dynamic overwrite;
    // all-deleted buckets vanish by explicit directory removal
    val remaining = kept.select(BucketCol).distinct()
      .collect().map(_.getLong(0)).toSet
    graft.sinks.PartitionOverwriteSink(targetRoot, Seq(BucketCol))
      .write(kept)
    touched.filterNot(remaining).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$BucketCol=$b"), true)
    }
  }
}
