package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the lake-maintenance pass every streaming or
  * micro-batch writer eventually needs (cf. the reference's count-sink
  * batching, /root/reference/src/etlp/processors/stdout.clj — batch
  * boundaries become file boundaries): thousands of KB-sized part
  * files per partition turn every downstream scan into a
  * file-listing/task-scheduling exercise (at 100 TB, scan tasks should
  * be bounded by `maxPartitionBytes`, not file count).
  *
  * Spark-first shape: the target file COUNT comes from the actual
  * on-disk byte size (one driver-side FileSystem listing — metadata
  * only, no data reads), then ONE distributed pass rewrites the data
  * through a round-robin `repartition(n)` — the one legitimate use of
  * blind repartition, since the goal is uniform file sizes, not
  * key-locality. Readers of the compacted output get back their
  * pushdown + pruning (parquet footers per fewer, bigger files).
  * Writes go to a NEW directory (atomic swap is the caller's rename;
  * compacting in place would break concurrent readers mid-rewrite).
  */
object Compaction {

  /** Parquet directory stats from the FileSystem listing: (file count,
    * total bytes) of data files — metadata-only, no data read. */
  def dirStats(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")
    }
    (files.length, files.map(_.getLen).sum)
  }

  /** Rewrite `inDir` (parquet) into `outDir` as
    * ceil(totalBytes / targetFileBytes) files. Returns the DataFrame
    * over the COMPACTED output, so callers can chain reads/validation
    * off the rewritten data. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (nFiles, totalBytes) = dirStats(spark, inDir)
    require(nFiles > 0, s"compact: no data files under $inDir")
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
