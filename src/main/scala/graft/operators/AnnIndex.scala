package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTENT IVF-PQ index: train once, write the model to disk, serve
  * every future query batch from the stored artifact — the
  * FAISS-on-a-lake shape, and [[DedupIndex]]'s ANN sibling. The
  * stored layout IS the scale story:
  *
  *  - `$path/codes`: the encoded corpus (nid, s, cid), PARTITIONED BY
  *    CELL — a probe reads only its `nprobe` cell directories
  *    (partition pruning), so query cost scales with the probed share
  *    of the corpus, never its total size;
  *  - `$path/centroids` (cells rows) and `$path/codebooks`
  *    (m·codebookK rows): broadcast-sized model tables.
  *
  * Training and search both delegate to [[Ann]]'s IVF-PQ stages
  * ([[Ann.ivfpqTrain]] / [[Ann.ivfpqSearch]]), so the probe result is
  * IDENTICAL to the in-flight [[Ann.ivfpqTopK]] — spec-pinned, and
  * the gate query shares ann_ivfpq's oracle string. */
object AnnIndex {
  /** Train the IVF-PQ model on `candidates` and persist it. */
  def buildIvfPq(candidates: DataFrame, idCol: String, vecCol: String,
      path: String, cells: Int = 4, m: Int = 8, codebookK: Int = 8,
      dim: Int = 64): Unit = {
    val model = Ann.ivfpqTrain(candidates, idCol, vecCol, cells, m,
      codebookK, dim)
    model.cent.write.mode("overwrite").parquet(s"$path/centroids")
    model.cb.write.mode("overwrite").parquet(s"$path/codebooks")
    model.codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes")
  }

  /** Incremental index maintenance: encode a delta batch against the
    * STORED model (centroids + codebooks stay immutable — the standard
    * IVF append path; recall drift from a stale coarse quantizer is a
    * periodic-rebuild trigger, not an upsert concern) and APPEND the
    * new codes into their cell directories. The write is purely
    * additive — existing code files are never read or rewritten, and
    * untouched cells gain no files — so per-batch cost is
    * O(encode(delta) + write(delta)), cheaper than even the
    * bucket-pruned merge-by-key streaming upsert (no read-back). A
    * probe after the append sees base ∪ delta with every vector
    * encoded by the identical arithmetic ([[Ann.ivfpqEncode]] ==
    * the training encode stage). */
  def appendIvfPq(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, vecCol: String, m: Int = 8, dim: Int = 64): Unit = {
    val cent = spark.read.parquet(s"$path/centroids").localCheckpoint()
    val cb = spark.read.parquet(s"$path/codebooks").localCheckpoint()
    Ann.ivfpqEncode(delta, cent, cb, idCol, vecCol, m, dim)
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Code-file count across all cell directories — metadata-only
    * FileSystem listing (the [[Compaction.dirStats]] discipline). */
  def codeFileCount(spark: SparkSession, path: String): Int =
    DirSwap.fileCount(spark, s"$path/codes")

  /** Index COMPACTION: fold the delta files [[appendIvfPq]] accumulates
    * back into one file per cell. Every append leaves one more file in
    * each touched cell directory; after enough batches a probe's
    * pruned read degrades into a file-listing/task-scheduling exercise
    * (the [[Compaction]] rationale, inside an index). One distributed
    * pass: `repartition(col("cell"))` routes each cell's rows to
    * exactly one task, so the cell-partitioned rewrite emits exactly
    * one file per cell — restoring the build-time layout while
    * PRESERVING ROWS EXACTLY (codes carry deterministic (nid, s, cid)
    * values, so probe results are invariant — spec-pinned, and the
    * gate reuses the upsert gate's oracle). The rewrite lands in a
    * fresh directory and swaps in by rename-aside + rename-in.
    *
    * SWAP GUARANTEE: the [[DirSwap]] protocol's, exactly — one shared
    * implementation (r10 review: the swap/repair logic must not drift
    * between the ANN and dedup indexes). A probe that already LISTED
    * `codes` finishes intact; lister-in-window and crash-in-window are
    * torn states repaired by [[recoverCodes]] at the top of compact
    * and probe; true lister-in-window atomicity is [[Txn]]'s job.
    *
    * Centroids/codebooks are untouched — compaction is a layout
    * operation, never a re-train. Returns (files before, files after). */
  def compactIvfPq(spark: SparkSession, path: String): (Int, Int) = {
    recoverCodes(spark, path)
    val before = codeFileCount(spark, path)
    val tmp = s"$path/codes_compacting"
    spark.read.parquet(s"$path/codes")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    DirSwap.swapIn(spark, s"$path/codes", tmp)
    (before, codeFileCount(spark, path))
  }

  /** Crash repair for [[compactIvfPq]]'s swap window ([[DirSwap.recover]]
    * on the codes dir). */
  private[graft] def recoverCodes(spark: SparkSession, path: String): Unit =
    DirSwap.recover(spark, s"$path/codes")

  /** Top-k ANN against a stored index. The codes read is restricted to
    * the union of cells any query probes (≤ cells ints to the driver,
    * never vector data) — untouched cell directories contribute zero
    * input splits. */
  def probeIvfPq(spark: SparkSession, path: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 2,
      m: Int = 8, dim: Int = 64): DataFrame = {
    recoverCodes(spark, path) // repair a torn compaction swap (crash window)
    val cent = spark.read.parquet(s"$path/centroids").localCheckpoint()
    val cb = spark.read.parquet(s"$path/codebooks").localCheckpoint()
    // which cells does this query batch probe? assignment runs on the
    // broadcast-sized centroid table only — no codes touched yet
    val q = queries.select(col(idCol).as("query_id"),
      graft.functions.Vectors.toDouble(col(vecCol)).as("xq"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(round(col("ccos"), 6).desc, col("cell").asc)
    val touched = q.join(broadcast(cent))
      .withColumn("ccos",
        graft.plans.GraftFunctions.cosine(spark, col("xq"), col("cx")))
      .withColumn("crn", row_number().over(w))
      .where(col("crn") <= nprobe)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)) // bounded by cells, never vector data
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("cell").isin(touched.map(Integer.valueOf): _*))
      .select(col("nid"), col("cell").cast("int").as("cell"),
        col("s"), col("cid"))
    Ann.ivfpqSearch(queries,
      Ann.IvfPqModel(cent, cb, codes), idCol, vecCol, k, nprobe, m, dim)
  }
}
