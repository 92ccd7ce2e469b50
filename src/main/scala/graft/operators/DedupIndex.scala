package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** PERSISTENT minhash LSH index: sketch the corpus once, write the
  * banded postings to disk, then probe every future ingest batch
  * against the stored index — the "build once, probe many" shape a
  * production dedup service runs. [[Dedup.deltaMinhash]] re-sketches
  * the existing corpus on every call; at 100 TB that is a full corpus
  * scan per ingest batch, and THIS is the fix: the corpus pays one
  * sketch+write, and each probe reads only the band-hash bucket
  * directories its own candidates can live in.
  *
  * Layout: posting rows (id, sig, b, bh) partitioned by
  * `graft_ib = pmod(xxhash64(b, bh), nBuckets)`. A probe batch
  * computes its own (b, bh) set, derives the touched bucket ids
  * (≤ nBuckets ints to the driver — the
  * [[graft.streaming.Streaming]] upsert discipline), and reads ONLY
  * those partitions; untouched buckets contribute zero input splits.
  * The signature rides the posting row (~perms·8 bytes duplicated
  * ×bands — the price of answering a probe from one partition-pruned
  * read instead of a second id-keyed join against a full sig table).
  *
  * Probe output and arithmetic are IDENTICAL to
  * [[Dedup.deltaMinhash]] (same sketch via [[Dedup.minhashSketch]],
  * same band join, same match-count verify) — spec-pinned, so the
  * index is a pure storage/pruning optimization, never a semantics
  * change.
  */
object DedupIndex {
  private val BucketCol = "graft_ib"

  /** Sketch + band the corpus and write the posting index. Returns the
    * posting row count (one Spark action — the write itself). */
  def buildMinhash(df: DataFrame, idCol: String, textCol: String,
      path: String, shingleK: Int = 3, perms: Int = 16, bands: Int = 4,
      nBuckets: Int = 16): Unit = {
    val rows = perms / bands
    Dedup.minhashSketch(df, idCol, textCol, shingleK, perms)
      .select(col("id"), col("sig"),
        posexplode(Hashes.lshBands("sig", bands, rows)).as(Seq("b", "bh")))
      .withColumn(BucketCol, pmod(xxhash64(col("b"), col("bh")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)
  }

  /** Incremental index maintenance: sketch ONLY the delta batch and
    * append its posting rows — purely additive (no existing posting
    * file read or rewritten, untouched buckets gain no files), the
    * [[AnnIndex.appendIvfPq]] discipline for the dedup side. A probe
    * after the append sees base ∪ delta with the identical sketch
    * arithmetic, because minhash signatures are row-local: unlike
    * IVF-PQ there is no trained model to freeze, so append IS build
    * on the delta. */
  def appendMinhash(spark: SparkSession, path: String, delta: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3, perms: Int = 16,
      bands: Int = 4, nBuckets: Int = 16): Unit = {
    val rows = perms / bands
    Dedup.minhashSketch(delta, idCol, textCol, shingleK, perms)
      .select(col("id"), col("sig"),
        posexplode(Hashes.lshBands("sig", bands, rows)).as(Seq("b", "bh")))
      .withColumn(BucketCol, pmod(xxhash64(col("b"), col("bh")), lit(nBuckets)))
      .write.mode("append").partitionBy(BucketCol).parquet(path)
  }

  /** Posting-file count across bucket directories (metadata only). */
  def postingFileCount(spark: SparkSession, path: String): Int =
    DirSwap.fileCount(spark, path)

  /** Fold the delta files [[appendMinhash]] accumulates back to one
    * file per bucket — layout-only, under the shared [[DirSwap]]
    * protocol (same guarantee and crash repair as
    * [[AnnIndex.compactIvfPq]]; ONE implementation so the semantics
    * cannot drift). The index root itself is swapped (postings are the
    * whole index — no sibling centroids/codebooks dir), so the staging
    * dir lives BESIDE the root. Returns (files before, after). */
  def compactMinhash(spark: SparkSession, path: String): (Int, Int) = {
    recoverPostings(spark, path)
    val before = postingFileCount(spark, path)
    val tmp = s"${path}_compacting"
    spark.read.parquet(path)
      .repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(tmp)
    DirSwap.swapIn(spark, path, tmp)
    (before, postingFileCount(spark, path))
  }

  /** Crash repair for [[compactMinhash]]'s swap window
    * ([[DirSwap.recover]] on the index root). */
  private[graft] def recoverPostings(spark: SparkSession,
      path: String): Unit =
    DirSwap.recover(spark, path)

  /** Probe a fresh batch against a stored index: near-duplicate
    * matches (doc_id ∈ fresh, dup_of ∈ index, est_jaccard) under the
    * [[Dedup.deltaMinhash]] contract. Only the band-hash buckets the
    * batch touches are read. */
  def probeMinhash(spark: SparkSession, path: String, fresh: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3, perms: Int = 16,
      bands: Int = 4, minMatches: Int = 4,
      nBuckets: Int = 16): DataFrame = {
    recoverPostings(spark, path) // repair a torn compaction swap
    val rows = perms / bands
    val fb = Dedup.minhashSketch(fresh, idCol, textCol, shingleK, perms)
      .select(col("id").as("doc_id"), col("sig").as("sig_a"))
      .select(col("doc_id"), col("sig_a"),
        posexplode(Hashes.lshBands("sig_a", bands, rows)).as(Seq("b", "bh")))
      .withColumn(BucketCol, pmod(xxhash64(col("b"), col("bh")), lit(nBuckets)))
      .localCheckpoint() // two consumers: bucket set + the probe join
    val touched = fb.select(BucketCol).distinct()
      .collect().map(_.getLong(0)) // bounded by nBuckets, never key data
    if (touched.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("dup_of"),
          lit(0.0).as("est_jaccard")).limit(0)
    val idx = spark.read.parquet(path)
      .where(col(BucketCol).cast("long").isin(touched: _*))
      .select(col("id").as("dup_of"), col("sig").as("sig_b"),
        col("b"), col("bh"))
    fb.join(idx, Seq("b", "bh"))
      // every posting row of an id carries the identical sig, so
      // first() per pair is deterministic (the distinct-then-rejoin of
      // deltaMinhash, collapsed into one aggregate)
      .groupBy(col("doc_id"), col("dup_of"))
      .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
      .withColumn("m", Hashes.sigMatches("sig_a", "sig_b"))
      .where(col("m") >= minMatches)
      .select(col("doc_id"), col("dup_of"),
        expr(s"CAST(ROUND(m / $perms.0, 4) AS DOUBLE)").as("est_jaccard"))
  }
}
