package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The rename-aside directory-swap protocol shared by index
  * compactions ([[AnnIndex.compactIvfPq]], [[DedupIndex.compactMinhash]])
  * — ONE implementation so the crash-window semantics cannot drift
  * between the two (r10 review finding). Convention: the live dir
  * `<live>` swaps against `<live>_old`; the caller stages the rewrite
  * into any sibling dir and passes it in.
  *
  * Guarantee (stated precisely): a reader that already LISTED the live
  * directory finishes against intact files; a lister INSIDE the
  * two-rename window sees no directory, and a crash there leaves only
  * `<live>_old` — both torn states are repaired by [[recover]], which
  * the compaction AND the read path call first. True lister-in-window
  * atomicity needs a manifest indirection ([[Txn]]); index probes and
  * compaction of one index root are coordinated by the same
  * maintenance job in every deployment shape this library targets. */
object DirSwap {
  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive data-file count (metadata-only listing; `_`/`.` files
    * skipped) — the compaction before/after metric. */
  def fileCount(spark: SparkSession, dir: String): Int = {
    val fs = fsOf(spark, dir)
    val it = fs.listFiles(new Path(dir), true)
    var n = 0
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Swap `staged` into place as `live` (rename-aside + rename-in),
    * deleting the aside copy on success. */
  def swapIn(spark: SparkSession, live: String, staged: String): Unit = {
    val fs = fsOf(spark, live)
    val old = new Path(live + "_old")
    fs.delete(old, true)
    require(fs.rename(new Path(live), old),
      s"DirSwap: cannot move $live aside")
    require(fs.rename(new Path(staged), new Path(live)),
      s"DirSwap: cannot swap $staged into $live")
    fs.delete(old, true)
  }

  /** Crash repair for [[swapIn]]'s window: if `live` is missing and
    * `<live>_old` exists, rename it back. Idempotent, metadata-only;
    * no-op when `live` exists. */
  def recover(spark: SparkSession, live: String): Unit = {
    val fs = fsOf(spark, live)
    val livePath = new Path(live)
    val old = new Path(live + "_old")
    if (!fs.exists(livePath) && fs.exists(old))
      require(fs.rename(old, livePath), s"DirSwap: cannot restore $old")
  }
}
