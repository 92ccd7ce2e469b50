package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): find pairs of records that
  * likely refer to the same real-world entity, by blocking + in-block
  * pairwise fuzzy comparison — the classic two-stage shape (Fellegi-
  * Sunter style blocking; cf. the dedup family in [[Dedup]], which is
  * the same pattern specialized to document text).
  *
  * Stage 1 (blocking) makes the quadratic stage tractable: records
  * only compare within a block, so total work is Σ|block|² instead of
  * N². The BLOCK KEY choice is the scale contract: its cardinality
  * must grow with the data so block sizes stay bounded (a fixed-
  * cardinality key means blocks grow linearly and the in-block
  * quadratic returns at 100×). Callers pick domain keys that shard
  * naturally — zip+surname-prefix, nation+segment, minhash band —
  * exactly like [[Dedup.minhashPairs]]' bands. `maxBlock` enforces the
  * contract at runtime: any block above the bound fails fast naming
  * the offending key, instead of silently running a quadratic stage
  * (one keyed count + a broadcast probe — the guard never shuffles the
  * data a second time).
  *
  * Stage 2 compares names with Levenshtein edit distance inside
  * whole-stage codegen (built-in `levenshtein`, no UDF). The block
  * equi-join shuffles by block key only; pairs carry ids + names, and
  * `id_a < id_b` halves the stream and fixes pair orientation. NULL
  * block values join nothing — a record with an unknown block key
  * pairs with no one (standard blocking semantics).
  */
object Er {
  def fuzzyMatchPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDistance: Int,
      maxBlock: Int = 100000): DataFrame = {
    require(blockCols.nonEmpty, "fuzzyMatchPairs: need blocking columns")
    require(maxDistance >= 0, "maxDistance must be >= 0")
    require(maxBlock > 1, "maxBlock must be > 1")
    val t = df.select(col(idCol).as("id") +: col(nameCol).as("nm") +:
      blockCols.map(col): _*)
    val oversize = t.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("graft_bn"))
      .where(col("graft_bn") > maxBlock)
      .select(concat_ws("/", blockCols.map(col): _*).as("graft_bk"),
        col("graft_bn"))
    val guarded = t.join(broadcast(oversize),
        concat_ws("/", blockCols.map(col): _*) === col("graft_bk"), "left")
      .select(col("id") +:
        when(col("graft_bn").isNotNull, expr(
          "raise_error(concat('fuzzyMatchPairs: block ', graft_bk, " +
            "' exceeds maxBlock with ', CAST(graft_bn AS STRING), ' rows'))"))
          .otherwise(col("nm")).as("nm") +:
        blockCols.map(col): _*)
    val on = blockCols.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    guarded.as("a").join(guarded.as("b"), on)
      .where(levenshtein(col("a.nm"), col("b.nm")) <= maxDistance)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("distance"))
  }
}
