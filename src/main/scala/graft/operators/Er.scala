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
  /** Entity CLUSTER membership: every input record mapped to its
    * resolved-entity cluster id — matched records via connected
    * components over the match-pair graph ([[Dedup.duplicateClusters]]'
    * pointer-jumping CC, so chains a~b~c resolve to ONE entity even
    * when a and c never compared), unmatched records as singletons
    * (cluster_id = own id). By CC construction the cluster id is the
    * MINIMUM member id, so the canonical member is directly
    * addressable (`id == cluster_id`) for golden-record survivorship
    * downstream. The singleton fill-in is one left join keyed on id —
    * corpus-shaped, no new shuffle classes. */
  def clusterIds(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val cc = Dedup.duplicateClusters(pairs, aCol, bCol)
      .withColumnRenamed("doc_id", "id")
    df.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  def fuzzyMatchPairs(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxDistance: Int,
      maxBlock: Int = 100000): DataFrame = {
    require(blockCols.nonEmpty, "fuzzyMatchPairs: need blocking columns")
    require(maxDistance >= 0, "maxDistance must be >= 0")
    require(maxBlock > 1, "maxBlock must be > 1")
    val t = df.select(col(idCol).as("id") +: col(nameCol).as("nm") +:
      blockCols.map(col): _*)
    // The guard joins back on the BLOCK COLUMNS themselves (never a
    // concat key: concat_ws both skips NULL slots and leaves separator
    // chars in values ambiguous, so ('a/b','c') and ('a','b/c') would
    // collide and fail a healthy block). NULL-keyed rows are excluded
    // up front — a NULL block value equi-joins nothing in stage 2, so
    // no quadratic stage exists for it and it must not trip the guard.
    val nonNull = blockCols.map(col(_).isNotNull).reduce(_ && _)
    val oversize = t.where(nonNull)
      .groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("graft_bn"))
      .where(col("graft_bn") > maxBlock)
      .select(blockCols.map(c => col(c).as(s"graft_g_$c")) :+
        col("graft_bn"): _*)
    val guardOn = blockCols.map(k => col(k) === col(s"graft_g_$k"))
      .reduce(_ && _)
    val guarded = t.join(broadcast(oversize), guardOn, "left")
      .select(col("id") +:
        when(col("graft_bn").isNotNull, expr(
          "raise_error(concat('fuzzyMatchPairs: block ', " +
            s"concat_ws('/', ${blockCols.mkString(", ")}), " +
            "' exceeds maxBlock with ', CAST(graft_bn AS STRING), ' rows'))"))
          .otherwise(col("nm")).as("nm") +:
        blockCols.map(col): _*)
    val on = blockCols.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    guarded.as("a").join(guarded.as("b"), on)
      // compute the O(len²) edit distance ONCE per candidate pair —
      // filtering on a recomputed copy would double the hot-stage CPU
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.nm"), col("b.nm")).as("distance"))
      .where(col("distance") <= maxDistance)
  }

  /** MDM survivorship over resolved cluster memberships: one golden
    * record per cluster with per-field rules — modal category (count
    * desc, value asc tie), cleanest name (shortest, then
    * lexicographic), richest balance, min member id as the stable
    * golden key. Cluster-keyed windows + one aggregate; nothing
    * crosses clusters, so the shape is flat in cluster count.
    * `members` = one row per (cluster_id, member) with the source
    * fields attached (the [[clusterIds]]-join output). */
  def goldenRecords(members: DataFrame, clusterCol: String, idCol: String,
      nameCol: String, segCol: String, balCol: String): DataFrame = {
    val wName = org.apache.spark.sql.expressions.Window
      .partitionBy(clusterCol)
      .orderBy(length(col(nameCol)).asc, col(nameCol).asc)
    val seg = members.groupBy(col(clusterCol), col(segCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(clusterCol)
          .orderBy(col("n").desc, col(segCol).asc)))
      .where(col("rn") === 1)
      .select(col(clusterCol), col(segCol).as("segment"))
    members.withColumn("__rn", row_number().over(wName))
      .groupBy(clusterCol)
      .agg(count(lit(1)).as("n_members"),
        min(col(idCol)).as("golden_id"),
        max(when(col("__rn") === 1, col(nameCol))).as("name"),
        expr(s"CAST(ROUND(CAST(MAX($balCol) AS DOUBLE), 2) AS DOUBLE)")
          .as("acctbal"))
      .join(seg, clusterCol)
      .select(col(clusterCol), col("n_members"), col("golden_id"),
        col("name"), col("segment"), col("acctbal"))
  }
}
