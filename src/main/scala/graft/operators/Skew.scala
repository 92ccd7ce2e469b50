package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for key-partitioned joins.
  *
  * AQE's skew-join handles moderate cases at runtime (split oversized
  * partitions), but a join where one key holds a double-digit percent of
  * the fact table still bottlenecks: every row of that key lands on a
  * handful of tasks. Salting fixes it structurally:
  *
  *  - fact side: append a random salt in [0, buckets) to the join key —
  *    the hot key's rows spread over `buckets` partitions;
  *  - dim side: explode each row `buckets` times, once per salt value.
  *
  * Cost: dim side inflates ×buckets (fine for dimension tables; pick
  * buckets ≈ hot-key-share × shuffle-partitions). Result set is
  * identical to the unsalted join — salting only refines the
  * partitioning key.
  *
  * The salt uses a deterministic per-row hash (not rand()) so retried
  * tasks produce identical output — at 100 TB task retries are a
  * certainty, and a nondeterministic salt breaks exactly-once shuffle
  * file reuse.
  */
object Skew {
  val SaltCol = "graft_salt"

  /** Deterministic salt in [0, buckets) derived from the whole row of
    * join-relevant columns. */
  private def salt(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets)).cast("int")

  /** Inner equi-join `fact ⋈ dim` on `factKey == dimKey`, salted into
    * `buckets` sub-keys. Pass `saltBy` columns that distinguish fact
    * rows within a key (defaults to the key itself plus a random-ish
    * spread via monotonically varying values is NOT used — see
    * determinism note above). */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, buckets: Int,
      saltBy: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spreadCols =
      (if (saltBy.isEmpty) fact.columns.toSeq else saltBy).map(fact(_))
    val saltedFact = fact.withColumn(SaltCol, salt(spreadCols, buckets))
    val saltedDim = dim
      .withColumn(SaltCol, explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn(SaltCol, col(SaltCol).cast("int"))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact(SaltCol) === saltedDim(SaltCol))
      .drop(SaltCol)
  }
}
