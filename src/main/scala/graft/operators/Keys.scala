package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment for dimension loads: dense BIGINT keys for
  * natural keys, plus the incremental "keep existing keys, number only
  * the new arrivals" load step (the key-management sibling of
  * [[Changelog]]'s SCD family; the reference's registry/dedupe loads
  * assume such stable ids downstream,
  * cf. /root/reference/src/etlp/connector.clj routing by entity id).
  *
  * The naive dense_rank over all naturals is a GLOBAL window — Spark
  * executes an empty-partition-key window as one task holding the whole
  * key set; the classic driver-shaped bottleneck at warehouse scale.
  * This uses a two-level rank instead:
  *   1. bucket every natural key by md5 ([[Corpus.hashBucket]] — engine
  *      independent, unlike Spark's Murmur3 `hash()`);
  *   2. row_number within each bucket ordered by the key (a KEYED
  *      window — all buckets rank in parallel);
  *   3. add each bucket's offset = total size of lower-numbered buckets
  *      (a `buckets`-row cumulative sum — metadata-sized, broadcast
  *      back).
  * Keys are dense in [offset+1, offset+|keys|] and a pure function of
  * the key set (any partitioning, any engine), but NOT globally sorted
  * by natural key — a surrogate key is an identity, not a sort order,
  * so that is the contract an actual dim load needs, bought with one
  * keyed shuffle instead of a single-task global sort.
  */
object Keys {
  /** (naturalCol, sk): dense deterministic keys `offset+1 ..
    * offset+|distinct naturals|`. NULL naturals are dropped (no key for
    * the unknown member — model it explicitly upstream). */
  def surrogate(df: DataFrame, naturalCol: String, buckets: Int = 64,
      offset: Long = 0L): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val nat = df.select(col(naturalCol).cast("string").as("nat"))
      .where(col("nat").isNotNull).distinct()
    val bucketed = nat.withColumn("gb",
      Corpus.hashBucket(col("nat"), "sk", buckets))
    // ≤ `buckets` rows: the unpartitioned window is metadata-sized
    val offs = bucketed.groupBy("gb").agg(count(lit(1)).as("bn"))
      .withColumn("boff", coalesce(
        sum(col("bn")).over(Window.orderBy(col("gb").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("gb", "boff")
    val wn = Window.partitionBy("gb").orderBy(col("nat").asc)
    bucketed.withColumn("rn", row_number().over(wn))
      .join(broadcast(offs), "gb")
      .select(col("nat").as(naturalCol),
        (lit(offset) + col("boff") + col("rn")).cast("long").as("sk"))
  }

  /** Deterministic pseudonymization (GDPR Art. 4(5) shape): identifier
    * columns replaced by salted-md5 pseudonyms. Same (salt, value) →
    * same pseudonym EVERYWHERE, so referential integrity survives —
    * joins across pseudonymized tables still line up — while the raw
    * identifier never leaves the cluster. Re-salting a release breaks
    * linkage to previous releases (the unlinkability dial). NULLs stay
    * NULL (concat propagates them — a null identifier must not collide
    * with the empty string's pseudonym). Purely scan-stage (codegen'd
    * md5 per column); no shuffle, no lookup table to protect. */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: no columns given")
    require(salt.nonEmpty, "pseudonymize: empty salt")
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c,
        md5(concat(lit(s"graft-pseud:$salt:"), col(c).cast("string")))))
  }

  /** Incremental dim load: every existing (naturalCol, sk) row survives
    * untouched; naturals in `incoming` with no mapping get fresh dense
    * keys starting above the current max. Cost per load: one anti-join
    * keyed on the natural, one [[surrogate]] pass over only the NEW
    * keys, one scalar max (sanctioned 1-row broadcast) — history is
    * never renumbered (downstream fact tables depend on that). */
  def assignNew(existing: DataFrame, incoming: DataFrame,
      naturalCol: String, buckets: Int = 64): DataFrame = {
    val ex = existing.select(col(naturalCol).cast("string").as(naturalCol),
      col("sk").cast("long").as("sk"))
    val mx = ex.agg(coalesce(max(col("sk")), lit(0L)).as("mx"))
    val fresh = incoming
      .select(col(naturalCol).cast("string").as(naturalCol))
      .where(col(naturalCol).isNotNull).distinct()
      .join(ex.select(col(naturalCol)), Seq(naturalCol), "left_anti")
    val freshKeyed = surrogate(fresh, naturalCol, buckets)
      .crossJoin(broadcast(mx))
      .select(col(naturalCol), (col("sk") + col("mx")).cast("long").as("sk"))
    ex.unionByName(freshKeyed)
  }

  /** Calendar (date-dimension) spine spanning a fact table's observed
    * date range: one global min/max aggregate (1 row) explodes into a
    * day-per-row frame with the standard role-playing attributes —
    * the dimension every warehouse join-dates against. Attribute
    * choices are the engine-portable ones: ISO day-of-week (1 =
    * Monday; Spark's `dayofweek` is Sunday-based, so `weekday()+1`),
    * no locale-dependent names, no ISO week number (engines disagree
    * on year-boundary weeks). Scale: the spine is decades = O(10⁴)
    * rows from a 1-row explode — broadcast-sized by construction; the
    * only distributed work is the min/max scan. */
  def dateDim(facts: DataFrame, dateCol: String): DataFrame =
    facts
      .agg(min(col(dateCol).cast("date")).as("__a"),
        max(col(dateCol).cast("date")).as("__b"))
      .where(col("__a").isNotNull)
      .select(explode(expr("sequence(__a, __b, interval 1 day)")).as("d"))
      .select(col("d"),
        year(col("d")).cast("int").as("year"),
        quarter(col("d")).cast("int").as("quarter"),
        month(col("d")).cast("int").as("month"),
        dayofmonth(col("d")).cast("int").as("day"),
        expr("CAST(weekday(d) + 1 AS INT)").as("iso_dow"),
        expr("weekday(d) >= 5").as("is_weekend"),
        (col("d") === last_day(col("d"))).as("is_month_end"))
}
