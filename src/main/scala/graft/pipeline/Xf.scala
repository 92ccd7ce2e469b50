package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable pipeline combinators — the Spark-first re-expression of the
  * reference's transducer surface (etlp composes clojure transducers with
  * `comp`; cf. /root/reference/src/etlp/connector/dag.clj:60 and the
  * `xform` values in test/etlp/connector_test.clj:104).
  *
  * An [[Xf]] is a `DataFrame => DataFrame`; composition is plain function
  * composition. The crucial Spark-first point: a composed chain of
  * `select`/`filter`/`explode` stays ONE logical plan, which Catalyst
  * collapses (CollapseProject, PushDownPredicate) and Tungsten runs as a
  * single WholeStageCodegen stage — that is what transducer fusion (no
  * intermediate collections) *means* on Spark. No per-element closures, no
  * channels; parallelism comes from partitions, not threads.
  */
trait Xf extends Serializable { self =>
  def apply(df: DataFrame): DataFrame

  /** `this` then `next` — mirrors transducer `comp` (applied left-to-right). */
  def andThen(next: Xf): Xf = new Xf {
    def apply(df: DataFrame): DataFrame = next(self(df))
  }
  def >>(next: Xf): Xf = andThen(next)
}

object Xf {
  def apply(f: DataFrame => DataFrame): Xf = new Xf {
    def apply(df: DataFrame): DataFrame = f(df)
  }

  /** (map f) — project to computed columns. */
  def map(cols: Column*): Xf = Xf(_.select(cols: _*))

  /** (filter pred). */
  def filter(pred: Column): Xf = Xf(_.where(pred))

  /** (mapcat f) — one row to many: explode `col` as `as`, keeping `keep`. */
  def mapcat(col: Column, as: String, keep: Column*): Xf =
    Xf(df => df.select(keep :+ explode(col).as(as): _*))

  /** (keep f) — map then drop nulls of the computed column. */
  def keep(col: Column, as: String, keepCols: Column*): Xf =
    Xf(df => df.select(keepCols :+ col.as(as): _*).where(col.isNotNull))

  /** (partition-all n) analogue: assign a batch id from a monotonic row key.
    * On a cluster, batching is per-partition (no global coordination) —
    * here keyed deterministically off `orderCol` so results are stable.
    */
  def partitionAll(orderCol: Column, n: Int, as: String = "batch_id"): Xf =
    Xf(_.withColumn(as, floor(orderCol / n).cast("long")))

  /** (dedupe) — distinct on the given columns (or all). */
  def dedupe(cols: String*): Xf =
    Xf(df => if (cols.isEmpty) df.distinct() else df.dropDuplicates(cols))

  /** Deterministic ~pct% sample by hashing the key (first 8 hex chars
    * of md5 over its decimal string → uniform bucket in [0,100)).
    * Unlike `DataFrame.sample`/rand(), the kept set is a pure function
    * of the key: reproducible across engines, task retries and reruns
    * (a training-data pipeline must be able to regenerate the exact
    * same sample), and the predicate evaluates in the scan stage like
    * any filter. md5 (not a multiplicative residue trick) so striped or
    * clustered id spaces still sample proportionally, any integer range
    * is safe (no overflow under ANSI mode), and DuckDB reproduces the
    * bucket bit-for-bit. */
  def sampleHash(key: Column, pct: Int): Xf = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100: $pct")
    val bucket =
      conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100
    filter(bucket < lit(pct))
  }

  /** take n with a deterministic order. */
  def take(n: Int, order: Column*): Xf = Xf(_.orderBy(order: _*).limit(n))

  /** Compose many — transducer `comp` but left-to-right like `->>`. */
  def comp(xfs: Xf*): Xf = xfs.reduceLeft(_ andThen _)
}
