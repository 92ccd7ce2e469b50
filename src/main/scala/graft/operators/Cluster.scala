package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors
import graft.plans.GraftFunctions

/** Embedding-space clustering ops for training-data curation: k-means
  * partition assignment, SemDeDup (semantic dedup inside k-means cells,
  * Abbas et al. 2023, arXiv:2303.09540), and per-class centroid-distance
  * outlier flagging.
  *
  * Scale shape shared by all three: centroids are k·dim doubles — always
  * broadcast; the corpus side streams through the codegen'd cosine
  * (graft_cosine) once per centroid and reduces per-vector with a window
  * argmax whose only shuffle key is the vector id. Nothing here is ever
  * all-pairs across the corpus — SemDeDup's pairwise step is an
  * equi-join on the cell id, and cell population is bounded by k scaling
  * with N (the paper's regime: N/k roughly constant).
  *
  * Determinism contract (mirrors [[Ann.trainCentroids]] so the DuckDB
  * oracle reproduces every branch bit-for-bit): assignment ties break on
  * round(cos, 6) DESC then cell id ASC; all reported cosines are
  * ROUND(·, 4) + 0.0 (negative-zero collapse).
  */
object Cluster {

  /** Nearest-centroid assignment (spherical): one broadcast join, one
    * per-vector argmax. `centroids` = (cidCol: int, vecCol) as produced
    * by [[Ann.trainCentroids]]. Output: (idCol, cid, cos_r). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignWithVec(df, idCol, vecCol, centroids)
      .select(col(idCol), col("cid"),
        expr("CAST(ROUND(ccos, 4) + 0.0 AS DOUBLE)").as("cos_r"))

  /** Shared nearest-centroid kernel: broadcast join + per-vector argmax
    * (tie-break round(cos,6) DESC, cid ASC). Returns
    * (idCol, cid, x, ccos) — [[assign]] projects the rounded cosine,
    * [[semDedup]] keeps the vector for its within-cell pair join. ONE
    * copy so the tie-break/rounding discipline can't drift between the
    * two call sites. */
  private def assignWithVec(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val v = df.select(col(idCol), Vectors.toDouble(col(vecCol)).as("x"))
    val cent = centroids.select(col(idCol).cast("int").as("cid"),
      Vectors.toDouble(col(vecCol)).as("cx"))
    val w = Window.partitionBy(idCol)
      .orderBy(round(col("ccos"), 6).desc, col("cid").asc)
    v.join(broadcast(cent))
      .withColumn("ccos", GraftFunctions.cosine(spark, col("x"), col("cx")))
      .withColumn("crn", row_number().over(w))
      .where(col("crn") === 1)
      .select(col(idCol), col("cid"), col("x"), col("ccos"))
  }

  /** Train k centroids on the full input and assign every vector —
    * k-means clustering as a first-class op (the partition step behind
    * SemDeDup, cluster-balanced sampling, and IVF cell layout). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame =
    assign(df, idCol, vecCol,
      Ann.trainCentroids(df, idCol, vecCol, k, iters))

  /** SemDeDup: k-means cells, then drop any vector with a
    * sufficiently-cosine-similar LOWER-ID vector in the same cell
    * (greedy keep-first — deterministic, and the same keep rule the
    * exact/minhash dedup families use). Pairwise similarity is computed
    * only inside a cell (equi-join on cid), never across the corpus.
    *
    * The threshold compares round(cos, 6) — a raw-double compare would
    * let a last-ulp engine difference flip membership on the boundary.
    *
    * Output: one row per input vector — (idCol, cid, keep). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, minCosine: Double): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1, iters >= 1: k=$k iters=$iters")
    val spark = df.sparkSession
    val cent = Ann.trainCentroids(df, idCol, vecCol, k, iters)
    val assigned = assignWithVec(df, idCol, vecCol, cent)
      .select(col(idCol), col("cid"), col("x"))
    val a = assigned.select(col("cid"), col(idCol).as("id_a"),
      col("x").as("xa"))
    val b = assigned.select(col("cid"), col(idCol).as("id_b"),
      col("x").as("xb"))
    // within-cell pairs with a lower-id partner above the threshold:
    // those id_b are dropped. The join key is the cell id, so the pair
    // space is Σ|cell|² — bounded when k scales with N.
    val dropped = a.join(b, Seq("cid"))
      .where(col("id_a") < col("id_b"))
      .where(round(GraftFunctions.cosine(spark, col("xa"), col("xb")), 6)
        >= minCosine)
      .select(col("id_b").as(idCol)).distinct()
    assigned.select(col(idCol), col("cid"))
      .join(dropped.withColumn("dropped", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cid"),
        coalesce(!col("dropped"), lit(true)).as("keep"))
  }

  /** Embedding-distribution drift monitor: split the population into
    * two deterministic halves (id parity), compute each half's
    * per-label centroid with the decimal-exact mean discipline, and
    * report the cosine between the halves' centroids per label — 1.0
    * means the two halves agree on where the class lives; a drop
    * flags drift/contamination in one half. The scale shape is two
    * (label, half, dim)-keyed aggregates + a label-keyed join of
    * d-length arrays — centroid tables are labels×dims rows whatever
    * the corpus size. Cosine folds run over dim-sorted arrays in one
    * fixed sequential order, rounded once at 6. */
  def centroidDrift(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val halves = df.where(col(vecCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).as("label"),
        pmod(col(idCol), lit(2)).cast("int").as("h"),
        posexplode(graft.functions.Vectors.toDouble(col(vecCol)))
          .as(Seq("dim", "vd")))
      .groupBy("label", "h", "dim")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(vd, 9) AS DECIMAL(38,9))")).as("s"))
      .withColumn("m", expr("CAST(s AS DOUBLE) / n"))
      .groupBy("label", "h")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"),
        max(col("n")).as("n"))
      .select(col("label"), col("h"),
        expr("transform(dm, p -> p.m)").as("cx"), col("n"))
    halves.where(col("h") === 0)
      .select(col("label"), col("cx").as("ca"), col("n").as("n_a"))
      .join(halves.where(col("h") === 1)
        .select(col("label"), col("cx").as("cb"), col("n").as("n_b")),
        "label")
      .select(col("label"), col("n_a"), col("n_b"),
        expr("""CAST(ROUND(
            aggregate(zip_with(ca, cb, (x, y) -> x * y),
              CAST(0.0 AS DOUBLE), (acc, p) -> acc + p) /
            (SQRT(aggregate(ca, CAST(0.0 AS DOUBLE), (a2, x) -> a2 + x * x)) *
             SQRT(aggregate(cb, CAST(0.0 AS DOUBLE), (a2, x) -> a2 + x * x))),
          6) AS DOUBLE)""").as("drift_cos"))
  }

  /** Gram (uncentred scatter) matrix of an embedding column: G(i,j) =
    * Σ_v v[i]·v[j] over all vectors, upper triangle only (symmetric) —
    * the DISTRIBUTED stage of PCA / whitening / all-but-the-top: 100 TB
    * of vectors reduce to one d×d table (map-side partials collapse
    * every partition to ≤ d(d+1)/2 cells), and the eigen-solve then
    * runs on metadata. Products are exact double widenings of the
    * float inputs, rounded at 9 and summed as DECIMAL(38,9) —
    * order-independent on any engine and partitioning
    * ([[labelOutliers]]' centroid discipline). The pair expansion is
    * row-local inside [[graft.plans.GramAgg]] — no self-join, no
    * d²-per-row explode, no Σ·d² shuffle rows: each partition collapses
    * to ONE d(d+1)/2-cell integer buffer in the scan stage and partials
    * merge by exact integer adds (bit-identical to the former
    * round→DECIMAL(38,9)→SUM SQL form; GramAgg's scaladoc carries the
    * proof obligations, ClusterSpec + the oracle pin the outputs).
    *
    * Small-input parallelism: a single-file embedding table arrives as
    * one scan partition, serializing the per-vector update loop. When
    * the scan has fewer partitions than the session's default
    * parallelism the vectors are spread with one round-robin
    * repartition first — at any real scale the scan already has more
    * partitions than cores and the branch is a no-op, so no payload
    * shuffle is ever ADDED at 100 TB (the buffer merge, not the input,
    * is the only thing that crosses the wire there). */
  def gram(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    val in = df.where(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val defaultPar = spark.sparkContext.defaultParallelism
    val spread =
      if (in.rdd.getNumPartitions < defaultPar) in.repartition(defaultPar)
      else in
    spread
      .agg(graft.plans.GraftFunctions.gramAgg(spark, col("__v")).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        col("c.n").as("n_vecs"),
        expr("CAST(ROUND(CAST(c.s AS DOUBLE), 6) AS DOUBLE)").as("g"))
  }

  /** Per-class centroid-distance outliers: for each label, the vectors
    * in the lowest `frac` tail of cosine-to-own-label-centroid (at
    * least one per label) — mislabeled/noisy embedding detection.
    *
    * Centroid means use the round(·, 9)-then-DECIMAL(38,9)-sum
    * discipline of [[Ann.trainCentroids]]: exact integer arithmetic,
    * identical on any engine regardless of partial-aggregate tree
    * shape. Per-(label, dim) two-phase aggregate — no per-label buffer
    * ever holds the class population.
    *
    * Output: (labelCol, idCol, cos_r, rank) for flagged outliers only;
    * rank 1 = farthest from the centroid. */
  def labelOutliers(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, frac: Double = 0.05): DataFrame = {
    require(frac > 0.0 && frac < 1.0, s"frac must be in (0, 1), got $frac")
    val spark = df.sparkSession
    val v = df.where(col(vecCol).isNotNull)
      .select(col(labelCol), col(idCol), Vectors.toDouble(col(vecCol)).as("x"))
    val cent = v
      .select(col(labelCol), posexplode(col("x")).as(Seq("d", "vd")))
      .groupBy(labelCol, "d")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(vd, 9) AS DECIMAL(38,9))")).as("s"))
      .withColumn("m", expr("CAST(s AS DOUBLE) / n"))
      .groupBy(labelCol)
      .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"),
        max(col("n")).as("n_label"))
      .select(col(labelCol), expr("transform(dm, p -> p.m)").as("cx"),
        col("n_label"))
    val w = Window.partitionBy(labelCol)
      .orderBy(round(col("ccos"), 6).asc, col(idCol).asc)
    v.join(broadcast(cent), Seq(labelCol))
      .withColumn("ccos", GraftFunctions.cosine(spark, col("x"), col("cx")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= greatest(lit(1),
        floor(col("n_label") * frac)).cast("int"))
      .select(col(labelCol), col(idCol),
        expr("CAST(ROUND(ccos, 4) + 0.0 AS DOUBLE)").as("cos_r"),
        col("rank"))
  }
}
