package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Hashes, TextAnalysis, Vectors}
import graft.plans.GraftFunctions

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the point of every choice here):
  *  - Exact dedup groups on `md5(text)` — a 32-byte shuffle key — never
  *    on the document body, so shuffle bytes are O(rows), not O(corpus).
  *  - MinHash: the signature is computed row-locally (one narrow map,
  *    no shuffle — see [[Hashes.minhashSignature]]); only (id, sig,
  *    band-hash) rows shuffle for the LSH band join, which is
  *    key-partitioned: candidates meet only inside a band bucket,
  *    never via a cross product.
  *  - SimHash: 64-bit sketch per doc; banding on 4×16-bit chunks makes
  *    the candidate join key-equality too.
  *  - N-gram Jaccard: computed via an inverted-index join (explode
  *    n-grams → join on the gram), so cost is Σ posting-list², not N².
  *  - Embedding pairs: exact O(N²) verifier — for the full corpus use
  *    [[Ann.lshTopK]] as the candidate generator first.
  *  - Hot-bucket skew (e.g. thousands of identical docs share every
  *    band): AQE skew-join handles moderate cases; for pathological ones
  *    cap bucket width or pre-collapse exact duplicates first (cheap).
  */
object Dedup {

  /** Exact dedup: one row per distinct text with the canonical (min) id
    * and the multiplicity. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-duplicate pairs.
    * @return (doc_a, doc_b, est_jaccard) for candidate pairs sharing an
    *         LSH band whose signature agreement is >= minMatches/perms. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, perms: Int = 16, bands: Int = 4,
      minMatches: Int = 4): DataFrame = {
    val rows = perms / bands
    val sigs = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= shingleK)
      .select(col("id"), Hashes.shingles("w", shingleK).as("sh"))
      // native sketch kernel (plans.MinHashSignature): same md5 scheme as
      // Hashes.minhashSignature, ~10x the throughput of the HOF form
      .select(col("id"),
        GraftFunctions.minhashSig(df.sparkSession, col("sh"), perms).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(Hashes.lshBands("sig", bands, rows)).as(Seq("b", "bh")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("m", Hashes.sigMatches("sig_a", "sig_b"))
      .where(col("m") >= minMatches)
      .select(col("doc_a"), col("doc_b"),
        expr(s"CAST(ROUND(m / $perms.0, 4) AS DOUBLE)").as("est_jaccard"))
  }

  /** Per-doc SimHash signature + its 4 LSH band keys. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col("doc_id"),
        GraftFunctions.simhash64(df.sparkSession, col("w")).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        Hashes.simhashBand("simhash", 0).as("b0"),
        Hashes.simhashBand("simhash", 1).as("b1"),
        Hashes.simhashBand("simhash", 2).as("b2"),
        Hashes.simhashBand("simhash", 3).as("b3"))

  /** SimHash near-dup pairs: share >=1 of 4 bands AND hamming <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 12): DataFrame = {
    val sigs = simhashSignatures(df, idCol, textCol)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("b", "bv")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.b") === col("b.b") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming", Hashes.hamming("sim_a", "sim_b").cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Exact n-gram Jaccard via AllPairs/PPJoin prefix filtering: order
    * every doc's grams rarest-first (global doc-frequency), keep only
    * the prefix of length n_g − ceil(t·n_g) + 1 for candidate
    * generation — any pair with jac ≥ t must collide inside both
    * prefixes — then verify candidates exactly with a row-local
    * `array_intersect` over the full gram sets. The pair stream shrinks
    * by the prefix ratio AND the frequency skew (rare grams have short
    * posting lists); verification is a broadcast join against the
    * per-doc gram arrays. Exact: same result set as the inverted-index
    * count (equality spec in DedupSpec).
    *
    * When to use which (measured, see PLANS.md): prefix filtering wins
    * on natural corpora where gram frequency is Zipfian (rare-gram
    * prefixes have short posting lists); on the synthetic tiny-vocab
    * testdata frequencies are uniform, the prefix prunes little, and
    * its two extra shuffles (df join + rank) make [[ngramJaccardPairs]]
    * faster — which is why the query entry uses the inverted-index
    * form. */
  def ngramJaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 2, minJaccard: Double = 0.3): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= n)
      .select(col("id"), col("grp"), Hashes.shingles("w", n).as("g"))
    val posting = grams.select(col("id"), col("grp"), size(col("g")).as("n_g"),
      explode(col("g")).as("gram"))
    val gramDf = posting.groupBy("grp", "gram").agg(count(lit(1)).as("gdf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("gdf").asc, col("gram").asc)
    val prefix = posting
      .join(gramDf, Seq("grp", "gram"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= col("n_g") - ceil(col("n_g") * minJaccard) + 1)
      .select(col("id"), col("grp"), col("n_g"),
        xxhash64(concat_ws("|", col("grp"), col("gram"))).as("gk"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.gk") === col("b.gk") && col("a.id") < col("b.id") &&
          least(col("a.n_g"), col("b.n_g")).cast("double") /
            greatest(col("a.n_g"), col("b.n_g")) >= minJaccard)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val sets = grams.select(col("id"), col("g"))
    cand
      .join(broadcast(sets.as("sa")), col("doc_a") === col("sa.id"))
      .join(broadcast(sets.as("sb")), col("doc_b") === col("sb.id"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa.g"), col("sb.g"))).cast("double") /
          (size(col("sa.g")) + size(col("sb.g")) -
            size(array_intersect(col("sa.g"), col("sb.g"))))).as("jac"))
      .where(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(ROUND(jac, 4) AS DOUBLE)").as("jaccard"))
  }

  /** Exact n-gram Jaccard similarity via inverted-index join. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 2, minJaccard: Double = 0.3): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= n)
      .select(col("id"), col("grp"), Hashes.shingles("w", n).as("g"))
    val counts = grams.select(col("id"), size(col("g")).as("n_g"))
    // join key = one 64-bit hash of (group, gram): long equality beats a
    // two-column string compare across the ~50M-row pair stream, and at
    // this gram cardinality a collision altering any intersection count
    // is ~1e-16 (and would be caught by the oracle hash-compare)
    val posting = grams.select(col("id"), size(col("g")).as("n_g"),
        explode(col("g")).as("gram"), col("grp"))
      .select(col("id"), col("n_g"),
        xxhash64(concat_ws("|", col("grp"), col("gram"))).as("gk"))
    // lossless prune: jac >= t implies inter >= t·union, and inter <=
    // min(na,nb), union >= max(na,nb) → min/max >= t. Dropping pairs that
    // fail the size-ratio test can't lose any pair with jac >= t, but it
    // cuts the pair stream feeding the aggregate.
    val inter = posting.as("a")
      .join(posting.as("b"),
        col("a.gk") === col("b.gk") &&
          col("a.id") < col("b.id") &&
          least(col("a.n_g"), col("b.n_g")).cast("double") /
            greatest(col("a.n_g"), col("b.n_g")) >= minJaccard)
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.id"))
      .join(counts.as("cb"), col("doc_b") === col("cb.id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("ca.n_g") + col("cb.n_g") - col("inter"))).as("jac"))
      .where(col("jac") >= minJaccard)
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(ROUND(jac, 4) AS DOUBLE)").as("jaccard"))
  }

  /** Embedding-cosine near-dup pairs (exact; see scaladoc for the ANN
    * prefilter at corpus scale). */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      Vectors.toDouble(col(vecCol)).as("x"))
    // graft_cosine: native codegen'd expression — the O(N²) pair join is
    // exactly where interpreted higher-order lambdas would dominate
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        GraftFunctions.cosine(df.sparkSession, col("a.x"), col("b.x")).as("cos"))
      .where(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"),
        expr("CAST(ROUND(cos, 4) AS DOUBLE)").as("cos_sim"))
  }
}
