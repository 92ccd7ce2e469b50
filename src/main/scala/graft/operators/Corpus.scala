package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus-assembly operators: the steps between "cleaned, deduped
  * documents" and "training shards" in an LLM data pipeline — chunking
  * long documents into model-window pieces, packing short ones into
  * fixed-token-budget bins, mixing heterogeneous sources at target
  * ratios, and sharding the result for parallel export.
  *
  * Scale design:
  *  - Chunking is a row-local explode (zero shuffle): chunk rows inherit
  *    the scan's partitioning, cost is O(corpus bytes).
  *  - Packing partitions by a deterministic hash shard and runs ONE
  *    key-partitioned window per shard — never a global (single
  *    partition) cumulative sum. At cluster scale set `shards` to a
  *    small multiple of the writer parallelism.
  *  - Mixing and sharding are pure row-local filters/projections off the
  *    same md5-bucket family as [[graft.pipeline.Xf.sampleHash]]:
  *    reproducible across engines, retries and years (a training mix
  *    must be exactly regenerable), uniform on clustered/striped id
  *    spaces, ANSI-overflow-safe.
  */
object Corpus {

  /** Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    * "salt:key" as an integer. The salt decorrelates independent
    * sampling stages over the same key space (a doc sampled into the
    * mix must not be the same doc every downstream hash keeps). */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Sliding-window token chunking: one output row per (doc, chunk),
    * chunk i covering tokens [i*stride, i*stride + chunkSize). With
    * stride < chunkSize consecutive chunks overlap by chunkSize−stride
    * tokens (context continuity at window boundaries); the tail chunk
    * may be short. Chunk count is 1 + ceil(max(len−chunkSize,0)/stride)
    * — windows stop once the doc is covered, so no chunk is ever a
    * strict suffix of its predecessor (a naive ceil(len/stride) emits a
    * fully-redundant tail window whenever the remainder fits inside the
    * overlap — duplicated text, the very thing the dedup stages remove).
    * Empty docs emit nothing. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0),
          ceil(greatest(size(col("w")) - chunkSize, lit(0)) / lit(stride.toDouble))
            .cast("int")))
          .as(Seq("p", "ci")))
      .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
        slice(col("w"), col("ci") * stride + 1, lit(chunkSize)).as("ch"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ch")).cast("int").as("n_chunk_tokens"),
        array_join(col("ch"), " ").as("chunk_text"))
  }

  /** Sequence packing: fill fixed `budgetTokens` bins with whole docs,
    * in deterministic doc-id order within each hash shard. A doc's bin
    * is the number of whole budgets consumed before it (start-offset
    * packing: floor(preceding-tokens / budget)), so bin assignment is a
    * pure function of the shard's token prefix sums — no sequential
    * packer, one window + one aggregate per shard. Docs longer than the
    * budget overflow their bin (real packers truncate or chunk first —
    * compose with [[chunkTokens]]). `idCol` must be unique: it is the
    * window sort key, and a tie would make the prefix sums (hence bin
    * assignment) run-dependent — exactly the reproducibility this
    * operator promises.
    *
    * @return per-bin stats (shard, bin, n_docs, tokens_packed,
    *         first_doc, last_doc). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, shards: Int): DataFrame =
    packByCount(
      df.select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok")),
      budgetTokens, shards)

  /** [[packSequences]] with REAL tokenizer budgets: documents pack into
    * `budgetTokens`-piece bins by their BPE piece count under `merges`
    * ([[bpeTokenCounts]] — the vocab-sized broadcast encode), not the
    * whitespace proxy. Whitespace counts under-estimate subword budgets
    * by the pieces-per-word ratio, so whitespace-packed bins overflow a
    * real tokenizer's context window — this is the form a training
    * pipeline actually ships. Same one-keyed-window plan shape. */
  def packSequencesBpe(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultMerges,
      budgetTokens: Int = 512, shards: Int = 8): DataFrame =
    packByCount(
      bpeTokenCounts(df, idCol, textCol, merges)
        .select(col("doc_id"), col("n_bpe_tokens").cast("long").as("n_tok")),
      budgetTokens, shards)

  /** The packing tail shared by the whitespace and BPE forms: per-shard
    * doc-id-ordered cumulative token sums → fixed-budget bins → per-bin
    * stats. ONE key-partitioned window (never a global one). */
  private def packByCount(counts: DataFrame, budgetTokens: Int,
      shards: Int): DataFrame = {
    require(budgetTokens > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .where(col("n_tok") > 0)
      .withColumn("shard", hashBucket(col("doc_id"), "pack", shards).cast("int"))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("n_tok")) / lit(budgetTokens.toDouble)).cast("long"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("tokens_packed"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Weighted source mixing: keep each row with probability
    * rate(class) — deterministically, by per-mille md5 bucket of the id,
    * so the mixture is exactly reproducible (and auditable: the keep
    * decision for any row can be recomputed from its id alone). Classes
    * without a rate drop entirely (inner join against the broadcast
    * rate table). Rates quantize to per-mille. */
  def mixWeighted(df: DataFrame, idCol: String, classCol: String,
      rates: Seq[(String, Double)]): DataFrame = {
    require(rates.nonEmpty && rates.forall { case (_, r) => r >= 0 && r <= 1 },
      "rates must be in [0,1]")
    require(rates.map(_._1).distinct.size == rates.size,
      // a duplicated class would fan out every row of that class through
      // the inner join — duplicated docs in a training mixture
      s"duplicate class keys in rates: ${rates.map(_._1).diff(rates.map(_._1).distinct).distinct.mkString(",")}")
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.map { case (c, r) => (c, (r * 1000).round.toInt) }
      .toDF(classCol, "keep_permille")
    df.join(broadcast(rateDf), classCol)
      .where(hashBucket(col(idCol), "mix", 1000) < col("keep_permille"))
      .drop("keep_permille")
  }

  /** Weight-proportional deterministic sampling: keep each row with
    * probability `weightCol / max(weightCol)` — importance sampling by a
    * per-row continuous quality/length score, where [[mixWeighted]]'s
    * per-class rate table can't express the gradient. The coin flip is
    * md5-uniform in the row id: u = (first 8 md5 hex digits) / 2^32,
    * keep iff u < w / wmax — exact integer-derived u, one IEEE division
    * per side, so ANY engine recomputes the identical kept set (and any
    * task retry draws the same rows; rand() could never gate-check).
    *
    * Scale: wmax is a 1-row aggregate attached by broadcast (sanctioned
    * scalar cross-join); the keep predicate is row-local in the scan
    * stage. One pass, no shuffle of the data itself.
    *
    * Rows with weight <= 0 (or NULL) are never kept, and wmax is the
    * max over POSITIVE weights only. Without this clamp an all-negative
    * weight column (a log-prob score, say) makes wmax negative and
    * w/wmax INVERTS the gradient — the worst rows would be kept most
    * often, silently. */
  def sampleWeighted(df: DataFrame, idCol: String,
      weightCol: String): DataFrame = {
    val pos = df.where(col(weightCol).cast("double") > 0)
    val wmax = pos.agg(max(col(weightCol).cast("double")).as("graft_wmax"))
    pos.crossJoin(broadcast(wmax))
      .where(
        (conv(substring(md5(concat(lit("wsample:"),
            col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
          / lit(4294967296.0)) <
        col(weightCol).cast("double") / col("graft_wmax"))
      .drop("graft_wmax")
  }

  /** EXACT-k weighted sample without replacement — Efraimidis–Spirakis
    * A-Res as a deterministic distributed top-k: each row draws a
    * reproducible uniform u from md5(salt:id) and keys on
    * ln(u)/w (the exponential-race trick: taking the k LARGEST
    * ln(u)/w, all negative, equals the k smallest −ln(u)/w exponential
    * arrivals); the k winners are a proper weighted sample without
    * replacement. Contrast [[sampleWeighted]], whose independent
    * Bernoulli coins give a RATE, not a count.
    *
    * Plan: the key is row-local scan-stage arithmetic; the top-k is
    * TakeOrderedAndProject (per-partition heaps merged on the driver,
    * never a global sort) — one pass at any corpus size. Deterministic
    * on any engine/retry/partitioning: md5-uniform + rounded-key
    * ordering with id tie-break. Rows with weight <= 0 or NULL never
    * qualify (the [[sampleWeighted]] clamp rationale). */
  def sampleWeightedK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsk"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keyed = df.where(col(weightCol).cast("double") > 0)
      .withColumn("graft_u",
        (conv(substring(md5(concat(lit(salt + ":"),
            col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") + 1.0)
          / lit(4294967297.0)) // (h+1)/(2^32+1) ∈ (0,1): never ln(0)
      .withColumn("sample_key", expr(
        s"CAST(ROUND(LN(graft_u) / CAST($weightCol AS DOUBLE), 9) AS DOUBLE)"))
      .drop("graft_u")
    keyed.orderBy(col("sample_key").desc, col(idCol).asc).limit(k)
  }

  /** Test-set decontamination: corpus docs sharing at least one word
    * `n`-gram with any benchmark document, with the count of distinct
    * shared grams (the usual flag-then-drop / flag-then-audit input).
    *
    * Scale: both sides reduce to (id, gram-hash) pairs — the benchmark
    * gram set is distinct-collapsed and is tiny next to the corpus
    * (benchmarks are at most ~10⁷ grams), so Spark broadcasts it and
    * the corpus side streams through a hash join inside the scan stage;
    * the only shuffle is the final per-doc aggregate. Gram identity is
    * a 64-bit xxhash64 — collision odds at corpus scale are ~1e-16 and
    * a collision only inflates `n_shared` by one, it cannot drop a
    * contaminated doc. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n > 0)
    val spark = corpus.sparkSession
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= n)
      .select(col("id"),
        // shingles() already returns DISTINCT grams per doc
        explode(
          graft.plans.GraftFunctions.shingles(spark, col("w"), n)).as("gram"))
      .select(col("id"), xxhash64(col("gram")).as("gk"))
    val benchGrams = grams(benchmark).select("gk").distinct()
    grams(corpus)
      .join(broadcast(benchGrams), "gk")
      .groupBy(col("id").as(idCol))
      .agg(count_distinct(col("gk")).as("n_shared"))
  }

  /** FUZZY decontamination: corpus docs that are minhash NEAR-duplicates
    * of any benchmark doc — catches paraphrased/reformatted test-set
    * leakage that exact n-gram matching ([[decontaminate]]) misses; the
    * two are complementary and production pipelines run both.
    *
    * Pure composition over [[Dedup.deltaMinhash]]'s strictly cross-side
    * band join (benchmark = build side, corpus = probe side — the
    * benchmark is the bounded side at 100 TB, the corpus side never
    * self-joins), aggregated per corpus doc. `minMatches` of `perms`
    * signature agreements ≈ a Jaccard floor of minMatches/perms.
    *
    * @return (doc_id, n_bench_matches, max_est_jaccard,
    *         first_bench_match) — flag-then-drop input, one row per
    *         contaminated corpus doc. */
  def decontaminateFuzzy(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 3, perms: Int = 16,
      bands: Int = 4, minMatches: Int = 4): DataFrame =
    Dedup.deltaMinhash(benchmark, corpus, idCol, textCol, shingleK,
        perms, bands, minMatches)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_matches"),
        max(col("est_jaccard")).as("max_est_jaccard"),
        min(col("dup_of")).as("first_bench_match"))

  /** DSIR-style importance scores (Data Selection via Importance
    * Resampling, Xie et al. 2023): score every raw doc by how much its
    * hashed-n-gram distribution looks like the TARGET corpus vs the
    * raw corpus — the published recipe behind "select pre-training
    * data that resembles a trusted/target set". Per doc:
    * `Σ_grams (ln p_target(f) − ln p_raw(f))` over hashed (unigram +
    * bigram) features, add-1 smoothed.
    *
    * Spark shape: feature extraction is row-local (tokens + bigrams →
    * md5 bucket, all in the scan stage); the two distributions are
    * `m`-row aggregates; the log-ratio table is m rows and BROADCASTS
    * into the per-doc scoring join, so the corpus side never shuffles
    * gram text — the only corpus-sized shuffle keys are doc ids in
    * the final aggregate. Cross-engine exactness: per-gram log-ratios
    * ROUND to 6 then sum as DECIMAL(38,6) (the lm_score discipline),
    * so the doc score is identical under any partitioning/engine.
    *
    * @return (doc_id, n_grams, dsir_score) for every raw doc with at
    *         least one feature; higher = more target-like. */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, m: Int = 64): DataFrame = {
    require(m > 0)
    val spark = raw.sparkSession
    def feats(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .select(col("id"), explode(expr(
        """concat(w, IF(size(w) >= 2,
          |  transform(sequence(1, size(w) - 1),
          |    i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1))),
          |  array()))""".stripMargin)).as("g"))
      .select(col("id"), hashBucket(col("g"), "dsir", m).as("f"))
    val ft = feats(target).groupBy("f").agg(count(lit(1)).as("ct"))
    val fr = feats(raw).groupBy("f").agg(count(lit(1)).as("cr"))
    // dense m-row feature frame: absent buckets still need their
    // smoothed log-ratio (both engines build the same 0..m-1 range)
    val lrBase = spark.range(m).select(col("id").as("f"))
      .join(ft, Seq("f"), "left").join(fr, Seq("f"), "left")
      .select(col("f"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .localCheckpoint() // two consumers: totals + ratio projection
    val tot = lrBase.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val lr = lrBase.crossJoin(broadcast(tot))
      .select(col("f"), expr(
        s"""CAST(ROUND(
           |  ln((ct + 1.0) / (tt + $m)) - ln((cr + 1.0) / (tr + $m)),
           |6) AS DOUBLE)""".stripMargin).as("lr"))
    feats(raw).join(broadcast(lr), "f")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(expr("CAST(lr AS DECIMAL(38,6))")).as("s"))
      // NO final re-round: the decimal sum is exact and decimal→double
      // is correctly rounded on any engine; a ROUND(·,4) here would
      // reintroduce the half-tie cross-engine flips the decimal sum
      // exists to prevent (measured: 4 flips in 47k docs at sf0.1)
      .select(col("doc_id"), col("n_grams"),
        expr("CAST(s AS DOUBLE)").as("dsir_score"))
  }

  /** Deterministic export sharding with balance stats: shard =
    * md5-bucket(id) % shards; reports per-shard doc and token totals
    * (the check that no shard is hot before a parallel write fans out —
    * pair with sinks.BucketedParquetSink for the write itself). */
  def shardStats(df: DataFrame, idCol: String, textCol: String,
      shards: Int): DataFrame =
    manifestAgg(
      df.select(col(idCol).as("doc_id"),
          size(TextAnalysis.tokens(col(textCol))).as("n_tok"))
        .withColumn("shard",
          hashBucket(col("doc_id"), "shard", shards).cast("int")),
      "doc_id")

  /** Deterministic training-order SHUFFLE: the permutation step between
    * curation and packing — a training run must read the corpus in
    * pseudorandom order, re-permutable per epoch, without ever paying a
    * GLOBAL sort. Shape: shard = md5-bucket(id) with the UNSEEDED
    * "shard" salt — the exact [[shardStats]] export fan-out, so a
    * consumer that materialized files by shard keeps them valid across
    * epochs — and pos = row_number within the shard ordered by the
    * SEEDED md5 rank (ties broken by id). Ordering state is per-shard,
    * so shards sort independently and in parallel; at 100 TB each
    * sorted run is bounded by corpus/shards, never the corpus. A new
    * `seed` re-permutes every epoch with zero data movement of the
    * underlying files: only the rank (the read order WITHIN each
    * stable shard) reshuffles — the r9 form salted the shard with the
    * seed too, which silently moved every doc's shard each epoch and
    * contradicted exactly this claim (r9 advice). md5 keeps the
    * permutation engine-portable — the DuckDB oracle reproduces shard,
    * pos, and rank byte-for-byte. */
  def shuffleOrder(df: DataFrame, idCol: String, seed: String,
      shards: Int): DataFrame = {
    val rank = md5(concat(lit(s"shuffle:$seed:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("rank").asc, col(idCol).asc)
    df.select(col(idCol),
        hashBucket(col(idCol), "shard", shards).cast("int").as("shard"),
        rank.as("rank"))
      .withColumn("pos", row_number().over(w))
  }

  /** TF-IDF keyword extraction: the top-`k` highest-scoring terms per
    * document, tf(d,t) · ln((N+1)/(df(t)+1)) with add-one smoothing (no
    * term can hit a zero denominator, idf stays finite on a term that
    * appears everywhere).
    *
    * Scale: tf is one (doc, term) aggregate; document frequency is one
    * (term) aggregate over tf's output (already one row per doc-term —
    * never recounts raw tokens); N rides in as a broadcast single-row
    * cross join (a scalar, not a shuffle); the idf join keys on the
    * term. The final per-doc top-k is `row_number() <= k`, which Spark
    * executes with map-side WindowGroupLimit pruning. Nothing in the
    * plan is ever all-pairs and every shuffle key is a term or doc id.
    *
    * Ranking happens on the score ROUNDED to 4 decimals (then term asc
    * as tie-break): ranking raw doubles would let a last-ulp `ln`
    * difference between engines flip an ordering; after rounding,
    * near-equal scores become exactly equal and the term tie-break
    * decides deterministically everywhere. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
    val tf = toks
      .select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("n_docs_term"))
    // scalar N rides a broadcast cross join whose build side is
    // STRUCTURALLY one row (a global aggregate) — the nested-loop shape
    // is a map-side constant attach here, sanctioned by name in
    // PlanHygieneSpec like ann_ivf's k-row centroid broadcast. (A
    // constant-equi-key "hash join" disguise doesn't survive Catalyst:
    // constant folding rewrites it straight back to the nested loop.)
    // N derives from tf — counting toks directly would re-run the full
    // text scan + tokenize, since Catalyst doesn't dedupe the shared
    // uncached subplan; every non-empty doc has >= 1 tf row, so the
    // distinct doc count over tf is exactly |non-empty docs|
    val nDocs = tf.agg(count_distinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log((col("n_docs") + 1).cast("double") /
          (col("n_docs_term") + 1)))
      .withColumn("tfidf", expr("CAST(ROUND(score, 4) AS DOUBLE)"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("int").as("rank"), col("term"),
        col("tf"), col("tfidf"))
  }

  /** Boilerplate detection: n-grams appearing in at least `minDocs`
    * DISTINCT documents are boilerplate candidates (headers, footers,
    * license blurbs, navigation chrome — C4-style cleanup targets);
    * each doc reports how many distinct boilerplate grams it carries
    * and its boilerplate exposure ratio (flag-then-strip input).
    *
    * Scale: grams reduce to 64-bit hashes and the corpus is tokenized
    * and shingled exactly ONCE — document frequency computes as a
    * window count over the gram-partitioned stream (one shuffle on the
    * gram key), then the per-doc rollup is a second keyed aggregate.
    * A separate df-aggregate joined back (the [[decontaminate]] shape)
    * would re-run the shingle stage: Catalyst does not dedupe shared
    * uncached subplans. Never all-pairs. (The native shingles
    * expression already returns DISTINCT grams per doc, so the window
    * count is document frequency by construction.) */
  def boilerplate(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Long = 3): DataFrame = {
    require(n > 0 && minDocs > 1)
    val spark = df.sparkSession
    val grams = df
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) >= n)
      .select(col("id"),
        graft.plans.GraftFunctions.shingles(spark, col("w"), n).as("gs"))
      .select(col("id"), size(col("gs")).as("n_grams"),
        explode(col("gs")).as("gram"))
      .select(col("id"), col("n_grams"), xxhash64(col("gram")).as("gk"))
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy("gk")
    grams
      .withColumn("df", count(lit(1)).over(wdf))
      .where(col("df") >= minDocs)
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_boiler_grams"),
        expr("CAST(ROUND(COUNT(*) / CAST(FIRST(n_grams) AS DOUBLE), 4) AS DOUBLE)")
          .as("boiler_ratio"))
  }

  /** Export the corpus to `shards` deterministic shard directories
    * (`path/shard=N/...`) and return a MANIFEST built by re-reading
    * what actually landed on disk — per shard: docs, tokens, id range.
    * The manifest is the post-write verification a training run trusts
    * (it describes the files, not the plan that produced them); shard
    * assignment is the same salted md5 bucket as [[shardStats]], so a
    * pre-write balance check predicts exactly this layout.
    *
    * Scale: the write repartitions by the shard column first, so each
    * shard's rows land in ONE task and each task writes ONE shard —
    * without that, every task can open up to `shards` writers and the
    * export degrades into a small-file explosion (tasks × shards files)
    * that throttles the downstream training reader on listing and
    * footer I/O. `maxRecordsPerFile` re-splits oversized shards into
    * bounded files inside the same task. File count per shard:
    * max(1, ⌈rows/maxRecordsPerFile⌉), by construction. The manifest
    * pass scans only (shard, doc_id, n_tok). */
  def exportShards(df: DataFrame, idCol: String, textCol: String,
      shards: Int, path: String,
      maxRecordsPerFile: Long = 5000000L): DataFrame = {
    val spark = df.sparkSession
    val staged = df.withColumn("shard",
        hashBucket(col(idCol), "shard", shards).cast("int"))
      .withColumn("n_tok", size(TextAnalysis.tokens(col(textCol))))
    staged.repartition(col("shard"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard").parquet(path)
    // explicit schema: a zero-row export writes no part files, and
    // schema inference over an empty dir throws — an empty corpus must
    // yield an empty manifest, not a crashed job
    manifestAgg(spark.read.schema(staged.schema).parquet(path), idCol)
  }

  /** The per-shard stats aggregate shared by [[shardStats]] (pre-write
    * prediction) and [[exportShards]] (post-write manifest): keeping it
    * one definition is what guarantees prediction == manifest,
    * field for field. Expects (shard, `idCol`, n_tok) columns. */
  private def manifestAgg(df: DataFrame, idCol: String): DataFrame =
    df.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok").cast("long")).as("tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))

  /** Unigram language-model quality score: each doc's mean token
    * log-probability under the corpus's own unigram distribution
    * (p(term) = corpus term count / total tokens). The crude-but-real
    * ancestor of perplexity-based quality gating: gibberish and
    * boilerplate-free rare-token soup score far below fluent text drawn
    * from the corpus distribution.
    *
    * Determinism across engines: each term's log-prob is rounded to 6
    * decimals FIRST, and per-doc totals sum those as exact
    * DECIMAL(18,6) — float summation order (Spark partial aggregates
    * vs the oracle's sequential sum) can never show up in the output.
    * One (doc, term) aggregate, one term aggregate, one scalar total
    * (1-row broadcast), a term-keyed join back, a per-doc aggregate —
    * every shuffle key is a term or a doc id. */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col("doc_id"), explode(col("w")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val lm = tf.groupBy("term").agg(sum(col("tf")).as("ctf"))
    val total = lm.agg(sum(col("ctf")).as("total_tok"))
    tf.join(lm, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        expr("CAST(ROUND(LN(CAST(ctf AS DOUBLE) / total_tok), 6) AS DECIMAL(18,6))")
          .as("lp"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tok"),
        expr("CAST(ROUND(CAST(SUM(lp * tf) AS DOUBLE) / SUM(tf), 4) AS DOUBLE)")
          .as("lm_score"))
  }

  /** Deterministic fixed-size sample per group: the first `n` rows of
    * each group in md5 order — a reproducible "eyeball sample" per
    * language/source for corpus QA. Unlike `TABLESAMPLE`/`rand()`, any
    * engine (and any retry of any task) draws the same rows; unlike
    * [[mixWeighted]]'s rate-based keep this guarantees an exact count
    * per group (when the group has at least `n` rows). One window
    * shuffle on the group key, map-side-pruned via WindowGroupLimit. */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(md5(concat(lit("sample:"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("int"))
      .where(col("sample_rank") <= n)
  }

  /** Percentile-based quality curation: keep rows whose `scoreCol` is
    * at/above their group's p-quantile — "drop the worst quartile per
    * language", the standard corpus-quality cut, with the threshold
    * adapting to each group's own distribution instead of one global
    * constant.
    *
    * Thresholds come from [[Percentile.binned]] (bounded-memory
    * two-pass exact percentile — O(1) aggregation buffers at any group
    * size, unlike the value-map PERCENTILE aggregate), and the
    * per-group threshold table is one row per group — broadcast back,
    * so the filter costs one scan. Returns the input rows that survive,
    * plus their group's `q_threshold`.
    *
    * The input is localCheckpoint-materialized first: the percentile
    * passes plus the final filter scan it 4×, and Catalyst does not
    * dedupe a shared uncached subplan — with a scoring pipeline
    * upstream (tokenize + regex, the normal caller) that re-runs the
    * expensive stage each time. The materialized rows are just
    * (group, score, carried cols) — a fraction of corpus bytes on
    * executor-local disk (measured at sf0.1: 1.9s → 1.1s). */
  def qualityGate(df: DataFrame, groupCol: String, scoreCol: String,
      p: Double, bins: Int = 4096): DataFrame = {
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    val scored = df.localCheckpoint()
    val thr = Percentile.binned(scored, groupCol, scoreCol, Seq(p), bins,
        roundTo = 6)
      .select(col(groupCol), col("pv").as("q_threshold"))
    scored.join(broadcast(thr), Seq(groupCol))
      .where(col(scoreCol) >= col("q_threshold"))
  }

  /** BM25 retrieval: the `topK` documents scoring highest against a bag
    * of query terms (Okapi BM25, the idf·saturated-tf form Lucene
    * ships) — benchmark-decontamination probes and "find me docs about
    * X" corpus QA both reduce to this.
    *
    * Scale: tokens filter to the query terms IMMEDIATELY after the
    * explode, so only query-term occurrences ever aggregate or shuffle
    * (the corpus-sized token stream dies in the scan stage); document
    * length is a row-local size(); N and avgdl ride one 1-row broadcast
    * (sanctioned scalar attach); per-term df is a |queryTerms|-row
    * broadcast. The final top-k is orderBy+limit — Spark executes that
    * as TakeOrderedAndProject (per-partition heap + driver merge of k
    * rows), never a global sort; the rank window then runs over k rows.
    * Cross-engine: per-term contributions round to 6 decimals and sum
    * as DECIMAL(18,6) (the [[lmScore]] discipline). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: empty query")
    val toks = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
    val dl = toks.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val scal = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val tf = toks.select(col("doc_id"), explode(col("w")).as("term"))
      .where(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scal))
      .select(col("doc_id"), expr(
        s"""CAST(ROUND(
           |  LN((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
           |  (tf * ($k1 + 1.0)) /
           |  (tf + $k1 * (1.0 - $b + $b * dl / (CAST(tot_dl AS DOUBLE) / n_docs))),
           |6) AS DECIMAL(18,6))""".stripMargin).as("contrib"))
      .groupBy("doc_id")
      .agg(expr("CAST(ROUND(CAST(SUM(contrib) AS DOUBLE), 4) AS DOUBLE)")
        .as("bm25"))
    scored.orderBy(col("bm25").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("int"))
      .select("rank", "doc_id", "bm25")
  }

  /** Bigram language-model fluency score: each document's mean negative
    * log-probability of its adjacent token pairs under the corpus's own
    * add-one-smoothed bigram distribution, P(w2|w1) = (c(w1,w2)+1) /
    * (c(w1)+V). The sequence-aware upgrade of [[lmScore]]: token-soup
    * documents that fool unigram scoring (right words, wrong order)
    * light up here. nll is ln-perplexity — monotone in it — so
    * thresholds transfer; exp() is left to the caller because its
    * last-ulp behavior differs between engines while ln+round does not.
    *
    * Scale: bigram extraction is a row-local zip_with of two shifted
    * slices (zero shuffle, no posexplode+window); everything after is
    * keyed on (w1, w2) or w1 — bigram-vocab-sized aggregates, never
    * corpus-wide rows. V is one scalar (sanctioned 1-row broadcast).
    * Cross-engine: ROUND(ln, 6) then DECIMAL(18,6) sums. */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("w"))
    val dtf = toks.where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
          |  (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val c2 = dtf.groupBy("w1", "w2").agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = toks.select(explode(col("w")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    dtf.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("tf"), expr(
        "CAST(ROUND(-LN((CAST(c2 AS DOUBLE) + 1.0) / (c1 + v)), 6) AS DECIMAL(18,6))")
        .as("nl"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        expr("CAST(ROUND(CAST(SUM(nl * tf) AS DOUBLE) / SUM(tf), 4) AS DOUBLE)")
          .as("nll"))
  }

  /** Interpolated Kneser-Ney bigram NLL per document (Kneser & Ney
    * 1995; the smoothing CCNet's 5-gram LM actually uses, here at
    * bigram order): P(w2|w1) = max(c(w1w2)−D, 0)/c(w1) +
    * D·N₁₊(w1,·)/c(w1) · N₁₊(·,w2)/N₁₊(·,·), D = 0.75. The upgrade
    * over [[bigramNll]]'s add-one: the continuation probability scores
    * a word by how many CONTEXTS it follows, not raw frequency — so
    * "francisco" (frequent, one context) stops inflating unseen-pair
    * mass. Every input is an integer count off the same bigram-type
    * table; all tables are bigram-vocab-sized keyed joins (never
    * corpus-wide), the type total is one broadcast scalar, and the
    * per-doc reduction is the [[bigramNll]] ROUND(ln,6)→DECIMAL
    * discipline. */
  def bigramNllKn(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val toks = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("w"))
    val dtf = toks.where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
          |  (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val c2 = dtf.groupBy("w1", "w2").agg(sum(col("tf")).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"),
      count(lit(1)).as("n1f"))                       // N₁₊(w1, ·)
    val n1b = c2.groupBy("w2").agg(count(lit(1)).as("n1b")) // N₁₊(·, w2)
    val tt = c2.agg(count(lit(1)).as("tt"))          // N₁₊(·, ·)
    dtf.join(c2, Seq("w1", "w2")).join(c1, Seq("w1")).join(n1b, Seq("w2"))
      .crossJoin(broadcast(tt))
      .select(col("doc_id"), col("tf"), expr(
        s"""CAST(ROUND(-LN(
           |  GREATEST(CAST(c2 AS DOUBLE) - CAST($discount AS DOUBLE),
           |    CAST(0.0 AS DOUBLE)) / c1 +
           |  (CAST($discount AS DOUBLE) * n1f / c1) * (CAST(n1b AS DOUBLE) / tt)
           |), 6) AS DECIMAL(18,6))""".stripMargin).as("nl"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        expr("CAST(ROUND(CAST(SUM(nl * tf) AS DOUBLE) / SUM(tf), 4) AS DOUBLE)")
          .as("nll"))
  }

  /** Zipf head-coverage table: the top-`topK` corpus terms by token
    * frequency with each rank's CUMULATIVE share of all tokens — the
    * rank-frequency curve a tokenizer/vocab budget is planned against
    * ("the top 100 types cover X% of the stream"). One vocab-sized
    * count aggregate, a TakeOrdered top-k cut, then a window over the
    * k survivors only (k rows — single-partition by construction, not
    * by accident); the token total rides one broadcast scalar. */
  def zipfCoverage(df: DataFrame, textCol: String,
      topK: Int = 100): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val tc = df.select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val tot = tc.agg(sum(col("n")).as("tot"))
    val top = tc.orderBy(col("n").desc, col("t").asc).limit(topK)
    val w = Window.orderBy(col("n").desc, col("t").asc)
    top
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("t").as("term"), col("n"),
        expr("CAST(ROUND(CAST(cum AS DOUBLE) / tot, 6) AS DOUBLE)")
          .as("cum_frac"))
  }

  /** BPE merge-step statistics: corpus-wide frequency of adjacent
    * character pairs inside tokens, weighted by token frequency — the
    * exact count a byte-pair-encoding trainer computes to pick its next
    * merge, exposed as the top-`topK` table (tokenizer fit/coverage QA
    * against a new corpus).
    *
    * Scale: pair extraction runs over the DISTINCT-token table (vocab,
    * not corpus, sized — each token's count rides along and weights the
    * sum), pairs are 2-char keys, and the top-k is TakeOrderedAndProject
    * over the tiny pair table. One corpus-wide aggregate total. */
  /** A small fixed English merge table for [[bpeEncodeVocab]] — the
    * shape a trained tokenizer ships (ordered: earlier merges apply
    * first and can feed later ones, e.g. t+h → th+e). */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "u", "e" -> "n",
    "a" -> "t", "e" -> "s", "o" -> "r", "in" -> "g", "a" -> "l",
    "s" -> "t")

  /** Symbol-separator encoding of one term under an ordered merge
    * table — BPE ENCODE (apply-merges), the inference-time sibling of
    * [[bpePairs]]' trainer statistics. A term's symbol list rides as a
    * single string, every symbol prefixed by one space (" c a t");
    * merge (x, y) is the literal string replace " x y" → " xy", whose
    * left-to-right non-overlapping scan IS leftmost-greedy BPE merge
    * application ("aaa" + (a,a) → [aa, a]), and the space prefix stops
    * matches from crossing symbol boundaries ("ab c" can never match
    * " b c"). The whole chain is built-in string functions — one
    * codegen'd expression, no UDF — and DuckDB's replace has the same
    * scan semantics, so the oracle replays the identical chain. */
  def bpeSymbols(termCol: String, merges: Seq[(String, String)]): Column = {
    val init = concat(lit(" "), array_join(
      expr(s"transform(sequence(1, length($termCol))," +
        s" i -> substring($termCol, i, 1))"), " "))
    merges.foldLeft(init) { case (acc, (x, y)) =>
      call_function("replace", acc, lit(s" $x $y"), lit(s" $x$y"))
    }
  }

  /** The encoded vocabulary: top-`topK` corpus terms by frequency with
    * their BPE piece sequence and piece count under `merges`.
    *
    * Scale: the encode runs over the DISTINCT-token table (vocab-, not
    * corpus-sized — the [[bpePairs]] discipline); topK is
    * TakeOrderedAndProject over the tiny vocab. */
  def bpeEncodeVocab(df: DataFrame, textCol: String,
      merges: Seq[(String, String)] = DefaultMerges,
      topK: Int = 200): DataFrame = {
    val terms = df.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("ctf"))
    val enc = terms.withColumn("e", bpeSymbols("term", merges))
      .select(col("term"), col("ctf"),
        expr("substring(e, 2)").as("pieces"),
        (length(col("e")) - length(call_function("replace", col("e"),
          lit(" "), lit("")))).cast("int").as("n_pieces"))
    enc.orderBy(col("ctf").desc, col("term").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("ctf").desc, col("term").asc)).cast("int"))
      .select("rank", "term", "ctf", "pieces", "n_pieces")
  }

  /** Per-document BPE token counts under `merges`: real tokenizer
    * token budgets for packing/chunking instead of whitespace-word
    * counts. Corpus tokens join the vocab-sized encode table on the
    * term — the join key is the term string, broadcast-friendly for
    * any real vocab (≤ a few 100k terms). */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = DefaultMerges): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val vocab = df.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .distinct()
      .withColumn("e", bpeSymbols("term", merges))
      .select(col("term"),
        (length(col("e")) - length(call_function("replace", col("e"),
          lit(" "), lit("")))).cast("long").as("n_pieces"))
    toks.join(broadcast(vocab), "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_bpe_tokens"))
  }

  /** BPE merge-table TRAINING: learn `nMerges` merges from the corpus —
    * the full tokenizer-training loop, of which [[bpePairs]] is one
    * round's statistics and [[bpeSymbols]] the inference-time replay.
    *
    * Classic algorithm, Spark-shaped: the working state is the
    * VOCAB-sized (ctf, symbol-string) table, never the corpus. Each
    * round: (1) adjacent-pair counts — one two-phase aggregate whose
    * keys are symbol pairs, weighted by exact integer term frequency;
    * (2) argmax pair by (n desc, pair asc) — ONE row to the driver
    * (merge selection is inherently sequential; this is the one
    * driver-side scalar per round, the [[Graph.pageRank]] n-count
    * class); (3) apply the merge as the literal " x y" → " xy" replace
    * ([[bpeSymbols]] semantics) and `localCheckpoint`, so round plans
    * stay O(1) and the replace chain never re-executes.
    *
    * Deterministic on any engine: counts are exact integer sums, the
    * tiebreak is binary-lexicographic on the pair. Stops early if no
    * pair remains (fully merged vocab).
    *
    * @return the learned merge table (rank, lhs, rhs, merged, n) —
    *         directly consumable by [[bpeSymbols]]-style appliers. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = df.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("ctf"))
      .select(col("ctf"), concat(lit(" "), array_join(
        expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"),
        " ")).as("sym"))
      .localCheckpoint()
    val acc = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val best = vocab
        .select(col("ctf"), split(expr("substring(sym, 2)"), " ").as("s"))
        .where(size(col("s")) >= 2) // sequence(1,0) would DESCEND
        .select(col("ctf"), explode(expr(
          """transform(sequence(1, size(s) - 1),
            |  i -> struct(element_at(s, i) AS l,
            |              element_at(s, i + 1) AS r))""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("ctf")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (x, y, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        acc += ((r, x, y, x + y, n))
        val prev = vocab
        vocab = vocab.withColumn("sym", call_function("replace", col("sym"),
          lit(s" $x $y"), lit(s" $x$y"))).localCheckpoint()
        org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(prev)
        r += 1
      }
    }
    acc.result().toDF("rank", "lhs", "rhs", "merged", "n")
  }

  def bpePairs(df: DataFrame, textCol: String, topK: Int = 50): DataFrame = {
    val terms = df.select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("ctf"))
    val pairs = terms.where(length(col("term")) >= 2)
      .select(col("ctf"), explode(expr(
        "transform(sequence(1, length(term) - 1), i -> substring(term, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("ctf")).as("n"))
    pairs.orderBy(col("n").desc, col("pair").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("pair").asc)).cast("int"))
      .select("rank", "pair", "n")
  }

  /** Deterministic stratified train/val/test split: each row's split
    * is a pure function of its id (md5 bucket 0..99, [[hashBucket]]),
    * so the assignment is reproducible across engines, runs, retries
    * and data re-partitioning — the property `randomSplit` cannot give
    * (its sampling is per-partition and changes when the input layout
    * does). Entirely row-local: evaluates inside the scan's codegen
    * stage, no shuffle; downstream writers partition by the new
    * column. `cuts` are cumulative upper bounds over named splits,
    * e.g. Seq("train" → 80, "val" → 90, "test" → 100). */
  def stratifiedSplit(df: DataFrame, idCol: String, salt: String,
      cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100,
      s"cuts must end at 100, got $cuts")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
      cuts.map(_._2).distinct == cuts.map(_._2),
      s"cuts must be strictly increasing, got $cuts")
    val b = hashBucket(col(idCol), salt, 100)
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, ub), rest) => when(b < ub, name).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Exact phrase search over a positional inverted index: postings
    * (doc, pos, term) from one posexplode of the whitespace tokens,
    * pre-filtered to the PHRASE'S terms only — for a single query the
    * full index never materializes (a build-once/probe-many variant
    * would persist the postings the way DedupIndex/AnnIndex do).
    * Matching = |phrase|−1 equi-joins on (doc, pos − offset): a phrase
    * occurrence at start s puts every term's posting at the same
    * (doc, s) key — no LIKE scan, no per-row substring loop, and the
    * only rows that shuffle are postings of the query terms (a tiny
    * fraction of the corpus; at 100 TB the selectivity of the rarest
    * term bounds every join input). Tokens lowercase, positions
    * 0-based. Returns (idCol, n_hits, first_pos) for matching docs;
    * overlapping occurrences each count. */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phraseSearch: terms must be single non-empty tokens, got $phrase")
    val toks = df.select(col(idCol).as("__doc"),
      posexplode(graft.functions.TextAnalysis.tokens(col(textCol)))
        .as(Seq("__pos", "__term")))
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      toks.where(col("__term") === lit(t.toLowerCase))
        .select(col("__doc"), (col("__pos") - i).as("__start"))
    }
    parts.reduce((a, b) => a.join(b, Seq("__doc", "__start")))
      .groupBy(col("__doc").as(idCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("__start")).cast("int").as("first_pos"))
  }

  /** Feature-hashing text vectorizer (Weinberger et al. 2009, the
    * "hashing trick"): each token hashes to a dimension
    * h(w) mod `dim` with a sign bit ξ(w) ∈ {±1} drawn from an
    * independent bit of the same hash; the doc's vector component is
    * Σ ξ(w) over its token occurrences — an UNBIASED sparse projection
    * with no vocabulary table to build, ship, or keep consistent
    * across a 100 TB corpus (the whole point vs TF-IDF's corpus-wide
    * dictionary).
    *
    * h = first 60 bits of md5 (the repo-wide engine-portable hash);
    * sign = bit 12 — above the dimension index for EVERY legal dim
    * (dim <= 4096 = 2^12, so `h mod dim` never reads bit 12 when dim
    * is a power of two, and for non-power-of-two dims the bit is still
    * independent of the residue for the md5-uniform h). A lower bit
    * would correlate sign with dimension whenever dim exceeds it.
    * Exact-integer output in LONG FORM — (doc_id, dim, v ≠ 0) — so
    * cross-engine comparison is scalar, and downstream consumers can
    * pivot to dense arrays only where they must. Row-local + one
    * (doc, dim)-keyed aggregate; nothing corpus-wide. */
  def hashEmbed(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= 4096, "dim must be in [2, 4096]")
    // r17: the (doc_id, dim) aggregation is entirely WITHIN-doc, so it
    // folds row-locally — one native kernel call per doc emits the
    // nonzero cells directly and the old per-token explode plus the
    // (doc_id, dim) groupBy Exchange are gone outright (guide §2.4).
    // Same tokenizer (lowercase whitespace), same md5-60-bit h, same
    // pmod/sign-bit arithmetic — see Sketches.hashEmbedCells.
    df.select(col(idCol).as("doc_id"),
        explode(graft.plans.GraftFunctions.hashEmbedCells(df.sparkSession,
          col(textCol), dim)).as("c"))
      .select(col("doc_id"), col("c.d").as("dim"), col("c.v").as("v"))
  }

  /** Fill-in-the-middle split (Bavarian et al. 2022): each document
    * cut at two DETERMINISTIC hash-derived character offsets into
    * (prefix, middle, suffix) and re-emitted in PSM order —
    * `<PRE>p<SUF>s<MID>m` — the infilling-capable pretraining format.
    * Offsets come from the repo's md5-60-bit family keyed on the doc
    * id (two salts), mod len+1, so the split is reproducible on any
    * engine, partitioning, or rerun — the property an FIM corpus
    * regeneration needs. Entirely row-local string surgery. */
  def fimSplit(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .withColumn("len", length(col("t")))
      .withColumn("h1", expr(
        """CAST(CONV(SUBSTRING(MD5(CONCAT('graft-fim1:',
          |CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)
          |% (len + 1)""".stripMargin))
      .withColumn("h2", expr(
        """CAST(CONV(SUBSTRING(MD5(CONCAT('graft-fim2:',
          |CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)
          |% (len + 1)""".stripMargin))
      .withColumn("lo", least(col("h1"), col("h2")).cast("int"))
      .withColumn("hi", greatest(col("h1"), col("h2")).cast("int"))
      .select(col("doc_id"), col("len").cast("int").as("n_chars"),
        col("lo").as("p1"), col("hi").as("p2"),
        expr("""CONCAT('<PRE>', substring(t, 1, lo),
            '<SUF>', substring(t, hi + 1, len - hi),
            '<MID>', substring(t, lo + 1, hi - lo))""").as("fim"))

  /** SPAN-CORRUPTION denoising split (Raffel et al. 2020's T5
    * objective, UL2's R-denoiser): mask two token spans, emit the
    * corrupted input with sentinel tokens and the target that
    * reconstructs exactly the masked material. [[fimSplit]]'s
    * deterministic discipline in the TOKEN domain: two md5-derived cut
    * points (lo ≤ hi) partition the doc; span 1 starts at lo with
    * hash-length 1-3 clamped into [lo, hi), span 2 at hi clamped into
    * [hi, n) — spans can never overlap by construction, a clamp can
    * empty a span (short doc; the sentinel then reconstructs nothing,
    * documented rather than special-cased so every engine reproduces
    * the splits verbatim). Docs under 2 tokens are dropped (nothing to
    * corrupt). Entirely row-local array surgery. */
  def spanCorruption(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def h(salt: String, mod: String) = expr(
      s"""CAST(CONV(SUBSTRING(MD5(CONCAT('graft-span$salt:',
         |CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)
         |% ($mod)""".stripMargin)
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")))
      .where(col("n") >= 2)
      .withColumn("c1", h("1", "n + 1"))
      .withColumn("c2", h("2", "n + 1"))
      .withColumn("lo", least(col("c1"), col("c2")).cast("int"))
      .withColumn("hi", greatest(col("c1"), col("c2")).cast("int"))
      .withColumn("l1",
        least(lit(1) + h("3", "3").cast("int"), col("hi") - col("lo")))
      .withColumn("l2",
        least(lit(1) + h("4", "3").cast("int"), col("n") - col("hi")))
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        col("lo").as("s1"), col("l1").cast("int").as("l1"),
        col("hi").as("s2"), col("l2").cast("int").as("l2"),
        expr("""CONCAT(
            array_join(slice(w, 1, lo), ' '),
            ' <X> ',
            array_join(slice(w, lo + l1 + 1, hi - lo - l1), ' '),
            ' <Y> ',
            array_join(slice(w, hi + l2 + 1, n - hi - l2), ' '))""")
          .as("src"),
        expr("""CONCAT('<X> ',
            array_join(slice(w, lo + 1, l1), ' '),
            ' <Y> ',
            array_join(slice(w, hi + 1, l2), ' '))""").as("tgt"))
  }

  /** Contrastive quality-pair construction: per language, the top
    * quarter of docs by quality score rank-matched against the bottom
    * quarter (rank 1 best ↔ rank 1 worst, …) — the training set a
    * fastText-style quality classifier learns from (the CCNet/LLaMA
    * prep step). Quartering by row_number keeps the two sides provably
    * disjoint and the rank-match deterministic: the lo window is the
    * EXACT REVERSE of hi's total order — score ties break doc_id ASC
    * on hi and doc_id DESC on lo — so every doc's two ranks satisfy
    * hi + lo = count + 1, and a doc with both ranks ≤ count/4 would
    * need count + 1 ≤ count/2. (With both windows tie-breaking ASC,
    * a tied-score doc could rank 1-best AND 1-worst, emitting
    * degenerate pos_id == neg_id pairs — r9 advice.) Two keyed windows
    * over the same partition + one rank equi-join; the per-language
    * pair budget is a |langs|-row broadcast. */
  def contrastivePairs(scored: DataFrame, idCol: String, langCol: String,
      scoreCol: String): DataFrame = {
    val base = scored.select(col(idCol).as("doc_id"),
      col(langCol).as("lang"), col(scoreCol).as("score"))
    val wHi = Window.partitionBy("lang")
      .orderBy(col("score").desc, col("doc_id").asc)
    val wLo = Window.partitionBy("lang")
      .orderBy(col("score").asc, col("doc_id").desc)
    val n = base.groupBy("lang")
      .agg(expr("CAST(COUNT(1) div 4 AS BIGINT)").as("n_pairs"))
    val hi = base.withColumn("rank", row_number().over(wHi))
      .select(col("lang"), col("rank"), col("doc_id").as("pos_id"),
        col("score").as("pos_score"))
    val lo = base.withColumn("rank", row_number().over(wLo))
      .select(col("lang"), col("rank"), col("doc_id").as("neg_id"),
        col("score").as("neg_score"))
    hi.join(lo, Seq("lang", "rank"))
      .join(broadcast(n), "lang")
      .where(col("rank") <= col("n_pairs"))
      .select(col("lang"), col("rank").cast("int").as("rank"),
        col("pos_id"), col("pos_score"), col("neg_id"), col("neg_score"))
  }

  /** TEMPERATURE-scaled multilingual sampling plan (the GPT-3/PaLM
    * recipe, also mT5/XLM-R's α-smoothing): language weights
    * w_l ∝ n_tok_l^α with α ∈ (0, 1] — α = 1 is proportional (head
    * languages dominate), α → 0 approaches uniform (tail languages
    * over-sampled relative to size). For a token `budget`, each
    * language's per-doc KEEP RATE is budget·w_l / n_tok_l capped at 1
    * (you cannot sample more than exists without repetition — the cap
    * is reported so the caller can re-normalize or epoch-repeat tail
    * languages deliberately). Output: one row per language with exact
    * token counts and ROUND(·,6) weight/rate (irrational pow/÷ values
    * — the rounding-casebook-safe class).
    *
    * Scale: ONE (lang) aggregate over per-doc token counts + a 1-row
    * broadcast total — the plan never touches doc bodies twice and the
    * result is |langs| rows of pure metadata feeding [[mixWeighted]] /
    * [[tokenBudgetMix]] with principled rates instead of hand-picked
    * ones. */
  def temperatureMix(df: DataFrame, textCol: String, langCol: String,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val perLang = df
      .select(col(langCol).as("lang"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("nt"))
      .groupBy("lang").agg(sum(col("nt")).as("n_tok"))
      .withColumn("wr", pow(col("n_tok").cast("double"), lit(alpha)))
    val tot = perLang.agg(sum(col("wr")).as("tot"))
    perLang.crossJoin(broadcast(tot)) // 1-row scalar attach
      .select(col("lang"), col("n_tok"),
        expr("CAST(ROUND(wr / tot, 6) AS DOUBLE)").as("weight_r"),
        expr(s"""CAST(ROUND(LEAST(CAST(1.0 AS DOUBLE),
            $budgetTokens * (wr / tot) / n_tok), 6) AS DOUBLE)""")
          .as("rate_r"))
  }

  /** Per-source token-budget sampling: keep, per language, the docs
    * that fit a fixed TOKEN budget ("take 5k tokens of en, 500 of zh"
    * — the quota form of mixing, where [[mixSources]]-style rate
    * sampling controls proportions but not absolute size). Docs are
    * consumed in a deterministic md5 order (an unbiased shuffle that
    * no engine or partitioning can perturb — the repo's seeded-hash
    * discipline), with ONE per-language cumulative-sum window; a doc
    * is kept iff its own cumulative total still fits. Budgets ride a
    * broadcast |langs|-row frame. At 100 TB this is one keyed window
    * over (lang)-partitioned rows — no global sort, no driver state;
    * languages not in the budget map are dropped at the scan. */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
      langCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetMix: empty budget map")
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    val spark = df.sparkSession
    val b = spark.createDataFrame(budgets.toSeq).toDF("lang", "__budget")
    val toks = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tok"),
      md5(concat(lit("graft-budget:"), col(idCol).cast("string")))
        .as("__ord"))
    val w = Window.partitionBy("lang")
      .orderBy(col("__ord").asc, col("doc_id").asc)
    toks.join(broadcast(b), "lang")
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .where(col("cum_tok") <= col("__budget"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion: the lexical
    * ([[bm25]]) and dense ([[hashEmbed]] cosine) top-`topKPerList`
    * rankings for one query, fused as Σ 1/(`k` + rank) over the lists
    * a doc appears in (Cormack et al. 2009's RRF — rank-only fusion,
    * so the two incomparable score scales never mix).
    *
    * The query embeds through the SAME hashEmbed plan as the corpus
    * (a one-row DataFrame — no second hash implementation to drift);
    * its ≤|terms| non-zero dims broadcast to the doc vectors, so the
    * dense side is one aggregate over matched dims + one norm
    * aggregate, never a dims×docs blow-up. Fusion is a single outer
    * join of two ≤topKPerList-row frames (both broadcast-sized by
    * construction at ANY corpus scale — the lists are already cut).
    * Cross-engine determinism: cosine's numerator/norms are exact
    * integer sums, each 1/(k+rank) is one IEEE division, ranks break
    * ties by doc_id, and cosine is rounded before ranking. */
  def hybridRrf(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], dim: Int = 64, k: Int = 60,
      topKPerList: Int = 50, topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "hybridRrf: empty query")
    require(k >= 1, "rrf k must be >= 1")
    val spark = df.sparkSession
    val lex = bm25(df, idCol, textCol, queryTerms, topK = topKPerList)
      .select(col("doc_id"), col("rank").as("bm25_rank"))
    val emb = hashEmbed(df, idCol, textCol, dim)
    val qdoc = spark.createDataFrame(Seq((0L, queryTerms.mkString(" "))))
      .toDF(idCol, textCol)
    val qv = hashEmbed(qdoc, idCol, textCol, dim)
      .select(col("dim"), col("v").as("qv"))
    val qnorm = qv.agg(sqrt(sum(col("qv") * col("qv"))).as("qn"))
    val norms = emb.groupBy("doc_id")
      .agg(sum(col("v") * col("v")).as("nn"))
    val cos = emb.join(broadcast(qv), "dim")
      .groupBy("doc_id").agg(sum(col("v") * col("qv")).as("num"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qnorm))
      .select(col("doc_id"),
        expr("CAST(ROUND(num / (SQRT(nn) * qn), 6) AS DOUBLE)").as("cos"))
      .where(col("cos") > 0)
    val dense = cos.orderBy(col("cos").desc, col("doc_id").asc)
      .limit(topKPerList)
      .withColumn("cos_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("int"))
      .select("doc_id", "cos_rank")
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        expr(s"""CAST(ROUND(
          COALESCE(CAST(1.0 AS DOUBLE) / ($k + bm25_rank), CAST(0.0 AS DOUBLE)) +
          COALESCE(CAST(1.0 AS DOUBLE) / ($k + cos_rank), CAST(0.0 AS DOUBLE)), 6) AS DOUBLE)""")
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("int"))
      .select("rank", "doc_id", "rrf", "bm25_rank", "cos_rank")
  }
}
