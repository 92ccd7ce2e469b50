package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.{Ann, Dedup, Multimodal}

/** §2.D LLM-training-data operators: dedup family, similarity search,
  * text analysis, multimodal plumbing. Library logic lives in
  * graft.operators / graft.functions; these entries wire it to the
  * testdata tables with DuckDB-oracle-mirrored numerics (md5-keyed
  * hashing and left-fold double sums are engine-portable — see
  * functions.Hashes / functions.Vectors scaladoc).
  */
object QueriesLlm {
  import Tables._

  private val stop = TextAnalysis.Stopwords.toMap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(documents(s, d), "doc_id", "text")),

    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(documents(s, d), "doc_id", "text",
        shingleK = 3, perms = 16, bands = 4, minMatches = 4)),

    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(documents(s, d), "doc_id", "text", maxHamming = 12)),

    "dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(documents(s, d), "doc_id", "text", "lang",
        n = 2, minJaccard = 0.3)),

    // directed containment |A∩B|/|A| — the asymmetric near-dup that
    // catches a doc embedded in a larger one (symmetric Jaccard
    // punishes the size gap and misses it). The gate runs the plain
    // inverted-index form: on the synthetic near-uniform-df fixture the
    // PPJoin prefix admits 1.23M of 12.5M possible pairs (measured
    // sf0.1, PLANS.md r9), so every prefix variant pays more than the
    // Σdf² aggregate it tries to avoid — same measured tradeoff as
    // dedup_ngram. The Zipf-scale prefix path is gated by
    // dedup_containment_capped below.
    "dedup_containment" -> ((s, d) =>
      Dedup.ngramContainmentPairs(documents(s, d), "doc_id", "text",
        "lang", n = 2, minContainment = 0.8)),

    // the 100-TB containment path, gated end-to-end: PPJoin-style
    // prefix candidates over df-capped grams (hot grams never join),
    // exact count-shaped verification — the DuckDB oracle mirrors the
    // rarest-first ranking, prefix cutoff, and positional bound
    // verbatim, so the CANDIDATE SET itself is pinned, not just the
    // verified survivors
    "dedup_containment_capped" -> ((s, d) =>
      Dedup.ngramContainmentPairsPrefix(documents(s, d), "doc_id", "text",
        "lang", n = 2, minContainment = 0.8, maxDf = Some(12L))),

    // the capped Jaccard sibling (same rationale; verdict r8 #6): the
    // prefix+maxDf path dedup_ngram's scaladoc points to at corpus
    // scale, oracle-pinned including the candidate generation
    "dedup_ngram_capped" -> ((s, d) =>
      Dedup.ngramJaccardPairsPrefix(documents(s, d), "doc_id", "text",
        "lang", n = 2, minJaccard = 0.3, maxDf = Some(12L))),

    // chunk-level PARTIAL-overlap detection: two long docs sharing one
    // section dilute whole-doc sketches below threshold — sliding
    // chunks sketch independently (banded minhash), chunk pairs from
    // different docs roll up to one doc pair with match count + best
    // estimate (the RefinedWeb/Dolma partial-dup shape)
    "dedup_chunks" -> ((s, d) =>
      Dedup.chunkDupPairs(documents(s, d), "doc_id", "text",
        chunkSize = 32, stride = 16)),

    // exact SUBSTRING dedup (Lee et al. 2022 ExactSubstr): every
    // ≥5-token span occurring twice anywhere in the corpus is excised
    // from every doc that carries it; the rest of the doc survives —
    // the span-level step whole-doc dedup can't do
    "dedup_substring" -> ((s, d) =>
      Dedup.substringDedup(documents(s, d), "doc_id", "text", k = 5)),

    // incremental SEMANTIC dedup: deterministic 20% of vectors play
    // the fresh ingest batch, LSH-probed strictly across sides against
    // the remaining corpus, exact-cosine reranked
    "dedup_embed_delta" -> ((s, d) => {
      val e = embeddings(s, d)
      val isFresh =
        graft.operators.Corpus.hashBucket(col("vec_id"), "edelta", 5) === 0
      Dedup.deltaEmbedding(e.where(!isFresh), e.where(isFresh),
        "vec_id", "embedding", minCosine = 0.3)
    }),

    "dedup_embed" -> ((s, d) =>
      Dedup.embeddingPairs(embeddings(s, d), "vec_id", "embedding",
        minCosine = 0.3, bands = 4, bandBits = 8)),

    // incremental ingest dedup: a deterministic 20% of docs play the
    // fresh batch, probed against the remaining 80% "corpus" — the band
    // join crosses sides only (never fresh×fresh / existing×existing)
    "dedup_delta" -> ((s, d) => {
      val docs = documents(s, d)
      val isFresh =
        graft.operators.Corpus.hashBucket(col("doc_id"), "delta", 5) === 0
      Dedup.deltaMinhash(docs.where(!isFresh), docs.where(isFresh),
        "doc_id", "text")
    }),

    // persistent LSH index: build the corpus's banded posting index on
    // disk (partitioned by band-hash bucket), then probe the fresh
    // batch against it reading ONLY touched buckets — same result
    // contract as dedup_delta (shared oracle arithmetic), different
    // machinery: the corpus is never re-sketched per probe
    "dedup_index_probe" -> ((s, d) => {
      val root = s"/tmp/graft_rt/dedup_idx_${d.replace('/', '_')}"
      val docs = documents(s, d)
      val isFresh =
        graft.operators.Corpus.hashBucket(col("doc_id"), "delta", 5) === 0
      // build-once per (JVM, sfDir) — the q_join_bucketed staging
      // discipline: repeated invocations (Bench, RunOne) time the
      // PROBE, matching how a persistent index is actually used
      stageOnce(root) {
        graft.operators.DedupIndex.buildMinhash(
          docs.where(!isFresh), "doc_id", "text", root)
      }
      graft.operators.DedupIndex.probeMinhash(
        s, root, docs.where(isFresh), "doc_id", "text")
    }),

    // incremental index maintenance on the dedup side (the
    // ann_index_upsert pattern): base index on 3 of the 4 corpus-side
    // md5 buckets, the 4th APPENDED as a purely additive delta —
    // probing fresh must equal probing a from-scratch index (same
    // oracle string as dedup_index_probe: base ∪ delta == corpus)
    "dedup_index_upsert" -> ((s, d) => {
      val root = s"/tmp/graft_rt/dedup_idxu_${d.replace('/', '_')}"
      val docs = documents(s, d)
      val bkt = graft.operators.Corpus.hashBucket(col("doc_id"), "delta", 5)
      stageOnce(root) {
        graft.operators.DedupIndex.buildMinhash(
          docs.where(bkt === 1 || bkt === 2 || bkt === 3),
          "doc_id", "text", root)
        graft.operators.DedupIndex.appendMinhash(
          s, root, docs.where(bkt === 4), "doc_id", "text")
      }
      graft.operators.DedupIndex.probeMinhash(
        s, root, docs.where(bkt === 0), "doc_id", "text")
    }),

    // index COMPACTION closes the dedup-index maintenance loop
    // (ann_index_compact's sibling): build + delta appends fragment
    // the bucket dirs, compaction folds them to one file per bucket
    // (layout-only — probe result INVARIANT, same oracle string; the
    // file-count drop and torn-swap recovery are spec-pinned)
    "dedup_index_compact" -> ((s, d) => {
      val root = s"/tmp/graft_rt/dedup_idxc_${d.replace('/', '_')}"
      val docs = documents(s, d)
      val bkt = graft.operators.Corpus.hashBucket(col("doc_id"), "delta", 5)
      stageOnce(root) {
        graft.operators.DedupIndex.buildMinhash(
          docs.where(bkt === 1 || bkt === 2 || bkt === 3),
          "doc_id", "text", root)
        graft.operators.DedupIndex.appendMinhash(
          s, root, docs.where(bkt === 4), "doc_id", "text")
        graft.operators.DedupIndex.compactMinhash(s, root)
      }
      graft.operators.DedupIndex.probeMinhash(
        s, root, docs.where(bkt === 0), "doc_id", "text")
    }),

    // CONTINUOUS-ingest dedup: the fresh 20% arrives as a real stream,
    // each micro-batch probed (foreachBatch) against the persistent
    // minhash index built once over the corpus side — per-doc results
    // are batch-split-independent (cross-side-only probe), so the
    // accumulated stream output shares dedup_index_probe's oracle
    "stream_dedup_probe" -> ((s, d) =>
      graft.streaming.Streaming.streamIndexProbe(s, d,
        s"/tmp/graft_rt/sprobe_${d.replace('/', '_')}")),

    // pairwise near-dups -> clusters: min-label propagation (iterative
    // key-partitioned joins) against a recursive-CTE DuckDB oracle.
    // Gid-level end-to-end: CC runs over one representative per
    // distinct text, membership expands once at the end — duplicate
    // multiplicity never reaches the iterative rounds
    "dedup_clusters" -> ((s, d) =>
      Dedup.simhashClusters(documents(s, d), "doc_id", "text",
        maxHamming = 12)),

    // dedup MATERIALIZATION: pairs → clusters → kept corpus (cluster
    // canonicals + never-paired docs) — the step that actually shrinks
    // the training set, applied end-to-end through the gate
    "dedup_keep" -> ((s, d) => {
      val docs = documents(s, d)
      val clusters = Dedup.simhashClusters(docs, "doc_id", "text",
        maxHamming = 12)
      Dedup.keepCanonical(docs, "doc_id", clusters)
        .select("doc_id", "lang")
    }),

    // QUALITY-aware keep: same clusters as dedup_keep, but the survivor
    // is each cluster's longest doc (n_chars desc, tie min id) — min-id
    // keep biases toward whichever copy was crawled first; production
    // dedup keeps the best extraction
    "dedup_keep_best" -> ((s, d) => {
      val docs = documents(s, d)
      val clusters = Dedup.simhashClusters(docs, "doc_id", "text",
        maxHamming = 12)
      Dedup.keepBest(docs, "doc_id", clusters, "n_chars")
        .select("doc_id", "lang")
    }),

    // the dedup report card: per-language doc/kept/dropped counts and
    // drop rate under the keep-first rule — the dataset-curation
    // summary a training run records before/after dedup
    "dedup_report" -> ((s, d) => {
      val docs = documents(s, d)
      val kept = Dedup.keepCanonical(docs, "doc_id",
          Dedup.simhashClusters(docs, "doc_id", "text", maxHamming = 12))
        .select(col("doc_id")).withColumn("keep", lit(1L))
      docs.select(col("doc_id"), col("lang"))
        .join(kept, Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("keep"), lit(0L))).as("n_kept"))
        .select(col("lang"), col("n_docs"), col("n_kept"),
          (col("n_docs") - col("n_kept")).as("n_dropped"),
          expr("CAST(ROUND((n_docs - n_kept) / CAST(n_docs AS DOUBLE), 4) + 0.0 AS DOUBLE)")
            .as("drop_rate_r"))
    }),

    // SEMANTIC dedup end-to-end (SemDeDup-style): embedding LSH pairs
    // → connected components → keep the min-id representative of each
    // semantic cluster; unpaired vectors pass through. The embedding
    // sibling of dedup_keep's simhash pipeline.
    "dedup_embed_keep" -> ((s, d) => {
      val e = embeddings(s, d)
      // gid-level CC (one rep per distinct vector value, membership
      // joined once post-clustering) — no member-expanded pair stream
      val clusters = Dedup.embeddingClusters(e, "vec_id", "embedding",
        minCosine = 0.3, bands = 4, bandBits = 8)
      Dedup.keepCanonical(e, "vec_id", clusters)
        .select(col("vec_id"), col("label"))
    }),

    // Gopher-style repetition signals: duplicate-token fraction, top
    // bigram share, longest same-token run — the filters that catch
    // keyword stuffing and templated boilerplate
    "text_repetition" -> ((s, d) =>
      graft.operators.TextStats.repetitionSignals(
        documents(s, d), "doc_id", "text")),

    // cross-document duplicate 5-gram fraction (RefinedWeb-style
    // contamination signal): inverted index keyed by the 128-bit
    // n-gram hash — only (doc_id, hash) pairs ever shuffle
    "text_dup_ngrams" -> ((s, d) =>
      graft.operators.TextStats.duplicateNgramFraction(
        documents(s, d), "doc_id", "text", n = 5)),

    // PageRank over the near-dup pair graph (3 fixed iterations):
    // centrality inside a duplicate cluster separates the template
    // document from its leaf variants; fixed-point BIGINT nano-units
    // keep pr bit-identical across engines and partitionings
    "graph_pagerank" -> ((s, d) => {
      val pairs = Dedup.simhashPairs(documents(s, d), "doc_id", "text",
          maxHamming = 12)
        .select("doc_a", "doc_b")
      val edges = pairs.unionByName(pairs.select(
        col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      graft.operators.Graph.pageRank(edges, "doc_a", "doc_b",
          iterations = 3, damping = 0.85)
        .select(col("node").as("doc_id"), col("pr_nano"), col("pr"))
    }),

    // PageRank on a DIRECTED graph with true sinks (customer →
    // order: order nodes have no out-edges), exercising the
    // dangling-mass redistribution: each iteration the sinks' total
    // rank respreads uniformly, so rank is conserved instead of
    // leaking — the crawl/citation-graph shape. Order node ids are
    // offset into a disjoint range so key spaces can't collide.
    "graph_pagerank_sinks" -> ((s, d) =>
      graft.operators.Graph.pageRank(
        orders(s, d).select(col("o_custkey").as("src"),
          (col("o_orderkey") + 10000000L).as("dst")),
        "src", "dst", iterations = 3, damping = 0.85)
        .select(col("node"), col("pr_nano"), col("pr"))),

    // personalized PageRank: teleport restricted to a seed set — rank
    // = proximity to trusted docs in the same sink-heavy bipartite
    // graph (seed-based corpus selection / labeled-set expansion)
    "graph_ppr" -> ((s, d) => {
      val o = orders(s, d)
      graft.operators.Graph.personalizedPageRank(
        o.select(col("o_custkey").as("src"),
          (col("o_orderkey") + 10000000L).as("dst")),
        "src", "dst",
        o.where(col("o_custkey") % 20 === 0).select(col("o_custkey")),
        "o_custkey", iterations = 3, damping = 0.85)
        .select(col("node"), col("pr_nano"), col("pr"))
    }),

    // triangle count + clustering coefficient per node on the same
    // near-dup pair graph — degree-oriented wedge join (O(m^1.5) under
    // any skew), cluster-tightness QA for the dedup keep-rule
    "graph_triangles" -> ((s, d) =>
      graft.operators.Graph.triangles(
        Dedup.simhashPairs(documents(s, d), "doc_id", "text",
          maxHamming = 12),
        "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("degree"),
          col("n_triangles"), col("clustering"))),

    // k-core of the near-dup graph: fixed-round peeling (4 rounds,
    // k=2) exposing the densely-duplicated heart — nodes outside the
    // core are peripheral one-off matches; the oracle unrolls the SAME
    // peels, so the round-by-round shrinkage itself is pinned
    "graph_kcore" -> ((s, d) =>
      graft.operators.Graph.kCore(
        Dedup.simhashPairs(documents(s, d), "doc_id", "text",
          maxHamming = 12),
        "doc_a", "doc_b", k = 2, rounds = 4)
        .select(col("node_id").as("doc_id"), col("deg"))),

    // provenance radius: BFS hop distance from the curated seed docs
    // through the near-dup graph (exact hop counts, 3-hop bound)
    "graph_hops" -> ((s, d) => {
      val docs = documents(s, d)
      graft.operators.Graph.shortestHops(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12),
        "doc_a", "doc_b",
        docs.where(col("doc_id") % 4 === 0), "doc_id", maxHops = 3)
    }),

    // semi-supervised label propagation over the near-dup pair graph:
    // how language-assortative is the near-dup graph: Newman modularity
    // of the lang partition over the simhash pair graph, as exact
    // rational parts per community (q_num/q_den all integer counts).
    // The rational parts stay DECIMAL(38,0) inside the operator but
    // cross the gate boundary as canonical digit strings: parquet
    // decimal(38,0) loses exactness through the comparator's float64
    // path past precision 18, while the decimal→string rendering is
    // identical in both engines at scale 0.
    "graph_modularity" -> ((s, d) => {
      val docs = documents(s, d)
      graft.operators.Graph.modularityParts(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12),
        "doc_a", "doc_b", docs, "doc_id", "lang")
        .withColumn("q_num", col("q_num").cast("string"))
        .withColumn("q_den", col("q_den").cast("string"))
    }),

    // every 4th doc's lang is a clamped seed, majority vote spreads it
    // to unlabeled neighbors (3 rounds, deterministic tie-break)
    "graph_label_prop" -> ((s, d) => {
      val docs = documents(s, d)
      graft.operators.Graph.labelPropagation(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12),
        "doc_a", "doc_b",
        docs.where(col("doc_id") % 4 === 0), "doc_id", "lang",
        iterations = 3)
    }),

    // per-label centroid vectors in long form — the k-means update step
    // as a first-class op (class means / drift summaries)
    "embed_centroid" -> ((s, d) =>
      graft.functions.Vectors.centroids(embeddings(s, d), "label",
        "embedding")),

    // embedding drift monitor: cosine between the two id-parity
    // halves' per-label centroids — 1.0 = the halves agree on where
    // each class lives; centroid tables are labels×dims whatever N is
    "embed_drift" -> ((s, d) =>
      graft.operators.Cluster.centroidDrift(embeddings(s, d),
        "vec_id", "embedding", "label")),

    // Gram/scatter matrix of the embedding column (upper triangle):
    // the distributed stage of PCA/whitening — corpus reduces to one
    // d×d cell table via map-side partials; eigen-solve is metadata
    "embed_gram" -> ((s, d) =>
      graft.operators.Cluster.gram(embeddings(s, d), "embedding")),

    "ann_topk" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.bruteForceTopK(
        e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 10)
    }),

    "ann_ivf" -> ((s, d) => {
      val e = embeddings(s, d)
      val cand = e.where(col("vec_id") >= 10)
      Ann.ivfTopK(
        e.where(col("vec_id") < 10), cand,
        Ann.trainCentroids(cand, "vec_id", "embedding", k = 8, iters = 2),
        "vec_id", "embedding", k = 5, nprobe = 2)
    }),

    "ann_lsh" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.lshTopK(
        e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, probes = 4)
    }),

    // product quantization + ADC: per-subspace Lloyd codebooks (exact
    // deterministic arithmetic), corpus compressed to m codes, search
    // reads codes + a broadcast per-query lookup table only
    "ann_pq" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.pqTopK(e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, m = 16, codebookK = 16)
    }),

    // IVF-PQ (IVFADC): coarse cells prune to nprobe inverted lists,
    // candidates are m residual PQ codes — search reads codes plus a
    // broadcast per-query lookup table only (the billion-scale layout)
    "ann_ivfpq" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.ivfpqTopK(e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, cells = 4, nprobe = 2,
        m = 8, codebookK = 8)
    }),

    // persistent IVF-PQ index: model trained + written once (codes
    // partitioned BY CELL), queries served from the stored artifact
    // reading only probed cell dirs — identical results to ann_ivfpq
    // (shared oracle string), different machinery
    "ann_index_probe" -> ((s, d) => {
      val root = s"/tmp/graft_rt/ann_idx_${d.replace('/', '_')}"
      val e = embeddings(s, d)
      // build-once per (JVM, sfDir): repeated invocations time the
      // stored-index PROBE, the artifact's actual serving shape
      stageOnce(root) {
        graft.operators.AnnIndex.buildIvfPq(
          e.where(col("vec_id") >= 10), "vec_id", "embedding", root,
          cells = 4, m = 8, codebookK = 8)
      }
      graft.operators.AnnIndex.probeIvfPq(
        s, root, e.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 2, m = 8)
    }),

    // incremental index maintenance: train+build on the base corpus,
    // APPEND a delta batch encoded against the frozen model (purely
    // additive write — no existing code file read or rewritten; spec
    // pins base files byte-identical), probe sees base ∪ delta
    "ann_index_upsert" -> ((s, d) => {
      val root = s"/tmp/graft_rt/ann_idxu_${d.replace('/', '_')}"
      val e = embeddings(s, d)
      stageOnce(root) {
        graft.operators.AnnIndex.buildIvfPq(
          e.where(col("vec_id") >= 10 && col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", root, cells = 4, m = 8, codebookK = 8)
        graft.operators.AnnIndex.appendIvfPq(s, root,
          e.where(col("vec_id") >= 10 && col("vec_id") % 3 === 0),
          "vec_id", "embedding", m = 8)
      }
      graft.operators.AnnIndex.probeIvfPq(
        s, root, e.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 2, m = 8)
    }),

    // index COMPACTION closes the maintenance loop: build + delta
    // appends accumulate per-batch files, compaction folds them back
    // to one file per cell (layout op, no re-train), and the probe
    // result is INVARIANT — same oracle string as ann_index_upsert;
    // the file-count drop itself is pinned in AnnSpec
    "ann_index_compact" -> ((s, d) => {
      val root = s"/tmp/graft_rt/ann_idxc_${d.replace('/', '_')}"
      val e = embeddings(s, d)
      stageOnce(root) {
        graft.operators.AnnIndex.buildIvfPq(
          e.where(col("vec_id") >= 10 && col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", root, cells = 4, m = 8, codebookK = 8)
        graft.operators.AnnIndex.appendIvfPq(s, root,
          e.where(col("vec_id") >= 10 && col("vec_id") % 3 === 0),
          "vec_id", "embedding", m = 8)
        graft.operators.AnnIndex.compactIvfPq(s, root)
      }
      graft.operators.AnnIndex.probeIvfPq(
        s, root, e.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nprobe = 2, m = 8)
    }),

    // retrieve-then-refine: IVF-PQ shortlist (k·4 per query from codes
    // alone) re-attaches full vectors for an exact-cosine rerank — the
    // production ANN serving shape (quantized index bounds vector reads)
    "ann_refine" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.refineTopK(e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, refineFactor = 4,
        cells = 4, nprobe = 2, m = 8, codebookK = 8)
    }),

    // SQ8 scalar quantization + asymmetric search: full-precision
    // queries against the byte-quantized corpus (4x memory cut) — the
    // oracle replicates the quantize→dequantize→score arithmetic
    "ann_sq" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.sqTopK(
        e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5)
    }),

    // kNN graph: every vector's 5 nearest neighbors via a multi-probe
    // LSH bucket SELF-join (no broadcast side — queries == corpus)
    "ann_knn_graph" -> ((s, d) =>
      Ann.knnGraph(embeddings(s, d), "vec_id", "embedding",
        k = 5, probes = 3)),

    // metadata-FILTERED search: top-5 among candidates sharing the
    // query's label — the filter value is the JOIN KEY (pre-filter,
    // partition-scoped search), never a starvation-prone post-filter
    "ann_filtered" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.filteredTopK(
        e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", "label", k = 5)
    }),

    // radius search: every candidate within a cosine threshold of each
    // probe — the unbounded-fan-out contract top-k can't express
    "ann_range" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.rangeSearch(
        e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", minCosine = 0.2)
    }),

    // dedup QA: precision/recall of the banded-minhash candidate set
    // against exact 3-gram Jaccard >= 0.5 (both computed by their
    // scale-shaped posting/band joins, restricted to in-language pairs
    // — the blocking both families share). One summary row: the
    // recall/precision dial a curation run tunes bands/perms against
    "dedup_eval" -> ((s, d) => {
      val docs = documents(s, d)
      val lg = docs.select(col("doc_id"), col("lang"))
      val cand = Dedup.minhashPairs(docs, "doc_id", "text",
          shingleK = 3, perms = 16, bands = 4, minMatches = 4)
        .join(lg.select(col("doc_id").as("doc_a"), col("lang").as("la")),
          Seq("doc_a"))
        .join(lg.select(col("doc_id").as("doc_b"), col("lang").as("lb")),
          Seq("doc_b"))
        .where(col("la") === col("lb"))
        .select("doc_a", "doc_b")
        .localCheckpoint()
      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang",
          n = 3, minJaccard = 0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint()
      val hit = cand.join(truth, Seq("doc_a", "doc_b"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .join(truth.agg(count(lit(1)).as("n_truth")))
        .join(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_candidates"), col("n_truth"), col("n_hit"),
          expr("CAST(CASE WHEN n_candidates > 0 THEN ROUND(n_hit / CAST(n_candidates AS DOUBLE), 4) + 0.0 END AS DOUBLE)")
            .as("precision_r"),
          expr("CAST(CASE WHEN n_truth > 0 THEN ROUND(n_hit / CAST(n_truth AS DOUBLE), 4) + 0.0 END AS DOUBLE)")
            .as("recall_r"))
    }),

    // generate-then-VERIFY: exact shingle-Jaccard on the banded
    // minhash candidates only (row-local array intersection) — LSH
    // false positives surface as confirmed=false instead of polluting
    // merges; estimation error visible as est − exact
    "dedup_verify" -> ((s, d) =>
      Dedup.minhashVerifiedPairs(documents(s, d), "doc_id", "text",
        shingleK = 3, perms = 16, bands = 4, minMatches = 4,
        minJaccard = 0.5)),

    // ANN QA: recall@5 of the IVF probe against the exact brute-force
    // top-5, per query — the accuracy/cost dial an index build tunes
    // cells/nprobe against
    "ann_recall_eval" -> ((s, d) => {
      val e = embeddings(s, d)
      val q = e.where(col("vec_id") < 10)
      val c = e.where(col("vec_id") >= 10)
      val ivf = Ann.ivfTopK(q, c,
          Ann.trainCentroids(c, "vec_id", "embedding", k = 8, iters = 2),
          "vec_id", "embedding", k = 5, nprobe = 2)
        .select("query_id", "neighbor_id")
      val bf = Ann.bruteForceTopK(q, c, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id")
      val hit = ivf.join(bf, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("nh"))
      q.select(col("vec_id").as("query_id"))
        .join(hit, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("nh"), lit(0L)).as("n_hit"),
          expr("CAST(ROUND(COALESCE(nh, 0) / CAST(5.0 AS DOUBLE), 4) + 0.0 AS DOUBLE)")
            .as("recall_r"))
    }),

    // MMR diversified retrieval: exact-cosine shortlist, then the k
    // greedy λ·relevance − (1−λ)·redundancy steps run UNROLLED as
    // key-partitioned DataFrame ops (selected set ≤ k rows per query)
    "ann_mmr" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.mmrTopK(e.where(col("vec_id") < 10), e.where(col("vec_id") >= 10),
        "vec_id", "embedding", k = 5, shortlistK = 20, lambda = 0.7)
    }),

    // hard-negative mining: per query, the top-10 most-similar
    // candidates with a DIFFERENT label — the contrastive-training
    // negatives pool (near but wrong)
    "ann_negatives" -> ((s, d) => {
      val e = embeddings(s, d)
      Ann.hardNegatives(e.where(col("vec_id") < 10),
        e.where(col("vec_id") >= 10),
        "vec_id", "embedding", "label", k = 10)
    }),

    // k-means clustering as a first-class op: deterministic 2-round
    // Lloyd training (ann_ivf's exact-decimal arithmetic) + full-corpus
    // nearest-centroid assignment
    "embed_kmeans" -> ((s, d) =>
      graft.operators.Cluster.kmeansAssign(embeddings(s, d),
        "vec_id", "embedding", k = 8, iters = 2)),

    // SemDeDup (Abbas et al. 2023): semantic dedup INSIDE k-means
    // cells — pairwise cosine is an equi-join on the cell id, never
    // corpus-wide; drop rule = any ≥τ lower-id neighbor in-cell
    "embed_semdedup" -> ((s, d) =>
      graft.operators.Cluster.semDedup(embeddings(s, d),
        "vec_id", "embedding", k = 8, iters = 2, minCosine = 0.3)),

    // per-class centroid-distance outliers: the lowest-5% cosine tail
    // of each label vs its own exact-decimal centroid — mislabeled/
    // noisy embedding detection before training
    "embed_outliers" -> ((s, d) =>
      graft.operators.Cluster.labelOutliers(embeddings(s, d),
        "vec_id", "embedding", "label", frac = 0.05)),

    // neighbor-set Jaccard over the near-dup band graph: common-
    // neighbor wedge join (the triangles shape), pairs need not be
    // adjacent — link prediction / "same cluster soon" scoring.
    // Gate graph = hamming ≤ 6 (the TIGHT near-dup edges): wedge work
    // is quadratic in hub degree, so the quadratic op earns the
    // tighter threshold the linear ops (pagerank/label-prop, ≤ 12)
    // don't need. For dup-HEAVY corpora (real crawls) the same output
    // comes from Graph.neighborJaccardGrouped on the gid graph —
    // equality spec-pinned; this synthetic corpus is dup-light (8
    // dup pairs / 5000 docs), so the doc-level path is the right one
    // minCommon = 1: this dup-light synthetic corpus's near-dup graph
    // has 67 wedge pairs sharing exactly ONE neighbor at sf0.01 and
    // none sharing two — minCommon = 2 returned 0 rows on both engines
    // (a vacuous gate). Real crawls have dup cliques where >= 2 is the
    // useful dial; the wedge machinery under test is identical
    "graph_jaccard" -> ((s, d) =>
      graft.operators.Graph.neighborJaccard(
        Dedup.simhashPairs(documents(s, d), "doc_id", "text",
          maxHamming = 6),
        "doc_a", "doc_b", minCommon = 1)),

    // language-ID quality card: confusion matrix of predicted vs
    // labeled language (the eval every heuristic classifier ships
    // with) — one count aggregate over the langid frame
    "text_langid_confusion" -> ((s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokens(col("text")).as("toks"))
      val hits = t.select(col("doc_id") +: col("lang") +:
        TextAnalysis.Stopwords.map { case (l, _) =>
          TextAnalysis.stopwordHits("toks", l).as(s"hits_$l")
        }.toSeq: _*)
      hits.select(col("lang"), TextAnalysis.predLang.as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    }),

    "text_langid" -> ((s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      val hits = t.select(col("doc_id") +:
        TextAnalysis.Stopwords.map { case (l, _) =>
          TextAnalysis.stopwordHits("toks", l).as(s"hits_$l")
        }: _*)
      hits.select(col("doc_id"), TextAnalysis.predLang.as("pred_lang"),
        col("hits_en"), col("hits_es"), col("hits_fr"), col("hits_de"),
        col("hits_zh"))
    }),

    // Flesch reading-ease with a deterministic vowel-run syllable
    // proxy — row-local, zero shuffle; raw counts ride along exact
    "text_readability" -> ((s, d) =>
      graft.operators.TextStats.readability(documents(s, d),
        "doc_id", "text")),

    "text_quality" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          expr("size(toks)").as("n_tokens"),
          expr("length(text)").as("n_chars"),
          expr("aggregate(toks, 0, (a, x) -> a + length(x))").as("wlen_sum"),
          expr("length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', ''))").as("punct"),
          TextAnalysis.stopwordHits("toks", "en").as("hits_en"))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"),
          expr("CAST(wlen_sum AS DOUBLE) / n_tokens").as("awl"),
          expr("CAST(punct AS DOUBLE) / n_chars").as("pr"),
          expr("CAST(hits_en AS DOUBLE) / n_tokens").as("sr"))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"),
          expr("CAST(ROUND(awl, 4) AS DOUBLE)").as("avg_wlen"),
          expr("CAST(ROUND(pr, 4) AS DOUBLE)").as("punct_ratio"),
          expr("CAST(ROUND(sr, 4) AS DOUBLE)").as("stop_ratio"),
          expr("CAST(ROUND(LEAST(1.0, n_tokens/50.0)*0.5 + (1.0-pr)*0.3 " +
               "+ LEAST(1.0, sr*5.0)*0.2, 4) AS DOUBLE)").as("score"))
        .withColumn("quality_bucket",
          expr("CASE WHEN score >= 0.7 THEN 'high' WHEN score >= 0.4 THEN 'mid' ELSE 'low' END"))),

    // the composite Gopher rule battery: one row per doc with every
    // rule metric, per-rule verdict thresholds folded into `pass` —
    // row-local, zero shuffle
    "text_gopher_rules" -> ((s, d) =>
      graft.operators.TextStats.gopherRules(documents(s, d),
        "doc_id", "text", minWords = 50)),

    // char-level Shannon entropy: repeated-char junk scores near 0,
    // base64/binary spill scores implausibly high — exact count-scaled
    // decimal arithmetic, doc-local shuffle keys only
    "text_entropy" -> ((s, d) =>
      graft.operators.TextStats.charEntropy(documents(s, d),
        "doc_id", "text")),

    // fasttext-style hashed char-trigram linear classifier (inference
    // side of a quality/topic gate): ONE native codegen'd kernel call
    // per row in the scan stage — no explode, no shuffle; the weight
    // table rides the plan as a constant (broadcast-sized at cluster
    // scale). Score is an exact integer milli-unit sum, so the result
    // is order-, partition- and engine-independent; the gate's weights
    // come from a one-line LCG so the oracle derives the same table.
    "text_classify" -> ((s, d) => {
      val sc = graft.plans.GraftFunctions.ngramScore(
        s, col("text"), graft.plans.Sketches.lcgWeights(512).toIndexedSeq)
      documents(s, d)
        .select(col("doc_id"), sc.getItem(0).as("score_milli"),
          sc.getItem(1).as("n_grams"))
        .withColumn("label",
          when(col("score_milli") >= 0, lit("keep")).otherwise(lit("drop")))
    }),

    "text_tokens" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          expr("size(toks)").as("ws_tokens"),
          TextAnalysis.subwordCount(col("text")).as("subwords"),
          expr("length(text)").as("n_chars"))
        .withColumn("chars_per_token",
          expr("CAST(ROUND(CAST(n_chars AS DOUBLE) / ws_tokens, 4) AS DOUBLE)"))),

    "text_clean" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextAnalysis.clean(col("text")).as("cleaned"))
        .select(col("doc_id"), col("cleaned"),
          length(col("cleaned")).as("n_clean_chars"),
          size(TextAnalysis.tokens(col("cleaned"))).as("n_clean_tokens"))),

    "text_stopword_filter" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          concat_ws(" ", TextAnalysis.removeStopwords("toks", "en")).as("kept"),
          (size(col("toks")) -
            size(TextAnalysis.removeStopwords("toks", "en"))).as("n_removed"))),

    // PII scrubbing — emails + long digit runs masked, per-class counts
    // kept for corpus reporting; pure row-local codegen'd regex
    "text_pii_mask" -> ((s, d) => {
      val (emails, nums) = TextAnalysis.piiCounts(col("text"))
      documents(s, d).select(
        col("doc_id"),
        TextAnalysis.maskPii(col("text")).as("masked"),
        emails.as("n_emails"),
        nums.as("n_longnums"))
    }),

    "text_fingerprint" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 4)
        .select(col("doc_id"), TextAnalysis.fingerprint("toks").as("fp"))),

    "mm_features" -> ((s, d) =>
      Multimodal.byteFeatures(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text"))),

    "mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text"),
        frameBytes = 256)),

    // image near-dup by 60-bit perceptual hash (aHash over the payload
    // bytes as a 1-D grayscale strip, exact integer thresholding):
    // exact-duplicate payloads rep-collapse before the 4×15-bit band
    // join — the simhash discipline on the binary side. The oracle
    // rebuilds the same hash from character codepoints (the synthetic
    // corpus is pure ASCII, so codepoints == payload bytes).
    "mm_phash_dedup" -> ((s, d) =>
      Multimodal.phashPairs(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text"),
        maxHamming = 12)),

    // the batched DECODE stage itself, driver-gated: decodeFeatures
    // parses each P6 container pure-JVM (header grammar → real dims).
    // The metadata columns are POISONED to -1 before the decode, so
    // the emitted dims can only come from the PARSED header — a
    // decoder silently falling back to the stub branch (which passes
    // metadata through) would emit -1 and hash-fail against the
    // oracle's recomputed dims
    "mm_decode" -> ((s, d) =>
      Multimodal.decodeFeatures(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text")
          .withColumn("width", lit(-1)).withColumn("height", lit(-1)))
        .toDF().select(col("id"), col("byte_len"), col("width"),
          col("height"))),

    // the BMP decode path, driver-gated like mm_decode: a MIXED table
    // (even ids P6, odd ids 24-bit BMP) runs through the same poisoned
    // -metadata decode, so BOTH container parsers must produce the
    // real header dims — the oracle rebuilds each format's byte length
    // from its published layout (P6 header + 3L vs 54-byte BMP headers
    // + 4-byte-padded BGR rows). Empty texts are excluded: a w=0 BMP
    // is rejected by design
    "mm_decode_bmp" -> ((s, d) =>
      Multimodal.decodeFeatures(
        Multimodal.attachBinary(
            documents(s, d).where(octet_length(col("text")) > 0),
            "doc_id", "text", format = "mixed")
          .withColumn("width", lit(-1)).withColumn("height", lit(-1)))
        .toDF().select(col("id"), col("byte_len"), col("width"),
          col("height"))),

    // the JPEG decode path (r14 pure-JVM baseline T.81 codec),
    // driver-gated like mm_decode: poisoned metadata means the dims
    // can only come from a real SOF0 parse through the full marker /
    // DQT / DHT grammar — a decoder rejecting to the stub branch
    // emits -1 and hash-fails. byte_len is NOT pinned: the entropy-
    // coded length is content-dependent (Huffman), the documented
    // reason THIS gate pins dims while ppm/bmp also pin lengths;
    // pixel fidelity is spec-pinned against the JDK's ImageIO as an
    // independent reference (JpegCodecSpec). Empty texts excluded
    // (a w=0 frame is rejected by design, the BMP convention)
    "mm_decode_jpeg" -> ((s, d) =>
      Multimodal.decodeFeatures(
        Multimodal.attachBinary(
            documents(s, d).where(octet_length(col("text")) > 0),
            "doc_id", "text", format = "jpeg")
          .withColumn("width", lit(-1)).withColumn("height", lit(-1)))
        .toDF().select(col("id"), col("width"), col("height"))),

    // frame-level shared-footage detection: 256-byte frames, phash per
    // frame, cross-doc band join — packed (doc, frame) units ride the
    // rep-collapsed sketch machinery unchanged
    "mm_frames_dedup" -> ((s, d) =>
      Multimodal.frameNearDupPairs(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text"),
        frameBytes = 256, maxHamming = 8)),

    // scene-cut detection: per-frame phash, one keyed lag, cut where
    // adjacent frames' hamming reaches the threshold — change
    // detection WITHIN a video, vs mm_frames_dedup's cross-video join
    "mm_scene_cuts" -> ((s, d) =>
      Multimodal.sceneCuts(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text"),
        frameBytes = 256, minHamming = 28)),

    // Shazam-style audio retrieval: landmark fingerprints (native
    // kernel, scan-stage) → df-capped inverted-index join → per-query
    // top-3 by shared landmarks; only fingerprint postings shuffle
    "mm_audio_fp" -> ((s, d) => {
      val media = Multimodal.attachBinary(documents(s, d), "doc_id", "text")
      Multimodal.audioMatches(
        media.where(col("id") < 20), media.where(col("id") >= 20),
        k = 3, maxDf = 50)
    }),

    // image near-dup CLUSTERS: CC over the phash pair graph (gid-level
    // rounds, one membership expansion) — "one per meme family"
    "mm_phash_clusters" -> ((s, d) =>
      Multimodal.phashClusters(
        Multimodal.attachBinary(documents(s, d), "doc_id", "text"),
        maxHamming = 12)),

    // crawl-URL dedup: synthesize each doc's messy source URL (case
    // noise, default port, per-doc tracking params, fragment), then
    // canonicalize and group — duplicate groups are docs whose URLs
    // normalize identically. Every normalization rule is load-bearing
    // here: the raw strings are pairwise-distinct (utm_/fragment carry
    // doc-unique noise), so raw exact-dedup finds NOTHING and the
    // canonical groups (path + surviving sorted params) find
    // ceil(n/20)-sized families. Canonicalization is row-local
    // (scan-stage codegen); the only shuffle keys on the canonical URL
    "text_url_normalize" -> ((s, d) => {
      val urls = documents(s, d).select(col("doc_id"),
        expr("""concat('HTTPS://WWW.Example.COM:443/d/',
               |  CAST(doc_id % 10 AS STRING),
               |  '?utm_source=', source,
               |  '&z=', CAST(doc_id % 2 AS STRING),
               |  '&utm_doc=', CAST(doc_id AS STRING),
               |  CASE WHEN doc_id % 5 = 0
               |       THEN concat('#sec?x=', CAST(doc_id AS STRING))
               |       ELSE '' END)
               |""".stripMargin).as("url"))
      urls
        .withColumn("canonical",
          graft.functions.TextAnalysis.canonicalizeUrl("url"))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
        .where(col("n_docs") > 1)
    })
  )

  // build-once-per-JVM staging guard for persisted index artifacts: a
  // fresh JVM always rebuilds (stale /tmp dirs from a previous round's
  // testdata are deleted first), repeat invocations inside one JVM
  // reuse the artifact — Bench/RunOne time the probe, not the build
  private val stagedPaths =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  private def stageOnce(path: String)(build: => Unit): Unit =
    stagedPaths.getOrElseUpdate(path, {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      build
    })

  // cross-side banded minhash probe: fresh docs (md5 'delta' bucket 0
  // of 5) vs the rest — shared verbatim by dedup_delta (ad-hoc probe)
  // and dedup_index_probe (persistent index), which must return
  // identical matches
  private val deltaMinhashOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |sig AS (
      |  SELECT doc_id, [list_min([md5(CAST(p AS VARCHAR)||':'||s) for s in shingles]) for p in range(0,16)] AS sig FROM sh),
      |lab AS (
      |  SELECT doc_id, sig, ('0x'||substr(md5('delta:'||CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 5 = 0 AS fresh FROM sig),
      |bands AS (
      |  SELECT doc_id, sig, fresh, b, md5(sig[4*b+1]||sig[4*b+2]||sig[4*b+3]||sig[4*b+4]) AS bh
      |  FROM lab, range(0,4) t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_of, a.sig AS sig_a, b.sig AS sig_b
      |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.fresh AND NOT b.fresh)
      |SELECT doc_id, dup_of,
      |  CAST(ROUND(list_sum([CASE WHEN sig_a[i+1]=sig_b[i+1] THEN 1 ELSE 0 END for i in range(0,16)])/16.0, 4) AS DOUBLE) AS est_jaccard
      |FROM cand
      |WHERE list_sum([CASE WHEN sig_a[i+1]=sig_b[i+1] THEN 1 ELSE 0 END for i in range(0,16)]) >= 4""".stripMargin

  // the IVF-PQ pipeline through the ADC score table r3 — shared by
  // ann_ivfpq (direct top-k) and ann_refine (shortlist + exact rerank).
  // MATERIALIZED on the multiply-referenced stages: refine's rerank
  // re-joins v twice and inlined CTEs would re-expand the whole
  // training pipeline per reference (the corpus_bpe_train lesson)
  /** IVF-PQ oracle, parameterized by the TRAINING candidate set and the
    * ENCODED candidate set (equal for plain ivfpq; the upsert gate
    * trains on the base rows only and encodes base ∪ delta against the
    * frozen model — exactly what the engine's append path does). */
  private def ivfpqCte(trainPred: String, encodePred: String): String =
    s"""WITH v AS MATERIALIZED (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
      |c AS (SELECT vec_id, x FROM v WHERE $trainPred),
      |encset AS (SELECT vec_id, x FROM v WHERE $encodePred),
      |q AS (SELECT vec_id, x FROM v WHERE vec_id < 10),
      |cent0 AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, x AS cx
      |  FROM c QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 4),
      |asg1 AS (
      |  SELECT vec_id, x, cell FROM (
      |    SELECT a.vec_id, a.x, c0.cell,
      |      list_sum([a.x[i+1]*c0.cx[i+1] for i in range(0,64)]) /
      |        (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([p2*p2 for p2 in c0.cx]))) AS cc
      |    FROM c a, cent0 c0)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ROUND(cc, 6) DESC, cell) = 1),
      |cent AS MATERIALIZED (
      |  SELECT cell, [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,64)] AS cx
      |  FROM (SELECT cell, list(x) AS vs FROM asg1 GROUP BY cell)),
      |listed AS (
      |  SELECT vec_id AS nid, cell, [x[i+1] - cx[i+1] for i in range(0,64)] AS r
      |  FROM (
      |    SELECT a.vec_id, a.x, ct.cell, ct.cx,
      |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY ROUND(
      |        list_sum([a.x[i+1]*ct.cx[i+1] for i in range(0,64)]) /
      |          (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([p2*p2 for p2 in ct.cx]))), 6) DESC, ct.cell) AS crn
      |    FROM c a, cent ct)
      |  WHERE crn = 1),
      |rsub AS MATERIALIZED (SELECT nid, cell, s, r[s*8+1 : s*8+8] AS rs
      |  FROM listed, range(0,8) t(s)),
      |cb0 AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY nid) - 1 AS INT) AS cid, r
      |  FROM listed QUALIFY ROW_NUMBER() OVER (ORDER BY nid) <= 8),
      |cb0s AS (SELECT cid, s, r[s*8+1 : s*8+8] AS cs FROM cb0, range(0,8) t(s)),
      |pasg1 AS (
      |  SELECT nid, s, rs, cid FROM (
      |    SELECT u.nid, u.s, u.rs, c0.cid,
      |      list_sum([c0.cs[i+1]*c0.cs[i+1] for i in range(0,8)])
      |        - 2 * list_sum([u.rs[i+1]*c0.cs[i+1] for i in range(0,8)]) AS d2
      |    FROM rsub u JOIN cb0s c0 ON u.s = c0.s)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY nid, s ORDER BY ROUND(d2, 9) ASC, cid) = 1),
      |cb1 AS MATERIALIZED (
      |  SELECT s, cid, [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,8)] AS cs
      |  FROM (SELECT s, cid, list(rs) AS vs FROM pasg1 GROUP BY s, cid)),
      |listedall AS (
      |  SELECT vec_id AS nid, cell, [x[i+1] - cx[i+1] for i in range(0,64)] AS r
      |  FROM (
      |    SELECT a.vec_id, a.x, ct.cell, ct.cx,
      |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY ROUND(
      |        list_sum([a.x[i+1]*ct.cx[i+1] for i in range(0,64)]) /
      |          (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([p2*p2 for p2 in ct.cx]))), 6) DESC, ct.cell) AS crn
      |    FROM encset a, cent ct)
      |  WHERE crn = 1),
      |rsuball AS MATERIALIZED (SELECT nid, cell, s, r[s*8+1 : s*8+8] AS rs
      |  FROM listedall, range(0,8) t(s)),
      |codes AS (
      |  SELECT nid, cell, s, cid FROM (
      |    SELECT u.nid, u.cell, u.s, c1.cid,
      |      list_sum([c1.cs[i+1]*c1.cs[i+1] for i in range(0,8)])
      |        - 2 * list_sum([u.rs[i+1]*c1.cs[i+1] for i in range(0,8)]) AS d2
      |    FROM rsuball u JOIN cb1 c1 ON u.s = c1.s)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY nid, s ORDER BY ROUND(d2, 9) ASC, cid) = 1),
      |recon AS (
      |  SELECT ct.cell, c1.s, c1.cid,
      |    [ct.cx[c1.s*8 + i + 1] + c1.cs[i+1] for i in range(0,8)] AS xs_hat
      |  FROM cent ct, cb1 c1),
      |probes AS (
      |  SELECT vec_id AS query_id, x AS xq, cell FROM (
      |    SELECT a.vec_id, a.x, ct.cell,
      |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY ROUND(
      |        list_sum([a.x[i+1]*ct.cx[i+1] for i in range(0,64)]) /
      |          (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([p2*p2 for p2 in ct.cx]))), 6) DESC, ct.cell) AS crn
      |    FROM q a, cent ct)
      |  WHERE crn <= 2),
      |lut AS (
      |  SELECT p.query_id, sqrt(list_sum([z*z for z in p.xq])) AS qn,
      |    r2.cell, r2.s, r2.cid,
      |    list_sum([p.xq[r2.s*8 + i + 1] * r2.xs_hat[i+1] for i in range(0,8)]) AS qd,
      |    list_sum([h*h for h in r2.xs_hat]) AS t2
      |  FROM probes p JOIN recon r2 ON p.cell = r2.cell),
      |pairs AS (
      |  SELECT query_id, nid AS neighbor_id, ANY_VALUE(qn) AS qn,
      |    SUM(CAST(ROUND(qd, 9) AS DECIMAL(38,9))) AS dq,
      |    SUM(CAST(ROUND(t2, 9) AS DECIMAL(38,9))) AS x2
      |  FROM codes JOIN lut USING (cell, s, cid) GROUP BY query_id, nid),
      |r3 AS MATERIALIZED (SELECT query_id, neighbor_id,
      |  CAST(dq AS DOUBLE) / (qn * sqrt(CAST(x2 AS DOUBLE))) AS cos FROM pairs)""".stripMargin

  private val ivfpqOracleCte: String =
    ivfpqCte("vec_id >= 10", "vec_id >= 10")

  private def inList(lang: String): String =
    stop(lang).map(w => s"'$w'").mkString(", ")
  private def duckHits(lang: String): String =
    s"CAST(len(list_filter(w, t -> list_contains([${inList(lang)}], t))) AS INT) AS hits_$lang"
  private val predLangSql = {
    val langs = TextAnalysis.Stopwords.map(_._1)
    val cases = langs.map { l =>
      val geAll = langs.map(o => s"hits_$l >= hits_$o").mkString(" AND ")
      s"WHEN $geAll AND hits_$l > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  /** The simhash band-pair → recursive-CC → cluster-label CTE chain
    * (ends at `cl`) — shared by the dedup_keep and dedup_report
    * oracles. */
  private val simhashKeepCte: String =
    """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |pr AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |nodes AS (SELECT DISTINCT doc_a AS n FROM pr UNION SELECT doc_b FROM pr),
        |e AS (SELECT doc_a AS s, doc_b AS d FROM pr UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach AS (
        |  SELECT n AS node, n AS lbl FROM nodes
        |  UNION
        |  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node),
        |cl AS (SELECT node AS cdoc, MIN(lbl) AS cluster_id FROM reach GROUP BY node)""".stripMargin

  /** The ann_ivf oracle body (unrolled candidate-side Lloyd + probe
    * search) — shared by ann_ivf and ann_recall_eval. */
  private val annIvfOracle: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
      |c AS (SELECT vec_id, x FROM v WHERE vec_id >= 10),
      |cent0 AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, x AS cx
      |  FROM c QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 8),
      |asg1 AS (
      |  SELECT vec_id, x, cid FROM (
      |    SELECT a.vec_id, a.x, c0.cid,
      |      list_sum([a.x[i+1]*c0.cx[i+1] for i in range(0,64)]) /
      |        (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([q*q for q in c0.cx]))) AS cc
      |    FROM c a, cent0 c0)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ROUND(cc, 6) DESC, cid) = 1),
      |cent1 AS (
      |  SELECT cid, [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,64)] AS cx
      |  FROM (SELECT cid, list(x) AS vs FROM asg1 GROUP BY cid)),
      |asg2 AS (
      |  SELECT vec_id, x, cid FROM (
      |    SELECT a.vec_id, a.x, c1.cid,
      |      list_sum([a.x[i+1]*c1.cx[i+1] for i in range(0,64)]) /
      |        (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([q*q for q in c1.cx]))) AS cc
      |    FROM c a, cent1 c1)
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ROUND(cc, 6) DESC, cid) = 1),
      |cent2 AS (
      |  SELECT cid, [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,64)] AS cx
      |  FROM (SELECT cid, list(x) AS vs FROM asg2 GROUP BY cid)),
      |asg AS (
      |  SELECT vec_id, x, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ROUND(ccos, 6) DESC, cid) AS crn
      |  FROM (
      |    SELECT a.vec_id, a.x, c2.cid,
      |      list_sum([a.x[i+1]*c2.cx[i+1] for i in range(0,64)]) /
      |        (sqrt(list_sum([p*p for p in a.x])) * sqrt(list_sum([q*q for q in c2.cx]))) AS ccos
      |    FROM v a, cent2 c2)),
      |lists AS (SELECT vec_id AS neighbor_id, x AS nx, cid FROM asg WHERE vec_id >= 10 AND crn = 1),
      |probes AS (SELECT vec_id AS query_id, x AS qx, cid FROM asg WHERE vec_id < 10 AND crn <= 2),
      |p AS (
      |  SELECT query_id, neighbor_id,
      |    list_sum([qx[i+1]*nx[i+1] for i in range(0,64)]) /
      |      (sqrt(list_sum([p2*p2 for p2 in qx])) * sqrt(list_sum([q2*q2 for q2 in nx]))) AS cos
      |  FROM lists JOIN probes USING (cid))
      |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
      |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
      |FROM p
      |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
      |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin

  /** The dedup_minhash oracle body (banded minhash candidates with the
    * signature-agreement filter) — shared by dedup_minhash and
    * dedup_eval. */
  private val minhashPairsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS shingles
      |  FROM toks WHERE len(w) >= 3),
      |sig AS (
      |  SELECT doc_id, [list_min([md5(CAST(p AS VARCHAR)||':'||s) for s in shingles]) for p in range(0,16)] AS sig FROM sh),
      |bands AS (
      |  SELECT doc_id, sig, b, md5(sig[4*b+1]||sig[4*b+2]||sig[4*b+3]||sig[4*b+4]) AS bh
      |  FROM sig, range(0,4) t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
      |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(ROUND(list_sum([CASE WHEN sig_a[i+1]=sig_b[i+1] THEN 1 ELSE 0 END for i in range(0,16)])/16.0, 4) AS DOUBLE) AS est_jaccard
      |FROM cand
      |WHERE list_sum([CASE WHEN sig_a[i+1]=sig_b[i+1] THEN 1 ELSE 0 END for i in range(0,16)]) >= 4""".stripMargin

  /** DuckDB cosine between two DOUBLE[] columns (sequential list_sum
    * fold — bit-matches the engine's left-fold aggregate). */
  private def sqlCos(a: String, b: String): String =
    s"list_sum([$a[i+1]*$b[i+1] for i in range(0,64)]) / " +
      s"(sqrt(list_sum([p2*p2 for p2 in $a])) * sqrt(list_sum([q2*q2 for q2 in $b])))"

  /** Unrolled 2-iteration Lloyd over ALL embedding vectors (k = 8,
    * seeds = 8 lowest ids) — the ann_ivf oracle's arithmetic with the
    * candidate filter removed — ending in `kasgf`: every vector's final
    * (cid, cosine-to-centroid) assignment. Shared by embed_kmeans and
    * embed_semdedup. */
  private val kmeansAllCte: String = {
    def asgStep(out: String, centRel: String) =
      s"""$out AS (
         |  SELECT vec_id, x, cid FROM (
         |    SELECT a.vec_id, a.x, c0.cid, ${sqlCos("a.x", "c0.cx")} AS cc
         |    FROM v a, $centRel c0)
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ROUND(cc, 6) DESC, cid) = 1)""".stripMargin
    def centStep(out: String, asgRel: String) =
      s"""$out AS (
         |  SELECT cid, [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,64)] AS cx
         |  FROM (SELECT cid, list(x) AS vs FROM $asgRel GROUP BY cid))""".stripMargin
    s"""v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |kcent0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, x AS cx
       |  FROM v QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 8),
       |${asgStep("kasg1", "kcent0")},
       |${centStep("kcent1", "kasg1")},
       |${asgStep("kasg2", "kcent1")},
       |${centStep("kcent2", "kasg2")},
       |kasgf AS (
       |  SELECT vec_id, x, cid, cc FROM (
       |    SELECT a.vec_id, a.x, c2.cid, ${sqlCos("a.x", "c2.cx")} AS cc
       |    FROM v a, kcent2 c2)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ROUND(cc, 6) DESC, cid) = 1)""".stripMargin
  }

  /** Unrolled greedy MMR (k = 5, shortlist 20, λ = 0.7). Every float
    * literal forced to DOUBLE: DuckDB parses bare 0.7 as DECIMAL whose
    * exact (1 − 0.7) diverges from IEEE 1.0 − 0.7. */
  private val annMmrOracle: String = {
    val lam = "CAST(0.7 AS DOUBLE)"
    val oneMinusLam = s"(CAST(1.0 AS DOUBLE) - $lam)"
    val sb = new StringBuilder
    sb ++= s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       |q AS (SELECT vec_id AS query_id, x AS qx FROM v WHERE vec_id < 10),
       |c AS (SELECT vec_id AS neighbor_id, x AS nx FROM v WHERE vec_id >= 10),
       |sl AS (
       |  SELECT query_id, neighbor_id, nx, ROUND(cos, 6) AS cos6 FROM (
       |    SELECT query_id, neighbor_id, nx, ${sqlCos("qx", "nx")} AS cos FROM q, c)
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id) <= 20),
       |sel1 AS (
       |  SELECT query_id, neighbor_id, nx, ROUND($lam * cos6, 6) AS mmr, 1 AS rank
       |  FROM sl QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id) = 1),
       |selu1 AS (SELECT * FROM sel1)""".stripMargin
    for (t <- 2 to 5) {
      val mmrExpr = s"ROUND($lam * cos6 - $oneMinusLam * maxsim, 6)"
      sb ++= s""",
         |sc$t AS (
         |  SELECT r.query_id, r.neighbor_id, ANY_VALUE(r.nx) AS nx,
         |    ANY_VALUE(r.cos6) AS cos6,
         |    MAX(ROUND(${sqlCos("r.nx", "s.nx")}, 6)) AS maxsim
         |  FROM sl r JOIN selu${t - 1} s USING (query_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM selu${t - 1} u
         |    WHERE u.query_id = r.query_id AND u.neighbor_id = r.neighbor_id)
         |  GROUP BY r.query_id, r.neighbor_id),
         |sel$t AS (
         |  SELECT query_id, neighbor_id, nx, $mmrExpr AS mmr, $t AS rank
         |  FROM sc$t
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY $mmrExpr DESC, neighbor_id) = 1),
         |selu$t AS (SELECT * FROM selu${t - 1} UNION ALL SELECT * FROM sel$t)""".stripMargin
    }
    sb ++= """
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       |  CAST(ROUND(mmr, 4) + 0.0 AS DOUBLE) AS mmr_r
       |FROM selu5""".stripMargin
    sb.toString
  }

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "dedup_minhash" -> minhashPairsOracle,

    "dedup_delta" -> deltaMinhashOracle,

    // the persistent-index probe returns the SAME matches as the
    // ad-hoc delta probe — one oracle string for both, so the two
    // machineries are pinned to one semantics
    "dedup_index_probe" -> deltaMinhashOracle,
    // base(3 buckets) ∪ appended delta(1 bucket) == the full corpus
    // side, so the upsert/compact probes share the SAME oracle — the
    // maintenance ops must be invisible to results
    "dedup_index_upsert" -> deltaMinhashOracle,
    "dedup_index_compact" -> deltaMinhashOracle,

    // the STREAMED probe accumulates the same matches batch by batch —
    // third machinery pinned to the same oracle string
    "stream_dedup_probe" -> deltaMinhashOracle,

    "dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, list_distinct([array_to_string(w[i:i+1],' ') for i in range(1, len(w))]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.g, b.g)) AS inter, len(a.g) AS na, len(b.g) AS nb
        |  FROM bg a JOIN bg b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(ROUND(CAST(inter AS DOUBLE)/(na+nb-inter), 4) AS DOUBLE) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE)/(na+nb-inter) >= 0.3""".stripMargin,

    // banded hyperplane-LSH candidates (4 bands × 8 planes from the
    // 32-plane LCG family) + exact-cosine rerank — mirrors
    // Dedup.embeddingPairs exactly (the band family is deterministic
    // arithmetic, so the candidate set is engine-portable)
    "dedup_embed" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |bk AS (
        |  SELECT vec_id,
        |    list_sum([CASE WHEN list_sum([x[d+1] * ((CAST((1103515245::BIGINT * (p * 1024 + d) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) * 2.0 - 1.0) for d in range(0,64)]) >= 0.0
        |              THEN CAST(2**p AS BIGINT) ELSE 0 END for p in range(0,32)]) AS bkt
        |  FROM v),
        |bands AS (
        |  SELECT vec_id, b, (bkt >> (8*b)) & 255 AS bv FROM bk, range(0,4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.vec_id < b.vec_id),
        |p AS (
        |  SELECT id_a, id_b,
        |    list_sum([va.x[i+1]*vb.x[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([xx*xx for xx in va.x])) * sqrt(list_sum([yy*yy for yy in vb.x]))) AS cos
        |  FROM cand JOIN v va ON id_a = va.vec_id JOIN v vb ON id_b = vb.vec_id)
        |SELECT id_a, id_b, CAST(ROUND(cos, 4) AS DOUBLE) AS cos_sim
        |FROM p WHERE cos >= 0.3""".stripMargin,

    // dedup_embed's candidate CTE + dedup_clusters' recursive CC + the
    // keep rule, over the embeddings table
    "dedup_embed_keep" ->
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |bk AS (
        |  SELECT vec_id,
        |    list_sum([CASE WHEN list_sum([x[d+1] * ((CAST((1103515245::BIGINT * (p * 1024 + d) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) * 2.0 - 1.0) for d in range(0,64)]) >= 0.0
        |              THEN CAST(2**p AS BIGINT) ELSE 0 END for p in range(0,32)]) AS bkt
        |  FROM v),
        |bands AS (
        |  SELECT vec_id, b, (bkt >> (8*b)) & 255 AS bv FROM bk, range(0,4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.vec_id < b.vec_id),
        |pr AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |      list_sum([va.x[i+1]*vb.x[i+1] for i in range(0,64)]) /
        |        (sqrt(list_sum([xx*xx for xx in va.x])) * sqrt(list_sum([yy*yy for yy in vb.x]))) AS cos
        |    FROM cand JOIN v va ON id_a = va.vec_id JOIN v vb ON id_b = vb.vec_id)
        |  WHERE cos >= 0.3),
        |nodes AS (SELECT DISTINCT id_a AS n FROM pr UNION SELECT id_b FROM pr),
        |e AS (SELECT id_a AS s, id_b AS d FROM pr UNION ALL SELECT id_b, id_a FROM pr),
        |reach AS (
        |  SELECT n AS node, n AS lbl FROM nodes
        |  UNION
        |  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node),
        |cl AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
        |losers AS (SELECT node FROM cl WHERE node <> cluster_id)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT node FROM losers)""".stripMargin,

    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 12""".stripMargin,

    // the dedup_simhash pair pipeline + exact integer modularity parts
    "graph_modularity" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |pr AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pr),
        |deg AS (
        |  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT doc_a AS n FROM pr UNION ALL SELECT doc_b FROM pr)
        |  GROUP BY 1),
        |lab AS (SELECT DISTINCT doc_id AS n, lang AS c FROM documents
        |  WHERE lang IS NOT NULL),
        |ew AS (
        |  SELECT la.c, CAST(COUNT(*) AS BIGINT) AS e_within
        |  FROM pr JOIN lab la ON la.n = pr.doc_a JOIN lab lb ON lb.n = pr.doc_b
        |  WHERE la.c = lb.c GROUP BY 1),
        |ds AS (SELECT c, CAST(SUM(deg) AS BIGINT) AS d_sum
        |  FROM deg JOIN lab USING (n) GROUP BY 1)
        |SELECT ds.c AS lang,
        |  CAST(COALESCE(e_within, 0) AS BIGINT) AS n_edges_within, d_sum,
        |  CAST(4*CAST(m AS HUGEINT)*COALESCE(e_within, 0)
        |    - CAST(d_sum AS HUGEINT)*d_sum AS VARCHAR) AS q_num,
        |  CAST(4*CAST(m AS HUGEINT)*m AS VARCHAR) AS q_den
        |FROM ds LEFT JOIN ew USING (c) CROSS JOIN m""".stripMargin,

    // same simhash band/hamming pipeline as dedup_simhash, then
    // connected components as a recursive CTE (min reachable id per
    // node = the cluster's canonical id — mirrors label propagation's
    // fixpoint exactly)
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |pr AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |nodes AS (SELECT DISTINCT doc_a AS n FROM pr UNION SELECT doc_b FROM pr),
        |e AS (SELECT doc_a AS s, doc_b AS d FROM pr UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach AS (
        |  SELECT n AS node, n AS lbl FROM nodes
        |  UNION
        |  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node)
        |SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY node""".stripMargin,

    // same simhash pair CTE as dedup_clusters, then 3 unrolled PageRank
    // iterations in BIGINT nano-units; the only float ops are one IEEE
    // damped-update expression per iteration (double literals forced —
    // DuckDB parses bare 0.85/1.0 as DECIMAL, whose exact 0.15 diverges
    // from IEEE 1.0-0.85) rounded to an INTEGER, which both engines
    // same simhash pair graph as graph_pagerank; triangles enumerate
    // once each as ordered (a < b < c) edge triples — algorithm-
    // independent counts, so the naive SQL join checks the oriented
    // Spark plan exactly
    // same simhash pair graph, recursive (node, depth) closure bounded
    // at 3 hops, min depth per node — seeds at depth 0
    "graph_hops" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |prs AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |e AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM prs WHERE doc_a <> doc_b
        |  UNION SELECT doc_b, doc_a FROM prs WHERE doc_a <> doc_b),
        |sd AS (SELECT DISTINCT doc_id AS node FROM documents WHERE doc_id % 4 = 0),
        |reach AS (
        |  SELECT node, 0 AS d FROM sd
        |  UNION
        |  SELECT e.dst AS node, reach.d + 1 AS d
        |  FROM reach JOIN e ON e.src = reach.node WHERE reach.d < 3)
        |SELECT node, CAST(MIN(d) AS INT) AS hops
        |FROM reach GROUP BY node""".stripMargin,

    // same simhash pair-graph CTE, then 4 unrolled peel rounds
    // (degree ≥ 2 on the surviving edge set) — final within-core degrees
    "graph_kcore" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |d1 AS (SELECT n, COUNT(*) AS c FROM (
        |  SELECT doc_a AS n FROM e0 UNION ALL SELECT doc_b FROM e0) GROUP BY 1),
        |e1 AS MATERIALIZED (SELECT * FROM e0
        |  WHERE doc_a IN (SELECT n FROM d1 WHERE c >= 2)
        |    AND doc_b IN (SELECT n FROM d1 WHERE c >= 2)),
        |d2 AS (SELECT n, COUNT(*) AS c FROM (
        |  SELECT doc_a AS n FROM e1 UNION ALL SELECT doc_b FROM e1) GROUP BY 1),
        |e2 AS MATERIALIZED (SELECT * FROM e1
        |  WHERE doc_a IN (SELECT n FROM d2 WHERE c >= 2)
        |    AND doc_b IN (SELECT n FROM d2 WHERE c >= 2)),
        |d3 AS (SELECT n, COUNT(*) AS c FROM (
        |  SELECT doc_a AS n FROM e2 UNION ALL SELECT doc_b FROM e2) GROUP BY 1),
        |e3 AS MATERIALIZED (SELECT * FROM e2
        |  WHERE doc_a IN (SELECT n FROM d3 WHERE c >= 2)
        |    AND doc_b IN (SELECT n FROM d3 WHERE c >= 2)),
        |d4 AS (SELECT n, COUNT(*) AS c FROM (
        |  SELECT doc_a AS n FROM e3 UNION ALL SELECT doc_b FROM e3) GROUP BY 1),
        |e4 AS MATERIALIZED (SELECT * FROM e3
        |  WHERE doc_a IN (SELECT n FROM d4 WHERE c >= 2)
        |    AND doc_b IN (SELECT n FROM d4 WHERE c >= 2))
        |SELECT n AS doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |  SELECT doc_a AS n FROM e4 UNION ALL SELECT doc_b FROM e4)
        |GROUP BY 1""".stripMargin,

    // same simhash pair-graph CTE as graph_triangles, then 3 unrolled
    // clamped majority-vote rounds (n DESC, label ASC tie-break);
    // MATERIALIZED stops the round CTEs re-inlining the band join
    "graph_label_prop" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |prs AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |e AS MATERIALIZED (
        |  SELECT doc_a AS src, doc_b AS dst FROM prs WHERE doc_a <> doc_b
        |  UNION SELECT doc_b, doc_a FROM prs WHERE doc_a <> doc_b),
        |sd AS MATERIALIZED (
        |  SELECT doc_id AS node, MIN(lang) AS label FROM documents
        |  WHERE doc_id % 4 = 0 GROUP BY 1),
        |l0 AS (SELECT node, label FROM sd),
        |n1 AS (
        |  SELECT dst AS node, label FROM (
        |    SELECT e.dst, l.label, COUNT(*) AS n
        |    FROM l0 l JOIN e ON e.src = l.node GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n DESC, label) = 1),
        |l1 AS MATERIALIZED (
        |  SELECT node, label FROM sd
        |  UNION ALL SELECT node, label FROM n1 WHERE node NOT IN (SELECT node FROM sd)),
        |n2 AS (
        |  SELECT dst AS node, label FROM (
        |    SELECT e.dst, l.label, COUNT(*) AS n
        |    FROM l1 l JOIN e ON e.src = l.node GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n DESC, label) = 1),
        |l2 AS MATERIALIZED (
        |  SELECT node, label FROM sd
        |  UNION ALL SELECT node, label FROM n2 WHERE node NOT IN (SELECT node FROM sd)),
        |n3 AS (
        |  SELECT dst AS node, label FROM (
        |    SELECT e.dst, l.label, COUNT(*) AS n
        |    FROM l2 l JOIN e ON e.src = l.node GROUP BY 1, 2)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY dst ORDER BY n DESC, label) = 1)
        |SELECT node, label, TRUE AS is_seed FROM sd
        |UNION ALL
        |SELECT node, label, FALSE AS is_seed FROM n3
        |WHERE node NOT IN (SELECT node FROM sd)""".stripMargin,

    "graph_triangles" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |prs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |tri AS (
        |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        |  FROM prs e1
        |  JOIN prs e2 ON e2.doc_a = e1.doc_b
        |  JOIN prs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |deg AS (
        |  SELECT node, COUNT(*) AS degree FROM (
        |    SELECT doc_a AS node FROM prs
        |    UNION ALL SELECT doc_b FROM prs) GROUP BY node),
        |tpn AS (
        |  SELECT node, COUNT(*) AS n_triangles FROM (
        |    SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node)
        |SELECT deg.node AS doc_id, degree,
        |  CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
        |  CAST(ROUND(CASE WHEN degree < 2 THEN 0.0
        |    ELSE 2.0 * COALESCE(n_triangles, 0) /
        |         (CAST(degree AS DOUBLE) * (degree - 1)) END, 4) AS DOUBLE)
        |    AS clustering
        |FROM deg LEFT JOIN tpn USING (node)""".stripMargin,

    // round identically; per-destination sums are exact integer sums
    "graph_pagerank" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |prs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM prs
        |      UNION ALL SELECT doc_b, doc_a FROM prs),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        |nodes AS (SELECT src AS node FROM deg),
        |cnt AS (SELECT COUNT(*) AS n FROM nodes),
        |p0 AS (SELECT node,
        |    CAST(ROUND(CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)) AS BIGINT) AS pr_n
        |  FROM nodes),
        |i1 AS (
        |  SELECT nd.node, CAST(ROUND(
        |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0) AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM p0 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node),
        |i2 AS (
        |  SELECT nd.node, CAST(ROUND(
        |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0) AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM i1 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node),
        |i3 AS (
        |  SELECT nd.node, CAST(ROUND(
        |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0) AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM i2 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node)
        |SELECT node AS doc_id, pr_n AS pr_nano,
        |  CAST(pr_n AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS pr
        |FROM i3""".stripMargin,

    // same simhash+CC pipeline as dedup_clusters, then the keep rule:
    // a doc survives iff it is unpaired or its cluster's canonical id
    "dedup_keep" ->
      (simhashKeepCte +
        """
        |SELECT d.doc_id, d.lang
        |FROM documents d LEFT JOIN cl ON d.doc_id = cl.cdoc
        |WHERE cl.cdoc IS NULL OR cl.cluster_id = d.doc_id""".stripMargin),

    // same clusters; the survivor is the argmax-(n_chars, min id)
    // member per cluster instead of the min id
    "dedup_keep_best" ->
      (simhashKeepCte +
        """,
        |win AS (
        |  SELECT cdoc FROM (
        |    SELECT cl.cdoc,
        |      ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
        |        ORDER BY d.n_chars DESC, cl.cdoc ASC) AS rn
        |    FROM cl JOIN documents d ON d.doc_id = cl.cdoc)
        |  WHERE rn = 1)
        |SELECT d.doc_id, d.lang
        |FROM documents d
        |LEFT JOIN cl ON d.doc_id = cl.cdoc
        |LEFT JOIN win w ON w.cdoc = d.doc_id
        |WHERE cl.cdoc IS NULL OR w.cdoc IS NOT NULL""".stripMargin),

    // the dedup report card: per-language doc counts, kept counts
    // under the same keep-first rule, and the drop rate
    "dedup_report" ->
      (simhashKeepCte +
        """,
        |kept AS (
        |  SELECT d.doc_id, d.lang,
        |    CASE WHEN cl.cdoc IS NULL OR cl.cluster_id = d.doc_id
        |         THEN 1 ELSE 0 END AS keep
        |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.cdoc)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(keep) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_dropped,
        |  CAST(ROUND((COUNT(*) - SUM(keep)) / CAST(COUNT(*) AS DOUBLE), 4) + 0.0 AS DOUBLE) AS drop_rate_r
        |FROM kept GROUP BY lang""".stripMargin),

    "dedup_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, list_distinct([array_to_string(w[i:i+1],' ') for i in range(1, len(w))]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |p AS (
        |  SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc,
        |    len(list_intersect(a.g, b.g)) AS inter, len(a.g) AS na
        |  FROM bg a JOIN bg b ON a.lang = b.lang AND a.doc_id <> b.doc_id)
        |SELECT src_doc, dst_doc,
        |  CAST(ROUND(CAST(inter AS DOUBLE)/na, 4) AS DOUBLE) AS containment
        |FROM p WHERE CAST(inter AS DOUBLE)/na >= 0.8""".stripMargin,

    // mirrors ngramContainmentPairsPrefix(maxDf=12) VERBATIM: capped
    // rarest-first ranking (df asc, gram asc), prefix cutoff and
    // positional bound via the same ceil(round(·,9)) arithmetic, then
    // exact full-gram-set verification — the candidate set itself is
    // oracle-pinned, not just the surviving pairs
    "dedup_containment_capped" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, list_distinct([array_to_string(w[i:i+1],' ') for i in range(1, len(w))]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |post AS (SELECT doc_id, lang, len(g) AS n_g, unnest(g) AS gram FROM bg),
        |dfreq AS (SELECT lang, gram, COUNT(*) AS gdf FROM post GROUP BY 1, 2),
        |rk AS (
        |  SELECT p.doc_id, p.lang, p.n_g, p.gram,
        |    ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY d.gdf ASC, p.gram ASC) AS rnk
        |  FROM post p JOIN dfreq d ON p.lang = d.lang AND p.gram = d.gram
        |  WHERE d.gdf <= 12),
        |pref AS (
        |  SELECT * FROM rk
        |  WHERE rnk <= n_g - ceil(round(n_g * CAST(0.8 AS DOUBLE), 9)) + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, a.n_g AS na, b.doc_id AS db, b.n_g AS nb
        |  FROM pref a JOIN rk b ON a.lang = b.lang AND a.gram = b.gram
        |    AND (a.n_g < b.n_g OR (a.n_g = b.n_g AND a.doc_id < b.doc_id))
        |    AND least(a.n_g - a.rnk, b.n_g - b.rnk) + 1 >= ceil(round(a.n_g * CAST(0.8 AS DOUBLE), 9))),
        |iv AS (
        |  SELECT da, db, na, nb, len(list_intersect(ga.g, gb.g)) AS inter
        |  FROM cand JOIN bg ga ON da = ga.doc_id JOIN bg gb ON db = gb.doc_id),
        |dir AS (
        |  SELECT da AS src_doc, db AS dst_doc, CAST(inter AS DOUBLE) / na AS c FROM iv
        |  UNION ALL
        |  SELECT db, da, CAST(inter AS DOUBLE) / nb FROM iv)
        |SELECT src_doc, dst_doc, CAST(ROUND(c, 4) AS DOUBLE) AS containment
        |FROM dir WHERE c >= 0.8""".stripMargin,

    // mirrors ngramJaccardPairsPrefix(maxDf=12) verbatim — both join
    // sides are prefixes, size-ratio prune + PPJoin positional bound
    // with the shared ceil(round(·,9)) arithmetic, exact verification
    "dedup_ngram_capped" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, list_distinct([array_to_string(w[i:i+1],' ') for i in range(1, len(w))]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |post AS (SELECT doc_id, lang, len(g) AS n_g, unnest(g) AS gram FROM bg),
        |dfreq AS (SELECT lang, gram, COUNT(*) AS gdf FROM post GROUP BY 1, 2),
        |rk AS (
        |  SELECT p.doc_id, p.lang, p.n_g, p.gram,
        |    ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY d.gdf ASC, p.gram ASC) AS rnk
        |  FROM post p JOIN dfreq d ON p.lang = d.lang AND p.gram = d.gram
        |  WHERE d.gdf <= 12),
        |pref AS (
        |  SELECT * FROM rk
        |  WHERE rnk <= n_g - ceil(round(n_g * CAST(0.3 AS DOUBLE), 9)) + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM pref a JOIN pref b ON a.lang = b.lang AND a.gram = b.gram
        |    AND a.doc_id < b.doc_id
        |    AND CAST(least(a.n_g, b.n_g) AS DOUBLE) / greatest(a.n_g, b.n_g) >= 0.3
        |    AND least(a.n_g - a.rnk, b.n_g - b.rnk) + 1 >=
        |      ceil(round((a.n_g + b.n_g) * (CAST(0.3 AS DOUBLE) / 1.3), 9))),
        |p AS (
        |  SELECT da AS doc_a, db AS doc_b,
        |    len(list_intersect(ga.g, gb.g)) AS inter, len(ga.g) AS na, len(gb.g) AS nb
        |  FROM cand JOIN bg ga ON da = ga.doc_id JOIN bg gb ON db = gb.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS DOUBLE) AS jaccard
        |FROM p WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.3""".stripMargin,

    // dedup_minhash's banded-sketch arithmetic applied per CHUNK
    // (text_chunk's 32/16 sliding windows), rolled up to doc pairs —
    // chunk pair ordering (doc, idx) guarantees da < db after the
    // cross-doc filter
    "dedup_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |c AS (
        |  SELECT doc_id, w, 1 + CAST(CEIL(GREATEST(len(w) - 32, 0)/16.0) AS INT) AS nc
        |  FROM toks WHERE len(w) > 0),
        |ch AS (
        |  SELECT doc_id, CAST(i AS INT) AS ci, w[(i*16+1):(i*16+32)] AS cw
        |  FROM c, range(0, 4096) r(i) WHERE i < nc),
        |sh AS (
        |  SELECT doc_id, ci, list_distinct([array_to_string(cw[j:j+2], ' ') for j in range(1, len(cw)-1)]) AS shingles
        |  FROM ch WHERE len(cw) >= 3),
        |sig AS (
        |  SELECT doc_id, ci, [list_min([md5(CAST(p AS VARCHAR)||':'||s) for s in shingles]) for p in range(0,16)] AS sig FROM sh),
        |bands AS (
        |  SELECT doc_id, ci, sig, b, md5(sig[4*b+1]||sig[4*b+2]||sig[4*b+3]||sig[4*b+4]) AS bh
        |  FROM sig, range(0,4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, a.ci AS ca, b.doc_id AS db, b.ci AS cb,
        |    a.sig AS sig_a, b.sig AS sig_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh
        |    AND (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.ci < b.ci))),
        |p AS (
        |  SELECT da, db,
        |    ROUND(list_sum([CASE WHEN sig_a[i+1]=sig_b[i+1] THEN 1 ELSE 0 END for i in range(0,16)])/16.0, 4) AS est
        |  FROM cand
        |  WHERE da <> db
        |    AND list_sum([CASE WHEN sig_a[i+1]=sig_b[i+1] THEN 1 ELSE 0 END for i in range(0,16)]) >= 4)
        |SELECT da AS doc_a, db AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_chunk_pairs,
        |  CAST(MAX(est) AS DOUBLE) AS max_est
        |FROM p GROUP BY 1, 2""".stripMargin,

    // same sliding k-window + md5-60-bit posting construction; the
    // coverage filter reproduces the kept text byte-for-byte
    "dedup_substring" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |wins AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    ('0x'||substr(md5(array_to_string(w[i:i+4], ' ')),1,15))::BIGINT AS gh
        |  FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
        |  WHERE len(w) >= 5),
        |dup AS (SELECT gh FROM wins GROUP BY gh HAVING COUNT(*) >= 2),
        |ds AS (SELECT doc_id, pos FROM wins JOIN dup USING (gh)),
        |sl AS (SELECT doc_id, list_sort(list(pos)) AS starts FROM ds GROUP BY doc_id),
        |kept AS (
        |  SELECT t.doc_id, len(w) AS n_tokens,
        |    CASE WHEN starts IS NULL THEN w
        |         ELSE [w[p+1] for p in range(0, len(w))
        |               if len(list_filter(starts, s -> s <= p AND p < s + 5)) = 0]
        |    END AS kw
        |  FROM toks t LEFT JOIN sl USING (doc_id))
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(n_tokens - len(kw) AS INT) AS n_removed,
        |  COALESCE(array_to_string(kw, ' '), '') AS kept_text
        |FROM kept""".stripMargin,

    "dedup_embed_delta" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
        |    ('0x' || substr(md5('edelta:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 5 = 0 AS fresh
        |  FROM embeddings),
        |bk AS (
        |  SELECT vec_id, fresh,
        |    list_sum([CASE WHEN list_sum([x[d+1] * ((CAST((1103515245::BIGINT * (p * 1024 + d) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) * 2.0 - 1.0) for d in range(0,64)]) >= 0.0
        |              THEN CAST(2**p AS BIGINT) ELSE 0 END for p in range(0,32)]) AS bkt
        |  FROM v),
        |bands AS (
        |  SELECT vec_id, fresh, b, (bkt >> (8*b)) & 255 AS bv FROM bk, range(0,4) t(b)),
        |cand AS (
        |  SELECT DISTINCT f.vec_id AS id_fresh, c.vec_id AS id_corpus
        |  FROM bands f JOIN bands c ON f.b = c.b AND f.bv = c.bv
        |  WHERE f.fresh AND NOT c.fresh),
        |p AS (
        |  SELECT id_fresh, id_corpus,
        |    list_sum([vf.x[i+1]*vc.x[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([xx*xx for xx in vf.x])) * sqrt(list_sum([yy*yy for yy in vc.x]))) AS cos
        |  FROM cand JOIN v vf ON id_fresh = vf.vec_id JOIN v vc ON id_corpus = vc.vec_id)
        |SELECT id_fresh, id_corpus, CAST(ROUND(cos, 4) AS DOUBLE) AS cos_sim
        |FROM p WHERE cos >= 0.3""".stripMargin,

    "text_dup_ngrams" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |idx AS (SELECT doc_id, t,
        |  UNNEST(generate_series(1, len(t) - 4)) AS i
        |  FROM toks WHERE len(t) >= 5),
        |ng AS (SELECT DISTINCT doc_id,
        |  md5(array_to_string(t[i:i+4], ' ')) AS g FROM idx),
        |cnt AS (SELECT g, COUNT(*) AS nd FROM ng GROUP BY g)
        |SELECT ng.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |  CAST(ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS DOUBLE) AS dup_frac
        |FROM ng JOIN cnt USING (g) GROUP BY ng.doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |tt AS (SELECT doc_id, w FROM t WHERE len(w) > 0),
        |base AS (
        |  SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    CAST(ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS DOUBLE) AS dup_word_frac
        |  FROM tt),
        |bgc AS (
        |  SELECT doc_id, g, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
        |    FROM tt) GROUP BY doc_id, g),
        |bga AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n,
        |  CAST(SUM(c) AS BIGINT) AS n_bigrams FROM bgc GROUP BY doc_id),
        |runs AS (
        |  SELECT doc_id, CAST(MAX(run) AS BIGINT) AS max_run FROM (
        |    SELECT doc_id, tok, isl, COUNT(*) AS run FROM (
        |      SELECT doc_id, i AS pos, w[i] AS tok,
        |        i - ROW_NUMBER() OVER (PARTITION BY doc_id, w[i] ORDER BY i) AS isl
        |      FROM tt, range(1, 4097) r(i) WHERE i <= len(w))
        |    GROUP BY doc_id, tok, isl)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens, b.dup_word_frac,
        |  COALESCE(g.top_bigram_n, 0) AS top_bigram_n,
        |  COALESCE(g.n_bigrams, 0) AS n_bigrams,
        |  CASE WHEN COALESCE(g.n_bigrams, 0) > 0
        |       THEN CAST(ROUND(CAST(g.top_bigram_n AS DOUBLE) / g.n_bigrams, 4) AS DOUBLE)
        |  END AS top_bigram_frac,
        |  r.max_run
        |FROM base b LEFT JOIN bga g USING (doc_id) JOIN runs r USING (doc_id)""".stripMargin,

    // unrolled 2-iteration Lloyd's (spherical k-means, k=8): seeds are the
    // 8 lowest-id candidates; assignment argmax on round(cos,6) with cid
    // tie-break; update is the per-dim round(·,9)-then-DECIMAL(38,9)-sum
    // mean — exact arithmetic, so it matches Spark's two-phase aggregate
    // bit-for-bit regardless of either engine's summation order
    // bounded-range lateral (same pattern as text_chunk's oracle) —
    // this DuckDB build lacks WITH ORDINALITY
    // same decimal-exact means, same dim-ordered sequential cosine fold
    "embed_drift" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
        |d AS (
        |  SELECT label, CAST(vec_id % 2 AS INT) AS h, CAST(i AS INT) AS dim,
        |    CAST(ROUND(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE), 9)
        |      AS DECIMAL(38,9)) AS vd
        |  FROM e, range(0, 4096) r(i) WHERE i < len(embedding)),
        |m AS (
        |  SELECT label, h, dim, COUNT(*) AS n, CAST(SUM(vd) AS DOUBLE) AS s
        |  FROM d GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT label, h, list(s / n ORDER BY dim) AS cx,
        |    CAST(MAX(n) AS BIGINT) AS n
        |  FROM m GROUP BY 1, 2),
        |j AS (
        |  SELECT a.label, a.n AS n_a, b.n AS n_b, a.cx AS ca, b.cx AS cb
        |  FROM c a JOIN c b ON a.label = b.label AND a.h = 0 AND b.h = 1)
        |SELECT label, n_a, n_b,
        |  CAST(ROUND(
        |    list_sum([ca[i+1] * cb[i+1] for i in range(0, len(ca))]) /
        |    (sqrt(list_sum([x*x for x in ca])) * sqrt(list_sum([y*y for y in cb]))),
        |  6) AS DOUBLE) AS drift_cos
        |FROM j""".stripMargin,

    // same round(·,9)→DECIMAL(38,9) product sums; nested list_transform
    // (not range×range) keeps the oracle's expansion per-row too
    "embed_gram" ->
      """WITH pr AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(embedding)+1), i ->
        |    list_transform(range(i, len(embedding)+1), j ->
        |      {'i': i-1, 'j': j-1,
        |       'p': CAST(ROUND(CAST(embedding[i] AS DOUBLE) *
        |              CAST(embedding[j] AS DOUBLE), 9) AS DECIMAL(38,9))})))) AS c
        |  FROM embeddings WHERE embedding IS NOT NULL)
        |SELECT CAST(c.i AS INT) AS i, CAST(c.j AS INT) AS j,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(ROUND(CAST(SUM(c.p) AS DOUBLE), 6) AS DOUBLE) AS g
        |FROM pr GROUP BY 1, 2""".stripMargin,

    "embed_centroid" ->
      """SELECT label, CAST(i AS INT) AS dim,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(ROUND(AVG(CAST(embedding[i + 1] AS DOUBLE)), 4) + 0.0 AS DOUBLE) AS c
        |FROM embeddings, range(0, 4096) r(i)
        |WHERE embedding IS NOT NULL AND i < len(embedding)
        |GROUP BY 1, 2""".stripMargin,

    "ann_ivf" -> annIvfOracle,

    // candidate set = the shared minhash oracle body filtered to
    // in-language pairs; truth = exact 3-gram Jaccard >= 0.5 (the
    // dedup_ngram formulation at shingle granularity)
    "dedup_eval" ->
      s"""WITH lg AS (SELECT doc_id, lang FROM documents),
        |mh AS (SELECT doc_a, doc_b FROM ($minhashPairsOracle)),
        |c AS (SELECT mh.doc_a, mh.doc_b FROM mh
        |  JOIN lg la ON la.doc_id = mh.doc_a
        |  JOIN lg lb ON lb.doc_id = mh.doc_b WHERE la.lang = lb.lang),
        |t3 AS (SELECT doc_id, lang, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |tg AS (SELECT doc_id, lang, list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM t3 WHERE len(w) >= 3),
        |tr AS (
        |  SELECT doc_a, doc_b FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |      len(list_intersect(a.g, b.g)) AS inter, len(a.g) AS na, len(b.g) AS nb
        |    FROM tg a JOIN tg b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |  WHERE CAST(inter AS DOUBLE)/(na+nb-inter) >= 0.5),
        |h AS (SELECT doc_a, doc_b FROM c INTERSECT SELECT doc_a, doc_b FROM tr),
        |m AS (SELECT (SELECT COUNT(*) FROM c) AS n_candidates,
        |  (SELECT COUNT(*) FROM tr) AS n_truth, (SELECT COUNT(*) FROM h) AS n_hit)
        |SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
        |  CAST(n_truth AS BIGINT) AS n_truth, CAST(n_hit AS BIGINT) AS n_hit,
        |  CAST(CASE WHEN n_candidates > 0 THEN ROUND(n_hit / CAST(n_candidates AS DOUBLE), 4) + 0.0 END AS DOUBLE) AS precision_r,
        |  CAST(CASE WHEN n_truth > 0 THEN ROUND(n_hit / CAST(n_truth AS DOUBLE), 4) + 0.0 END AS DOUBLE) AS recall_r
        |FROM m""".stripMargin,

    // minhash candidates (shared oracle body) + per-pair exact
    // shingle-Jaccard via list_intersect
    "dedup_verify" ->
      s"""WITH mh AS (SELECT * FROM ($minhashPairsOracle)),
        |t AS (SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]) AS g
        |  FROM t WHERE len(w) >= 3),
        |j AS (
        |  SELECT mh.doc_a, mh.doc_b, mh.est_jaccard,
        |    len(list_intersect(a.g, b.g)) AS inter,
        |    len(a.g) AS na, len(b.g) AS nb
        |  FROM mh JOIN sh a ON a.doc_id = mh.doc_a
        |  JOIN sh b ON b.doc_id = mh.doc_b)
        |SELECT doc_a, doc_b, est_jaccard,
        |  CAST(ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) + 0.0 AS DOUBLE) AS exact_jaccard,
        |  ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= CAST(0.5 AS DOUBLE) AS confirmed
        |FROM j""".stripMargin,

    // recall@5 per query: the shared ann_ivf oracle body intersected
    // with the exact brute-force top-5
    "ann_recall_eval" ->
      s"""WITH ivf AS (SELECT query_id, neighbor_id FROM ($annIvfOracle)),
        |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |qq AS (SELECT vec_id AS query_id, x AS qx FROM v WHERE vec_id < 10),
        |cc AS (SELECT vec_id AS neighbor_id, x AS nx FROM v WHERE vec_id >= 10),
        |bf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, ${sqlCos("qx", "nx")} AS cos FROM qq, cc)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id) <= 5),
        |h AS (SELECT query_id, COUNT(*) AS nh FROM (
        |  SELECT query_id, neighbor_id FROM ivf
        |  INTERSECT SELECT query_id, neighbor_id FROM bf) GROUP BY 1)
        |SELECT q2.query_id, CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_hit,
        |  CAST(ROUND(COALESCE(h.nh, 0) / CAST(5.0 AS DOUBLE), 4) + 0.0 AS DOUBLE) AS recall_r
        |FROM (SELECT query_id FROM qq) q2 LEFT JOIN h USING (query_id)""".stripMargin,

    // brute-force cosine with the cross-label filter, then per-query
    // top-10 on the shared round/tiebreak contract
    "ann_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS ql, x AS qx FROM v WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, label AS nl, x AS nx FROM v WHERE vec_id >= 10),
        |p AS (
        |  SELECT query_id, neighbor_id, nl AS neg_label,
        |    list_sum([qx[i+1]*nx[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([p2*p2 for p2 in qx])) * sqrt(list_sum([q2*q2 for q2 in nx]))) AS cos
        |  FROM q, c WHERE nl <> ql)
        |SELECT query_id, neighbor_id, neg_label, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 10""".stripMargin,

    // unrolled greedy MMR: exact shortlist (top-20), then 5 selection
    // CTEs each maximizing round(λ·cos6 − (1−λ)·maxsim, 6); float
    // literals forced to DOUBLE so (1.0 − 0.7) is the same IEEE value
    // Spark's lit(1.0 - lambda) bakes in
    "ann_mmr" -> annMmrOracle,

    // 2-round Lloyd over ALL vectors (ann_ivf's exact arithmetic with
    // the candidate filter removed) + final nearest-centroid assignment
    "embed_kmeans" ->
      s"""WITH $kmeansAllCte
        |SELECT vec_id, cid, CAST(ROUND(cc, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM kasgf""".stripMargin,

    // same kmeans CTE, then the SemDeDup drop rule: any in-cell pair
    // (a < b) with round(cos, 6) ≥ 0.3 marks b dropped
    "embed_semdedup" ->
      s"""WITH $kmeansAllCte,
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM kasgf a JOIN kasgf b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE ROUND(list_sum([a.x[i+1]*b.x[i+1] for i in range(0,64)]) /
        |    (sqrt(list_sum([p2*p2 for p2 in a.x])) * sqrt(list_sum([q2*q2 for q2 in b.x]))), 6)
        |    >= CAST(0.3 AS DOUBLE))
        |SELECT k.vec_id, k.cid, (d.vec_id IS NULL) AS keep
        |FROM kasgf k LEFT JOIN dropped d ON k.vec_id = d.vec_id""".stripMargin,

    // exact-decimal per-label centroid means, cosine of each member to
    // its own centroid, lowest-5% tail per label (at least one)
    "embed_outliers" ->
      """WITH v AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |cent AS (
        |  SELECT label,
        |    [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,64)] AS cx,
        |    len(vs) AS n_label
        |  FROM (SELECT label, list(x) AS vs FROM v GROUP BY label)),
        |sc AS (
        |  SELECT a.label, a.vec_id, c.n_label,
        |    list_sum([a.x[i+1]*c.cx[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([p2*p2 for p2 in a.x])) * sqrt(list_sum([q2*q2 for q2 in c.cx]))) AS cc
        |  FROM v a JOIN cent c USING (label)),
        |rk AS (
        |  SELECT label, vec_id, cc, n_label,
        |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY ROUND(cc, 6) ASC, vec_id) AS rank
        |  FROM sc)
        |SELECT label, vec_id, CAST(ROUND(cc, 4) + 0.0 AS DOUBLE) AS cos_r,
        |  CAST(rank AS INT) AS rank
        |FROM rk
        |WHERE rank <= GREATEST(1, CAST(FLOOR(n_label * CAST(0.05 AS DOUBLE)) AS BIGINT))""".stripMargin,

    // same simhash band-pair CTE as dedup_clusters, then common-
    // neighbor counting via the wedge join and the Jaccard ratio over
    // degrees — pairs sharing ≥2 neighbors, adjacent or not
    "graph_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |hs AS (
        |  SELECT doc_id, [('0x'||substr(md5(t),1,15))::UBIGINT for t in w] AS h
        |  FROM toks WHERE len(w) > 0),
        |sig AS (
        |  SELECT doc_id,
        |    list_sum([CASE WHEN list_sum([CASE WHEN ((hh >> j) & 1) = 1 THEN 1 ELSE -1 END for hh in h]) >= 0
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS simhash
        |  FROM hs),
        |bands AS (
        |  SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |prs AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6),
        |und AS (SELECT doc_a AS u, doc_b AS v FROM prs WHERE doc_a <> doc_b),
        |adj AS (SELECT u AS node, v AS w FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT node, COUNT(*) AS degree FROM adj GROUP BY node),
        |cn AS (
        |  SELECT a.node AS node_a, b.node AS node_b, COUNT(*) AS common
        |  FROM adj a JOIN adj b ON a.w = b.w AND a.node < b.node
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 1)
        |SELECT node_a, node_b, CAST(common AS BIGINT) AS common,
        |  CAST(ROUND(CAST(common AS DOUBLE) / (da.degree + db.degree - common), 4) + 0.0 AS DOUBLE) AS jac_r
        |FROM cn JOIN deg da ON da.node = cn.node_a
        |JOIN deg db ON db.node = cn.node_b""".stripMargin,

    // multi-probe: each query searches its own bucket plus the 4
    "ann_pq" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |c AS (SELECT vec_id, x FROM v WHERE vec_id >= 10),
        |q AS (SELECT vec_id, x FROM v WHERE vec_id < 10),
        |sub AS (SELECT vec_id, s, x[s*4+1 : s*4+4] AS xs
        |  FROM c, range(0,16) t(s)),
        |init AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, x
        |  FROM c QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16),
        |cent0 AS (SELECT cid, s, x[s*4+1 : s*4+4] AS cs
        |  FROM init, range(0,16) t(s)),
        |asg1 AS (
        |  SELECT vec_id, s, xs, cid FROM (
        |    SELECT u.vec_id, u.s, u.xs, c0.cid,
        |      list_sum([c0.cs[i+1]*c0.cs[i+1] for i in range(0,4)])
        |        - 2 * list_sum([u.xs[i+1]*c0.cs[i+1] for i in range(0,4)]) AS d2
        |    FROM sub u JOIN cent0 c0 ON u.s = c0.s)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |    ORDER BY ROUND(d2, 9) ASC, cid) = 1),
        |cent1 AS (
        |  SELECT s, cid,
        |    [CAST(list_sum([CAST(ROUND(v2[d+1], 9) AS DECIMAL(38,9)) for v2 in vs]) AS DOUBLE) / len(vs) for d in range(0,4)] AS cs
        |  FROM (SELECT s, cid, list(xs) AS vs FROM asg1 GROUP BY s, cid)),
        |codes AS (
        |  SELECT vec_id, s, cid FROM (
        |    SELECT u.vec_id, u.s, c1.cid,
        |      list_sum([c1.cs[i+1]*c1.cs[i+1] for i in range(0,4)])
        |        - 2 * list_sum([u.xs[i+1]*c1.cs[i+1] for i in range(0,4)]) AS d2
        |    FROM sub u JOIN cent1 c1 ON u.s = c1.s)
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |    ORDER BY ROUND(d2, 9) ASC, cid) = 1),
        |qsub AS (
        |  SELECT vec_id AS query_id, sqrt(list_sum([p*p for p in x])) AS qn,
        |    s, x[s*4+1 : s*4+4] AS qs
        |  FROM q, range(0,16) t(s)),
        |pd AS (
        |  SELECT query_id, qn, c1.s, c1.cid,
        |    list_sum([qs[i+1]*c1.cs[i+1] for i in range(0,4)]) AS pdot,
        |    list_sum([c1.cs[i+1]*c1.cs[i+1] for i in range(0,4)]) AS c2
        |  FROM qsub JOIN cent1 c1 ON qsub.s = c1.s),
        |pairs AS (
        |  SELECT query_id, vec_id AS neighbor_id, ANY_VALUE(qn) AS qn,
        |    SUM(CAST(ROUND(pdot, 9) AS DECIMAL(38,9))) AS dq,
        |    SUM(CAST(ROUND(c2, 9) AS DECIMAL(38,9))) AS x2
        |  FROM codes JOIN pd USING (s, cid) GROUP BY query_id, vec_id),
        |r AS (SELECT query_id, neighbor_id,
        |  CAST(dq AS DOUBLE) / (qn * sqrt(CAST(x2 AS DOUBLE))) AS cos FROM pairs)
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM r
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin,

    // IVF-PQ: coarse Lloyd-1 cells (seeds = 4 lowest-id candidates),
    // shared PQ codebooks trained on residuals (Lloyd-1, L2 identity),
    // ADC over reconstructions x̂_s = cx_s + ĉ_s — every arithmetic
    // step mirrors Ann.ivfpqTopK's rounding/tiebreak contract
    "ann_ivfpq" -> (ivfpqOracleCte +
      """
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM r3
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin),

    // the stored-index probe returns exactly ann_ivfpq's matches —
    // one oracle string pins both machineries to one semantics
    "ann_index_probe" -> (ivfpqOracleCte +
      """
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM r3
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin),

    // train on the base rows only, encode base ∪ delta against that
    // frozen model — the oracle of the engine's additive append path
    "ann_index_upsert" -> (ivfpqCte(
      "vec_id >= 10 AND vec_id % 3 <> 0", "vec_id >= 10") +
      """
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM r3
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin),

    // compaction never changes WHAT the index answers — identical
    // oracle to ann_index_upsert (build + append, then layout-only fold)
    "ann_index_compact" -> (ivfpqCte(
      "vec_id >= 10 AND vec_id % 3 <> 0", "vec_id >= 10") +
      """
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM r3
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin),

    // retrieve-then-refine: the SAME IVF-PQ CTE produces a top-20
    // shortlist per query (ADC rank), the shortlist re-attaches full
    // vectors for an exact-cosine rerank to the final top-5
    "ann_refine" -> (ivfpqOracleCte +
      """,
        |short AS (
        |  SELECT query_id, neighbor_id FROM r3
        |  WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |  QUALIFY ROW_NUMBER() OVER w <= 20),
        |ex AS (
        |  SELECT s2.query_id, s2.neighbor_id,
        |    list_sum([qv.x[i+1]*cv.x[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([p2*p2 for p2 in qv.x])) * sqrt(list_sum([q2*q2 for q2 in cv.x]))) AS cos
        |  FROM short s2
        |  JOIN v qv ON qv.vec_id = s2.query_id
        |  JOIN v cv ON cv.vec_id = s2.neighbor_id)
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM ex
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin),

    // buckets one bit-flip away on planes 0..3 — mirrors
    // Ann.lshTopK(probes = 4)
    "ann_lsh" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |bk AS (
        |  SELECT vec_id, x,
        |    list_sum([CASE WHEN list_sum([x[d+1] * ((CAST((1103515245::BIGINT * (p * 1024 + d) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) * 2.0 - 1.0) for d in range(0,64)]) >= 0.0
        |              THEN CAST(2**p AS BIGINT) ELSE 0 END for p in range(0,16)]) AS bkt
        |  FROM v),
        |bkq AS (
        |  SELECT vec_id, x,
        |    unnest([bkt] || [xor(bkt, CAST(2**p AS BIGINT)) for p in range(0,4)]) AS probe
        |  FROM bk WHERE vec_id < 10),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum([q.x[i+1]*c.x[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([xx*xx for xx in q.x])) * sqrt(list_sum([yy*yy for yy in c.x]))) AS cos
        |  FROM bkq q JOIN bk c ON q.probe = c.bkt AND c.vec_id >= 10)
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin,

    "ann_knn_graph" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |bk AS (
        |  SELECT vec_id, x,
        |    list_sum([CASE WHEN list_sum([x[d+1] * ((CAST((1103515245::BIGINT * (p * 1024 + d) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) * 2.0 - 1.0) for d in range(0,64)]) >= 0.0
        |              THEN CAST(2**p AS BIGINT) ELSE 0 END for p in range(0,16)]) AS bkt
        |  FROM v),
        |bkq AS (
        |  SELECT vec_id, x,
        |    unnest([bkt] || [xor(bkt, CAST(2**p AS BIGINT)) for p in range(0,3)]) AS probe
        |  FROM bk),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum([q.x[i+1]*c.x[i+1] for i in range(0,64)]) /
        |      (sqrt(list_sum([xx*xx for xx in q.x])) * sqrt(list_sum([yy*yy for yy in c.x]))) AS cos
        |  FROM bkq q JOIN bk c ON q.probe = c.bkt AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin,

    "ann_topk" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
        |    sqrt(list_sum([xx*xx for xx in CAST(embedding AS DOUBLE[])])) AS n
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum([q.x[i+1]*c.x[i+1] for i in range(0,64)])/(q.n*c.n) AS cos
        |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10)
        |SELECT query_id, neighbor_id,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 10""".stripMargin,

    "ann_sq" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |st AS (
        |  SELECT t.i AS d, min(x[t.i]) AS mn, max(x[t.i]) AS mx
        |  FROM v, range(1, 65) t(i) WHERE vec_id >= 10 GROUP BY 1),
        |pr AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
        |       FROM st),
        |c AS (
        |  SELECT vec_id,
        |    [mns[i] + round(CASE WHEN mxs[i] = mns[i] THEN 0.0
        |       ELSE (x[i] - mns[i]) / (mxs[i] - mns[i]) * 255.0 END)
        |       * (mxs[i] - mns[i]) / 255.0
        |     for i in range(1, 65)] AS dq
        |  FROM v, pr WHERE vec_id >= 10),
        |n AS (SELECT vec_id, dq,
        |        sqrt(list_sum([y*y for y in dq])) AS nn FROM c),
        |q AS (SELECT vec_id, x,
        |        sqrt(list_sum([y*y for y in x])) AS nq FROM v
        |      WHERE vec_id < 10),
        |p AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    list_sum([q.x[i+1]*n.dq[i+1] for i in range(0,64)])/(q.nq*n.nn)
        |      AS cos
        |  FROM q, n)
        |SELECT query_id, neighbor_id,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin,

    // pre-filter semantics: the label is the equi-join key; rank runs
    // within each query's label partition only
    "ann_filtered" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x, label,
        |    sqrt(list_sum([xx*xx for xx in CAST(embedding AS DOUBLE[])])) AS n
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    q.label AS fv,
        |    list_sum([q.x[i+1]*c.x[i+1] for i in range(0,64)])/(q.n*c.n) AS cos
        |  FROM v q JOIN v c ON q.label = c.label
        |  WHERE q.vec_id < 10 AND c.vec_id >= 10)
        |SELECT query_id, neighbor_id, fv,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p
        |WINDOW w AS (PARTITION BY query_id ORDER BY ROUND(cos, 6) DESC, neighbor_id)
        |QUALIFY ROW_NUMBER() OVER w <= 5""".stripMargin,

    "ann_range" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
        |    sqrt(list_sum([xx*xx for xx in CAST(embedding AS DOUBLE[])])) AS n
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_sum([q.x[i+1]*c.x[i+1] for i in range(0,64)])/(q.n*c.n) AS cos
        |  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id >= 10)
        |SELECT query_id, neighbor_id,
        |  CAST(ROUND(cos, 4) + 0.0 AS DOUBLE) AS cos_r
        |FROM p WHERE ROUND(cos, 6) >= 0.2""".stripMargin,

    // the text_langid pipeline reduced to the (label, prediction) grid
    "text_langid_confusion" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    list_filter(string_split(lower(text),' '), x -> x<>'') AS w
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, lang, ${TextAnalysis.Stopwords.map(l => duckHits(l._1)).mkString(",\n    ")}
         |  FROM t)
         |SELECT lang, $predLangSql AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         |FROM h GROUP BY 1, 2""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
         |h AS (
         |  SELECT doc_id, ${TextAnalysis.Stopwords.map(l => duckHits(l._1)).mkString(",\n    ")}
         |  FROM t)
         |SELECT doc_id, $predLangSql AS pred_lang,
         |  hits_en, hits_es, hits_fr, hits_de, hits_zh
         |FROM h""".stripMargin,

    // same vowel-run/terminal-punct proxies, same IEEE-double formula
    "text_readability" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(text),' '), x -> x<>'') AS w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
        |      AS n_sentences,
        |    CAST(list_sum(list_transform(w,
        |      x -> GREATEST(len(regexp_extract_all(x, '[aeiouy]+')), 1)))
        |      AS BIGINT) AS n_syllables
        |  FROM t WHERE len(w) > 0)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(ROUND(CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences)
        |    - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words),
        |  4) AS DOUBLE) AS flesch
        |FROM m""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(w) AS INT) AS n_tokens,
         |    CAST(length(text) AS INT) AS n_chars,
         |    CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) AS wlen_sum,
         |    CAST(length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
         |    CAST(len(list_filter(w, t2 -> list_contains([${inList("en")}], t2))) AS DOUBLE) AS hits_en
         |  FROM t),
         |r AS (
         |  SELECT doc_id, n_tokens, n_chars,
         |    wlen_sum / n_tokens AS awl,
         |    punct / n_chars AS pr,
         |    hits_en / n_tokens AS sr
         |  FROM m)
         |SELECT doc_id, n_tokens, n_chars,
         |  CAST(ROUND(awl, 4) AS DOUBLE) AS avg_wlen,
         |  CAST(ROUND(pr, 4) AS DOUBLE) AS punct_ratio,
         |  CAST(ROUND(sr, 4) AS DOUBLE) AS stop_ratio,
         |  CAST(ROUND(LEAST(1.0, n_tokens/50.0)*0.5 + (1.0-pr)*0.3 + LEAST(1.0, sr*5.0)*0.2, 4) AS DOUBLE) AS score,
         |  CASE WHEN ROUND(LEAST(1.0, n_tokens/50.0)*0.5 + (1.0-pr)*0.3 + LEAST(1.0, sr*5.0)*0.2, 4) >= 0.7 THEN 'high'
         |       WHEN ROUND(LEAST(1.0, n_tokens/50.0)*0.5 + (1.0-pr)*0.3 + LEAST(1.0, sr*5.0)*0.2, 4) >= 0.4 THEN 'mid'
         |       ELSE 'low' END AS quality_bucket
         |FROM r""".stripMargin,

    // Gopher rules: whitespace-token + line metrics, ROUND(·,4) before
    // every threshold compare so verdicts cannot flip on last-ulp
    // engine differences; NULLIF guards mirror the Spark side
    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS w,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS INT) AS n_words,
        |    CAST(ROUND(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
        |      / NULLIF(len(w), 0), 4) AS DOUBLE) AS mean_wlen,
        |    CAST(ROUND((
        |        (length(text) - length(replace(text, '#', '')))
        |        + (length(text) - length(replace(text, '...', ''))) / 3
        |      ) / CAST(NULLIF(len(w), 0) AS DOUBLE), 4) AS DOUBLE) AS symbol_ratio,
        |    CAST(ROUND(CAST(len(list_filter(lines,
        |        l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%'
        |          OR ltrim(l) LIKE '•%')) AS DOUBLE)
        |      / NULLIF(len(lines), 0), 4) AS DOUBLE) AS bullet_frac,
        |    CAST(ROUND(CAST(len(list_filter(lines,
        |        l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…')) AS DOUBLE)
        |      / NULLIF(len(lines), 0), 4) AS DOUBLE) AS ellipsis_frac,
        |    CAST(ROUND(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
        |      / NULLIF(len(w), 0), 4) AS DOUBLE) AS alpha_frac,
        |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |      s -> list_contains(w, s))) AS INT) AS stop_hits
        |  FROM t)
        |SELECT doc_id, n_words, mean_wlen, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
        |   AND symbol_ratio < 0.1
        |   AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
        |   AND alpha_frac >= 0.8 AND stop_hits >= 2) AS pass
        |FROM m""".stripMargin,

    // ln ROUNDed to 6 × exact char count, DECIMAL(38,6) sums — the
    // lm_score cross-engine float discipline
    "text_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest([substr(text, i, 1) for i in range(1, length(text)+1)]) AS ch
        |  FROM documents),
        |cc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct_chars,
        |    SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE)), 6) AS DECIMAL(38,6))) AS s
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
        |  CAST(ROUND(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / n, 4) AS DOUBLE) AS entropy
        |FROM agg""".stripMargin,

    // same LCG weight table ((b*69069+362437)%2001-1000), same byte
    // normalization, exact integer milli-sum — engine-independent
    "text_classify" ->
      """WITH n AS (
        |  SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(GREATEST(len(t)-2, 0) AS BIGINT) AS n_grams,
        |    CAST(COALESCE(list_sum([
        |      (CAST((ascii(substr(t,i,1))*961 + ascii(substr(t,i+1,1))*31
        |             + ascii(substr(t,i+2,1))) % 512 AS BIGINT)
        |        * 69069 + 362437) % 2001 - 1000
        |      for i in range(1, len(t)-1)]), 0) AS BIGINT) AS score_milli
        |  FROM n)
        |SELECT doc_id, score_milli, n_grams,
        |  CASE WHEN score_milli >= 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM s""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(lower(text),' '), x -> x<>'')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS subwords,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(ROUND(CAST(length(text) AS DOUBLE) / len(list_filter(string_split(lower(text),' '), x -> x<>'')), 4) AS DOUBLE) AS chars_per_token
        |FROM documents""".stripMargin,

    "text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS cleaned,
        |  CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INT) AS n_clean_chars,
        |  CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x <> '')) AS INT) AS n_clean_tokens
        |FROM documents""".stripMargin,

    "text_stopword_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents)
         |SELECT doc_id,
         |  array_to_string(list_filter(w, t2 -> NOT list_contains([${inList("en")}], t2)), ' ') AS kept,
         |  CAST(len(w) - len(list_filter(w, t2 -> NOT list_contains([${inList("en")}], t2))) AS INT) AS n_removed
         |FROM t""".stripMargin,

    "text_pii_mask" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS masked,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS INT) AS n_longnums
        |FROM documents""".stripMargin,

    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x<>'') AS w FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct([md5(array_to_string(w[i:i+3], ' ')) for i in range(1, len(w)-2)])) AS hs
        |  FROM t WHERE len(w) >= 4)
        |SELECT doc_id, array_to_string(hs[1:4], '') AS fp FROM f""".stripMargin,

    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS id, text,
        |    CAST(CEIL(length(text) / 256.0) AS INT) AS n_frames
        |  FROM documents)
        |SELECT id, CAST(i AS INT) AS frame_idx,
        |  CAST(octet_length(encode(substr(text, i*256 + 1, 256))) AS INT) AS frame_bytes,
        |  md5(substr(text, i*256 + 1, 256)) AS frame_md5
        |FROM m, range(0, 1000) t(i) WHERE i < n_frames""".stripMargin,

    // the payload is a REAL binary P6 since r12 (gray pixels = the
    // utf-8 text BYTES, r=g=b, h = largest divisor in {4,3,2,1} of
    // the BYTE length): the oracle rebuilds the container in HEX
    // space over the encoded blob's bytes (r12 advice — a character
    // reconstruction silently diverges on non-ASCII text, and this
    // DuckDB cannot md5 a BLOB, so both sides hash the payload's hex
    // encoding), pinning byte_len/header/md5 to the ENCODER byte-
    // for-byte for ANY text
    "mm_features" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS L
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, hx, L,
        |    CASE WHEN L = 0 THEN 1
        |         WHEN L % 4 = 0 THEN 4
        |         WHEN L % 3 = 0 THEN 3
        |         WHEN L % 2 = 0 THEN 2 ELSE 1 END AS h
        |  FROM m),
        |c AS (
        |  SELECT doc_id, L, h, L // h AS w,
        |    hex(encode('P6' || chr(10) || CAST(L // h AS VARCHAR) || ' ' ||
        |      CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))) ||
        |      COALESCE(array_to_string(
        |        [repeat(substr(hx, 2*i - 1, 2), 3) for i in range(1, L + 1)],
        |        ''), '') AS phex
        |  FROM d)
        |SELECT doc_id AS id, 'image' AS modality,
        |  CAST(length(phex) // 2 AS INT) AS byte_len,
        |  substr(phex, 1, 16) AS header_hex,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  md5(phex) AS content_md5
        |FROM c""".stripMargin,

    // container length + PARSED dims recomputed from the encoder's
    // arithmetic over the utf-8 BYTE length (metadata is poisoned
    // gate-side, so only a real header parse can produce these values)
    "mm_decode" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
        |d AS (
        |  SELECT doc_id, L,
        |    CASE WHEN L = 0 THEN 1
        |         WHEN L % 4 = 0 THEN 4
        |         WHEN L % 3 = 0 THEN 3
        |         WHEN L % 2 = 0 THEN 2 ELSE 1 END AS h
        |  FROM m)
        |SELECT doc_id AS id,
        |  CAST(octet_length(encode('P6' || chr(10) ||
        |    CAST(L // h AS VARCHAR) || ' ' || CAST(h AS VARCHAR) ||
        |    chr(10) || '255' || chr(10))) + 3 * L AS INT) AS byte_len,
        |  CAST(L // h AS INT) AS width, CAST(h AS INT) AS height
        |FROM d""".stripMargin,

    // per-parity container arithmetic: even ids the P6 header + 3L
    // raster, odd ids the 54-byte BMP headers + h rows of w BGR
    // triples padded to 4 bytes — both from the formats' PUBLISHED
    // layouts, both only reachable through a real header parse
    // dims only — recomputed from the encoder's shape arithmetic over
    // the utf-8 byte length; reachable solely through a real baseline
    // JPEG parse (metadata poisoned gate-side)
    "mm_decode_jpeg" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |d AS (
        |  SELECT doc_id, L,
        |    CASE WHEN L % 4 = 0 THEN 4
        |         WHEN L % 3 = 0 THEN 3
        |         WHEN L % 2 = 0 THEN 2 ELSE 1 END AS h
        |  FROM m)
        |SELECT doc_id AS id, CAST(L // h AS INT) AS width,
        |  CAST(h AS INT) AS height
        |FROM d""".stripMargin,

    "mm_decode_bmp" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
        |  WHERE octet_length(encode(text)) > 0),
        |d AS (
        |  SELECT doc_id, L,
        |    CASE WHEN L % 4 = 0 THEN 4
        |         WHEN L % 3 = 0 THEN 3
        |         WHEN L % 2 = 0 THEN 2 ELSE 1 END AS h
        |  FROM m)
        |SELECT doc_id AS id,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |    THEN octet_length(encode('P6' || chr(10) ||
        |      CAST(L // h AS VARCHAR) || ' ' || CAST(h AS VARCHAR) ||
        |      chr(10) || '255' || chr(10))) + 3 * L
        |    ELSE 54 + ((((L // h) * 3 + 3) // 4) * 4) * h
        |  END AS INT) AS byte_len,
        |  CAST(L // h AS INT) AS width, CAST(h AS INT) AS height
        |FROM d""".stripMargin,

    // member-level banding == the engine's rep-collapse + expansion:
    // identical payloads share every band (hamming 0 always passes),
    // and cross pairs band identically per member. ASCII fixture ⇒
    // unicode(char) == payload byte; integer cross-multiplies mirror
    // Sketches.phash60 exactly
    "mm_phash_dedup" ->
      """WITH b AS (
        |  SELECT doc_id AS id, text, length(text) AS L,
        |    [unicode(substr(text, i, 1)) for i in range(1, length(text)+1)] AS h
        |  FROM documents WHERE length(text) > 0),
        |cells AS (
        |  SELECT id, text, L, list_sum(h) AS tot,
        |    [COALESCE(list_sum(h[(j*L//60)+1 : ((j+1)*L)//60]), 0) for j in range(0,60)] AS cs,
        |    [((j+1)*L)//60 - (j*L//60) for j in range(0,60)] AS cc
        |  FROM b),
        |sig AS (
        |  SELECT id,
        |    list_sum([CASE WHEN cc[j+1] > 0 AND cs[j+1]*L >= tot*cc[j+1]
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS ph
        |  FROM cells),
        |bands AS (
        |  SELECT id, ph, b, (ph >> (15*b)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.ph AS pa, b.ph AS pb
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 12""".stripMargin,

    // same landmark arithmetic over codepoints (== bytes: corpus is
    // ASCII): 64-char frame energies, strict interior peaks, fanout-3
    // pairs within 8 frames, fp=(q1*16+q2)*9+dt with q=e//1024
    "mm_audio_fp" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    [list_sum([unicode(substr(text, f*64 + i, 1)) for i in range(1, 65)])
        |     for f in range(0, CAST(floor(length(text)/64) AS INT))] AS en
        |  FROM documents),
        |pk AS (
        |  SELECT doc_id, en,
        |    [i for i in range(1, len(en)-1)
        |     if en[i+1] > en[i] AND en[i+1] > en[i+2]] AS peaks
        |  FROM e WHERE len(en) >= 3),
        |lm AS (
        |  SELECT doc_id, list_distinct(flatten([
        |     [ ((en[peaks[i+1]+1] // 1024) * 16 + (en[peaks[i+1+k]+1] // 1024)) * 9
        |        + (peaks[i+1+k] - peaks[i+1])
        |       for k in range(1, 4)
        |       if i+1+k <= len(peaks) AND peaks[i+1+k] - peaks[i+1] <= 8 ]
        |     for i in range(0, len(peaks))])) AS fps
        |  FROM pk),
        |f1 AS (SELECT doc_id, unnest(fps) AS fp FROM lm),
        |dfq AS (SELECT fp, count(*) AS d FROM f1 GROUP BY fp),
        |fk AS (SELECT f1.doc_id, f1.fp FROM f1 JOIN dfq USING (fp)
        |       WHERE dfq.d <= 50),
        |pairs AS (
        |  SELECT q.doc_id AS query_id, c.doc_id AS match_id,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM fk q JOIN fk c ON q.fp = c.fp
        |  WHERE q.doc_id < 20 AND c.doc_id >= 20
        |  GROUP BY 1, 2)
        |SELECT query_id, match_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank,
        |  n_shared
        |FROM pairs
        |WINDOW w AS (PARTITION BY query_id ORDER BY n_shared DESC, match_id)
        |QUALIFY ROW_NUMBER() OVER w <= 3""".stripMargin,

    // frame slicing (mm_frames' substr arithmetic) + the phash cell
    // arithmetic over each FRAME + cross-doc banding on packed units
    "mm_frames_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS id, text,
        |    CAST(CEIL(length(text) / 256.0) AS INT) AS n_frames
        |  FROM documents WHERE length(text) > 0),
        |fr AS (
        |  SELECT id, CAST(i AS INT) AS fidx, substr(text, i*256 + 1, 256) AS f
        |  FROM m, range(0, 1000) t(i) WHERE i < n_frames),
        |b AS (
        |  SELECT id, fidx, f, length(f) AS L,
        |    [unicode(substr(f, i, 1)) for i in range(1, length(f)+1)] AS h
        |  FROM fr),
        |cells AS (
        |  SELECT id, fidx, L, list_sum(h) AS tot,
        |    [COALESCE(list_sum(h[(j*L//60)+1 : ((j+1)*L)//60]), 0) for j in range(0,60)] AS cs,
        |    [((j+1)*L)//60 - (j*L//60) for j in range(0,60)] AS cc
        |  FROM b),
        |sig AS (
        |  SELECT id, fidx,
        |    list_sum([CASE WHEN cc[j+1] > 0 AND cs[j+1]*L >= tot*cc[j+1]
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS ph
        |  FROM cells),
        |u AS (SELECT id*1048576 + fidx AS uid, id, fidx, ph FROM sig),
        |bands AS (
        |  SELECT uid, id, fidx, ph, b2, (ph >> (15*b2)) & 32767 AS bv
        |  FROM u, range(0,4) t(b2)),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, a.fidx AS frame_a,
        |    b.id AS id_b, b.fidx AS frame_b, a.ph AS pa, b.ph AS pb
        |  FROM bands a JOIN bands b
        |    ON a.b2 = b.b2 AND a.bv = b.bv AND a.uid < b.uid AND a.id <> b.id)
        |SELECT id_a, frame_a, id_b, frame_b,
        |  CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 8""".stripMargin,

    // the mm_frames_dedup phash-per-frame CTEs + one keyed LAG — videos
    // with >1 frame only; ASCII fixture ⇒ unicode(char) == payload byte
    "mm_scene_cuts" ->
      """WITH m AS (
        |  SELECT doc_id AS id, text,
        |    CAST(CEIL(length(text) / 256.0) AS INT) AS n_frames
        |  FROM documents WHERE CEIL(length(text) / 256.0) > 1),
        |fr AS (
        |  SELECT id, CAST(i AS INT) AS fidx, substr(text, i*256 + 1, 256) AS f
        |  FROM m, range(0, 1000) t(i) WHERE i < n_frames),
        |b AS (
        |  SELECT id, fidx, f, length(f) AS L,
        |    [unicode(substr(f, i, 1)) for i in range(1, length(f)+1)] AS h
        |  FROM fr),
        |cells AS (
        |  SELECT id, fidx, L, list_sum(h) AS tot,
        |    [COALESCE(list_sum(h[(j*L//60)+1 : ((j+1)*L)//60]), 0) for j in range(0,60)] AS cs,
        |    [((j+1)*L)//60 - (j*L//60) for j in range(0,60)] AS cc
        |  FROM b),
        |sig AS (
        |  SELECT id, fidx,
        |    list_sum([CASE WHEN cc[j+1] > 0 AND cs[j+1]*L >= tot*cc[j+1]
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS ph
        |  FROM cells),
        |lg AS (
        |  SELECT id, fidx, ph,
        |    LAG(ph) OVER (PARTITION BY id ORDER BY fidx) AS prev
        |  FROM sig)
        |SELECT id, fidx AS frame_idx,
        |  CAST(bit_count(xor(ph, prev)) AS INT) AS hamming
        |FROM lg WHERE prev IS NOT NULL AND bit_count(xor(ph, prev)) >= 28""".stripMargin,

    // phash pair graph (mm_phash_dedup's CTE) + recursive reachability
    // CC with min-label closure (the dedup_clusters pattern)
    "mm_phash_clusters" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id AS id, text, length(text) AS L,
        |    [unicode(substr(text, i, 1)) for i in range(1, length(text)+1)] AS h
        |  FROM documents WHERE length(text) > 0),
        |cells AS (
        |  SELECT id, text, L, list_sum(h) AS tot,
        |    [COALESCE(list_sum(h[(j*L//60)+1 : ((j+1)*L)//60]), 0) for j in range(0,60)] AS cs,
        |    [((j+1)*L)//60 - (j*L//60) for j in range(0,60)] AS cc
        |  FROM b),
        |sig AS (
        |  SELECT id,
        |    list_sum([CASE WHEN cc[j+1] > 0 AND cs[j+1]*L >= tot*cc[j+1]
        |              THEN CAST(2**j AS BIGINT) ELSE 0 END for j in range(0,60)]) AS ph
        |  FROM cells),
        |bands AS (
        |  SELECT id, ph, b2, (ph >> (15*b2)) & 32767 AS bv
        |  FROM sig, range(0,4) t(b2)),
        |pr AS MATERIALIZED (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bands a JOIN bands b ON a.b2 = b.b2 AND a.bv = b.bv AND a.id < b.id
        |  WHERE bit_count(xor(a.ph, b.ph)) <= 12),
        |nodes AS (SELECT DISTINCT id_a AS n FROM pr UNION SELECT id_b FROM pr),
        |e AS (SELECT id_a AS s, id_b AS d FROM pr UNION ALL SELECT id_b, id_a FROM pr),
        |reach AS (
        |  SELECT n AS node, n AS lbl FROM nodes
        |  UNION
        |  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node)
        |SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY node""".stripMargin,

    // the oracle replicates the canonicalization rule-for-rule (same
    // regexes, same utm_ strip + sort) over the same synthesized URLs
    "text_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.Example.COM:443/d/' || CAST(doc_id % 10 AS VARCHAR)
        |    || '?utm_source=' || source
        |    || '&z=' || CAST(doc_id % 2 AS VARCHAR)
        |    || '&utm_doc=' || CAST(doc_id AS VARCHAR)
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN '#sec?x=' || CAST(doc_id AS VARCHAR) ELSE '' END AS url
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, url,
        |    list_sort(list_filter(
        |      string_split(regexp_extract(url, '^[^#?]*\?([^#]*)', 1), '&'),
        |      p -> p <> '' AND substr(p, 1, 4) <> 'utm_')) AS kept
        |  FROM u),
        |c AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |    || '://'
        |    || CASE lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |         WHEN 'http' THEN regexp_replace(lower(regexp_extract(url,
        |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':80$', '')
        |         WHEN 'https' THEN regexp_replace(lower(regexp_extract(url,
        |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':443$', '')
        |         ELSE lower(regexp_extract(url,
        |           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) END
        |    || regexp_extract(url,
        |         '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
        |    || CASE WHEN len(kept) = 0 THEN ''
        |            ELSE '?' || array_to_string(kept, '&') END AS canonical
        |  FROM k)
        |SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS keep_doc
        |FROM c GROUP BY canonical HAVING COUNT(*) > 1""".stripMargin,

    // graph_pagerank's unrolled-iteration oracle plus the dangling-mass
    // term: per iteration the sink nodes' exact integer rank sum
    // divides by n, rounds ONCE to an integer share, and that share
    // joins each node's neighbor sum inside the damped update —
    // identical expression order to Graph.pageRank's nano-unit contract
    "graph_pagerank_sinks" ->
      """WITH e AS (
        |  SELECT o_custkey AS src, o_orderkey + 10000000 AS dst FROM orders),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |cnt AS (SELECT COUNT(*) AS n FROM nodes),
        |p0 AS (SELECT node,
        |    CAST(ROUND(CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)) AS BIGINT) AS pr_n
        |  FROM nodes),
        |d1 AS (SELECT COALESCE(SUM(pr_n), 0) AS dang FROM p0
        |       WHERE node NOT IN (SELECT src FROM deg)),
        |i1 AS (
        |  SELECT nd.node, CAST(ROUND(
        |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0)
        |          + CAST(ROUND(CAST((SELECT dang FROM d1) AS DOUBLE)
        |                 / CAST((SELECT n FROM cnt) AS DOUBLE)) AS BIGINT) AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM p0 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node),
        |d2 AS (SELECT COALESCE(SUM(pr_n), 0) AS dang FROM i1
        |       WHERE node NOT IN (SELECT src FROM deg)),
        |i2 AS (
        |  SELECT nd.node, CAST(ROUND(
        |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0)
        |          + CAST(ROUND(CAST((SELECT dang FROM d2) AS DOUBLE)
        |                 / CAST((SELECT n FROM cnt) AS DOUBLE)) AS BIGINT) AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM i1 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node),
        |d3 AS (SELECT COALESCE(SUM(pr_n), 0) AS dang FROM i2
        |       WHERE node NOT IN (SELECT src FROM deg)),
        |i3 AS (
        |  SELECT nd.node, CAST(ROUND(
        |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT n FROM cnt)
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0)
        |          + CAST(ROUND(CAST((SELECT dang FROM d3) AS DOUBLE)
        |                 / CAST((SELECT n FROM cnt) AS DOUBLE)) AS BIGINT) AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM i2 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node)
        |SELECT node, pr_n AS pr_nano,
        |  CAST(pr_n AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS pr
        |FROM i3""".stripMargin,

    // unrolled 3-iteration personalized PageRank: teleport + dangling
    // mass land uniformly on the SEEDS; same nano-unit integer
    // fixed-point contract as graph_pagerank_sinks
    "graph_ppr" ->
      """WITH e AS (
        |  SELECT o_custkey AS src, o_orderkey + 10000000 AS dst FROM orders),
        |sd AS (SELECT DISTINCT o_custkey AS node FROM orders
        |       WHERE o_custkey % 20 = 0),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        |nodes AS (
        |  SELECT n.node, n.node IN (SELECT node FROM sd) AS is_seed
        |  FROM (SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e
        |    UNION ALL SELECT node FROM sd)) n),
        |cnt AS (SELECT COUNT(*) AS ns FROM sd),
        |p0 AS (SELECT node, is_seed,
        |    CASE WHEN is_seed THEN CAST(ROUND(CAST(1000000000 AS DOUBLE) / (SELECT ns FROM cnt)) AS BIGINT) ELSE 0 END AS pr_n
        |  FROM nodes),
        |d1 AS (SELECT COALESCE(SUM(pr_n), 0) AS dang FROM p0
        |       WHERE node NOT IN (SELECT src FROM deg)),
        |i1 AS (
        |  SELECT nd.node, nd.is_seed, CAST(ROUND(
        |      CASE WHEN nd.is_seed THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT ns FROM cnt) ELSE CAST(0.0 AS DOUBLE) END
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0)
        |          + CASE WHEN nd.is_seed THEN CAST(ROUND(CAST((SELECT dang FROM d1) AS DOUBLE)
        |                 / CAST((SELECT ns FROM cnt) AS DOUBLE)) AS BIGINT) ELSE 0 END AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM p0 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node),
        |d2 AS (SELECT COALESCE(SUM(pr_n), 0) AS dang FROM i1
        |       WHERE node NOT IN (SELECT src FROM deg)),
        |i2 AS (
        |  SELECT nd.node, nd.is_seed, CAST(ROUND(
        |      CASE WHEN nd.is_seed THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT ns FROM cnt) ELSE CAST(0.0 AS DOUBLE) END
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0)
        |          + CASE WHEN nd.is_seed THEN CAST(ROUND(CAST((SELECT dang FROM d2) AS DOUBLE)
        |                 / CAST((SELECT ns FROM cnt) AS DOUBLE)) AS BIGINT) ELSE 0 END AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM i1 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node),
        |d3 AS (SELECT COALESCE(SUM(pr_n), 0) AS dang FROM i2
        |       WHERE node NOT IN (SELECT src FROM deg)),
        |i3 AS (
        |  SELECT nd.node, nd.is_seed, CAST(ROUND(
        |      CASE WHEN nd.is_seed THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * CAST(1000000000 AS DOUBLE) / (SELECT ns FROM cnt) ELSE CAST(0.0 AS DOUBLE) END
        |      + CAST(0.85 AS DOUBLE) * CAST(COALESCE(s.sv, 0)
        |          + CASE WHEN nd.is_seed THEN CAST(ROUND(CAST((SELECT dang FROM d3) AS DOUBLE)
        |                 / CAST((SELECT ns FROM cnt) AS DOUBLE)) AS BIGINT) ELSE 0 END AS DOUBLE)) AS BIGINT) AS pr_n
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst, SUM(CAST(ROUND(CAST(p.pr_n AS DOUBLE) / d.outdeg) AS BIGINT)) AS sv
        |    FROM i2 p JOIN deg d ON d.src = p.node JOIN e ON e.src = p.node
        |    GROUP BY e.dst) s ON s.dst = nd.node)
        |SELECT node, pr_n AS pr_nano,
        |  CAST(pr_n AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS pr
        |FROM i3""".stripMargin
  )
}
