package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", ("w " * 100).trim),       // 100 tokens -> 4 chunks (1+ceil(68/24))
    (2L, "en", "a b c"),                 // 3 tokens -> 1 chunk
    (3L, "zh", ""),                      // empty -> no chunks, no pack row
    (4L, "de", ("x " * 24).trim),        // fits one window -> 1 chunk
    (5L, "fr", "solo")
  ).toDF("doc_id", "lang", "text")

  test("chunkTokens: counts, overlap, tail truncation, empty docs") {
    val out = Corpus.chunkTokens(docs, "doc_id", "text", chunkSize = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length == 4)                       // 1 + ceil((100-32)/24)
    assert(byDoc(1L).count(_._3 == 32) == 3)            // full windows
    assert(byDoc(1L).find(_._2 == 3).get._3 == 28)      // tail: 100-72, no
                                                        // suffix-only window
    assert(byDoc(2L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0, 3, "a b c")))
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).length == 1 && byDoc(4L).head._3 == 24)
    // overlap: chunk 1 of doc 1 starts at token 24 (0-based), i.e. the
    // last 8 tokens of chunk 0 are its first 8
    val c0 = byDoc(1L).find(_._2 == 0).get._4.split(" ")
    val c1 = byDoc(1L).find(_._2 == 1).get._4.split(" ")
    assert(c0.takeRight(8).sameElements(c1.take(8)))
  }

  test("chunkTokens rejects bad params") {
    intercept[IllegalArgumentException](
      Corpus.chunkTokens(docs, "doc_id", "text", chunkSize = 8, stride = 9))
  }

  test("packSequences: bins fill to budget, totals conserved") {
    val many = spark.range(1000)
      .select(col("id").as("doc_id"), lit("t " * 10).as("text")) // 10 tokens each
    val out = Corpus.packSequences(many, "doc_id", "text",
      budgetTokens = 100, shards = 4).collect()
    val total = out.map(_.getLong(3)).sum
    assert(total == 10000L) // every token packed exactly once
    // with uniform 10-token docs every non-tail bin packs exactly 100
    // tokens / 10 docs
    val byShard = out.groupBy(_.getInt(0))
    assert(byShard.size == 4)
    byShard.foreach { case (_, bins) =>
      val maxBin = bins.map(_.getLong(1)).max
      bins.filter(_.getLong(1) < maxBin).foreach { b =>
        assert(b.getLong(3) == 100L && b.getLong(2) == 10L)
      }
    }
    // deterministic: same input -> identical bin table
    val again = Corpus.packSequences(many, "doc_id", "text", 100, 4).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("mixWeighted rejects duplicate class keys (join fan-out guard)") {
    intercept[IllegalArgumentException](
      Corpus.mixWeighted(docs, "doc_id", "lang",
        Seq("en" -> 0.9, "en" -> 0.5)))
  }

  test("mixWeighted: rate-0 drops all, rate-1 keeps all, mid is proportional") {
    val many = spark.range(4000).select(col("id").as("doc_id"),
      (when(col("id") % 2 === 0, "en").otherwise("zh")).as("lang"))
    val out = Corpus.mixWeighted(many, "doc_id", "lang",
      Seq("en" -> 1.0, "zh" -> 0.25))
    val n = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("en") == 2000L)
    assert(n("zh") > 300 && n("zh") < 700) // ~500
    // unknown class drops (inner join against the rate table)
    val dropped = Corpus.mixWeighted(many, "doc_id", "lang", Seq("en" -> 0.0))
    assert(dropped.count() == 0)
  }

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta gamma delta epsilon y"), // contains the bench 5-gram
      (2L, "totally different words live here now")
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L)))
  }

  test("shardStats: every doc in exactly one shard, tokens conserved") {
    val out = Corpus.shardStats(docs, "doc_id", "text", shards = 16).collect()
    assert(out.map(_.getLong(1)).sum == 5L)       // n_docs sums to all docs
    assert(out.map(_.getLong(2)).sum == 128L)     // 100+3+0+24+1 tokens
  }

  test("boilerplate flags only docs sharing hot grams, ratio in (0,1]") {
    val footer = "contact us at example dot com today"
    val corpus = Seq(
      (1L, s"unique words here one. $footer"),
      (2L, s"other text entirely two. $footer"),
      (3L, s"third document body three. $footer"),
      (4L, "nothing shared with anyone at all here")
    ).toDF("doc_id", "text")
    val out = Corpus.boilerplate(corpus, "doc_id", "text", n = 4, minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    // the footer contributes the same distinct 4-gram count to each doc
    assert(out.map(_._2).distinct.length == 1)
    out.foreach(t => assert(t._3 > 0.0 && t._3 <= 1.0))
  }

  test("exportShards: manifest describes what landed, matches shardStats") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val manifest = Corpus.exportShards(docs, "doc_id", "text",
        shards = 4, path = s"$dir/out")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // same bucketing as the pre-write balance check
    val predicted = Corpus.shardStats(docs, "doc_id", "text", shards = 4)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(manifest == predicted)
    // the files themselves agree with the manifest
    val disk = spark.read.parquet(s"$dir/out")
    assert(disk.count() == manifest.values.map(_._1).sum)
    assert(disk.select("shard").distinct().count() == manifest.size)
    // small-file control: the pre-write repartition(shard) puts each
    // shard's rows in ONE task, so each shard dir holds exactly one
    // data file (maxRecordsPerFile far above the row count here) — no
    // tasks×shards explosion
    new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("shard=")).foreach { d =>
        val parts = d.listFiles().count(_.getName.endsWith(".parquet"))
        assert(parts == 1, s"${d.getName}: $parts part files")
      }
  }

  test("tfidfTopTerms: smoothed idf ranks rare terms above common ones") {
    val corpus = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "c d")
    ).toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    // N=3; df(a)=2, df(b)=1 → idf(a)=ln(4/3)≈0.2877, idf(b)=ln(2)≈0.6931
    // doc1 scores: b = 0.6931 beats a = 2·0.2877 = 0.5754
    assert(doc1.map(t => (t._2, t._3)).toSeq == Seq((1, "b"), (2, "a")))
    assert(doc1.head._5 == 0.6931 && doc1.last._5 == 0.5754)
    // doc3: c and d both tf=1; d rarer → ranks first
    val doc3 = out.filter(_._1 == 3L).sortBy(_._2)
    assert(doc3.map(_._3).toSeq == Seq("d", "c"))
  }

  test("tfidfTopTerms: equal rounded scores tie-break by term asc") {
    // two terms with identical tf and df → identical score
    val corpus = Seq((1L, "z q"), (2L, "z q")).toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq == Seq("q", "z"))
  }

  test("samplePerGroup: exact n per large group, all rows of small groups") {
    val many = spark.range(500).select(col("id").as("doc_id"),
      (when(col("id") % 10 === 0, "rare").otherwise("common")).as("lang"))
    val out = Corpus.samplePerGroup(many, "doc_id", "lang", n = 30)
    val n = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("common" -> 30L, "rare" -> 30L))
    val tiny = Corpus.samplePerGroup(
      many.where(col("doc_id") < 25), "doc_id", "lang", n = 30)
    assert(tiny.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("common" -> 22L, "rare" -> 3L))
    // deterministic: same rows on a re-run, ranks dense 1..n
    val a = out.orderBy("lang", "sample_rank").collect().map(_.toSeq)
    val b = Corpus.samplePerGroup(many, "doc_id", "lang", n = 30)
      .orderBy("lang", "sample_rank").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("qualityGate: per-group quantile thresholds, boundary kept") {
    import spark.implicits._
    // group a: scores 1..8 → p25 threshold (interpolated at rank
    // 0.25*7 = 1.75) = 2.75 → keeps 3..8; group b: all equal → all kept
    val df = ((1 to 8).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 4).map(i => ("b", 100L + i, 5.0))).toDF("lang", "id", "score")
    val out = Corpus.qualityGate(df, "lang", "score", p = 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == ((3 to 8).map(i => ("a", i.toLong)).toSet ++
      (1 to 4).map(i => ("b", 100L + i)).toSet))
    val thr = Corpus.qualityGate(df, "lang", "score", p = 0.25)
      .select("lang", "q_threshold").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(thr == Map("a" -> 2.75, "b" -> 5.0))
  }

  test("bm25: term-bearing docs only, tf and length drive the ranking") {
    val df = Seq(
      (1L, "vector vector vector pad pad"),     // 3 hits, short
      (2L, "vector pad pad pad pad pad pad pad pad pad"), // 1 hit, long
      (3L, "pad pad pad pad"),                  // no query terms
      (4L, "vector vector pad")                 // 2 hits, shortest
    ).toDF("doc_id", "text")
    val out = Corpus.bm25(df, "doc_id", "text", Seq("vector"), topK = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(!out.exists(_._2 == 3L))               // scoreless docs absent
    assert(out.map(_._1).toSeq == (1 to out.length).toSeq)
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted.reverse)
    // saturated tf + length normalization: 3-hit short doc beats
    // 1-hit long doc
    assert(out.head._2 == 1L && out.last._2 == 2L)
  }

  test("bigramNll: repeated common bigrams score lower nll than rare ones") {
    val df = Seq(
      (1L, "a b a b a b"),     // bigrams all from the corpus's densest mass
      (2L, "a b a b a b"),
      (3L, "x y z w q r")      // six singleton bigrams
    ).toDF("doc_id", "text")
    val out = Corpus.bigramNll(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val m = out.map(t => t._1 -> t._3).toMap
    assert(out.forall(_._2 == 5L))               // len 6 → 5 adjacent pairs
    assert(m(1L) == m(2L))                       // identical docs tie
    assert(m(1L) < m(3L))                        // fluent beats token soup
  }

  test("bpePairs: token-frequency-weighted char-pair counts, ranked") {
    // terms: "ab"×2, "abc"×1 → pair ab: 2 + 1 = 3, bc: 1; 1-char terms drop
    val df = Seq((1L, "ab ab abc x")).toDF("doc_id", "text")
    val out = Corpus.bpePairs(df, "text", topK = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    assert(out == List((1, "ab", 3L), (2, "bc", 1L)))
  }

  test("bpeEncodeVocab: ordered merges chain, leftmost-greedy overlap") {
    // default merges: t+h → th+e chain; i+n before in+g; a+n before an+d
    val df = Seq((1L, "the then and ing x")).toDF("doc_id", "text")
    val out = Corpus.bpeEncodeVocab(df, "text", topK = 10)
      .collect().map(r => r.getString(1) -> ((r.getString(3), r.getInt(4))))
      .toMap
    assert(out("the") == (("the", 1)))   // t h e → th e → the
    assert(out("then") == (("the n", 2)))
    assert(out("and") == (("and", 1)))   // a n d → an d → and
    assert(out("ing") == (("ing", 1)))   // i n g → in g → ing
    assert(out("x") == (("x", 1)))       // single char: no merge applies
    // leftmost-greedy on overlapping occurrences: aaa + (a,a) → [aa, a]
    val odd = Seq((1L, "aaa")).toDF("doc_id", "text")
    val o = Corpus.bpeEncodeVocab(odd, "text",
      merges = Seq("a" -> "a"), topK = 1).head()
    assert(o.getString(3) == "aa a" && o.getInt(4) == 2)
    // merge must not fire across symbol boundaries: term "abc" with
    // merge (b,c) applies, but AFTER (a,b) has fused ab the b is gone
    val ab = Corpus.bpeEncodeVocab(Seq((1L, "abc")).toDF("doc_id", "text"),
      "text", merges = Seq("a" -> "b", "b" -> "c"), topK = 1).head()
    assert(ab.getString(3) == "ab c" && ab.getInt(4) == 2)
  }

  test("sampleWeightedK: exact k, weight-biased, deterministic, TakeOrdered plan") {
    val df = (1L to 1000L).map(i =>
      // ids <= 100 get weight 50, the rest weight 1
      (i, if (i <= 100) 50.0 else 1.0)).toDF("id", "w")
    val out = Corpus.sampleWeightedK(df, "id", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(out.size == 100)
    // heavy ids are 10% of rows but hold ~85% of total weight: they
    // must dominate the sample (deterministic given the md5 draws)
    val heavy = out.count(_ <= 100L)
    assert(heavy > 50, s"only $heavy heavy rows sampled")
    // deterministic across partitioning and re-runs
    val rep = Corpus.sampleWeightedK(df.repartition(7), "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert(rep == out)
    // zero/negative/null weights never qualify
    val bad = Seq((1L, 0.0), (2L, -5.0), (3L, 1.0)).toDF("id", "w")
    assert(Corpus.sampleWeightedK(bad, "id", "w", 3)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // plan: TakeOrderedAndProject (per-partition heaps), no global sort
    val plan = Corpus.sampleWeightedK(df, "id", "w", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("dsirScores: target-like docs outscore target-unlike; partition-independent") {
    val target = Seq(
      (100L, "physics equations describe motion energy and force fields"),
      (101L, "quantum physics energy states and force interactions")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "physics energy force motion fields"),          // target-like
      (2L, "recipe for chocolate cake with sugar butter"), // unlike
      (3L, "physics energy force motion fields")           // dup of 1
    ).toDF("doc_id", "text")
    val out = Corpus.dsirScores(raw, target, "doc_id", "text", m = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L), s"target-like doc did not outscore: $out")
    assert(out(1L) == out(3L), "identical docs must score identically")
    val rep = Corpus.dsirScores(raw.repartition(7), target.repartition(3),
        "doc_id", "text", m = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rep == out, "score depends on partitioning")
  }

  test("decontaminateFuzzy: near-dup bench docs flag, unrelated pass") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different benchmark question about physics")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // near-dup of bench 100 (one word changed)
      (1L, "the quick brown fox jumps over the lazy cat tonight"),
      // exact dup of bench 100
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      // unrelated
      (3L, "supervised training data curation at corpus scale works")
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminateFuzzy(corpus, bench, "doc_id", "text",
        minMatches = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out.contains(2L) && out(2L)._2 == 1.0)
    assert(out(2L)._3 == 100L)
    assert(out.contains(1L), "near-duplicate leaked past the sweep")
    assert(!out.contains(3L), "unrelated doc falsely flagged")
  }

  test("bpeTrain: learns frequency-ordered merges; chained pieces; early stop") {
    // corpus: "aab"×3, "ab"×2 → round 1 pairs: (a,b) 3+2=5, (a,a) 3 →
    // merge (a,b); round 2: "a ab"×3 → (a,ab) 3 → merge (a,ab);
    // round 3: nothing left to merge → early stop
    val df = Seq((1L, "aab aab aab ab ab")).toDF("doc_id", "text")
    val out = Corpus.bpeTrain(df, "text", nMerges = 5)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList
    assert(out == List(
      (1, "a", "b", "ab", 5L),
      (2, "a", "ab", "aab", 3L)))
    // tie-break is lexicographic on (l, r): "ba ab" has (b,a) 1 and
    // (a,b) 1 → (a,b) wins
    val tie = Corpus.bpeTrain(Seq((1L, "ba ab")).toDF("doc_id", "text"),
      "text", nMerges = 1).head()
    assert(tie.getString(1) == "a" && tie.getString(2) == "b")
    // learned merges replay through bpeSymbols: "aab" encodes to the
    // single merged piece under its own training output
    val merges = out.map(m => (m._2, m._3))
    val enc = Corpus.bpeEncodeVocab(df, "text", merges = merges, topK = 10)
      .collect().map(r => r.getString(1) -> r.getString(3)).toMap
    assert(enc("aab") == "aab" && enc("ab") == "ab")
  }

  test("pipeline v2 composition: filtered+deduped docs feed the packer") {
    // doc 2 fails the metric gate (numbers only → alpha 0); doc 3 is
    // an exact dup of doc 1 (dropped by keep); docs 1 and 4 pack
    val base = "the quick brown fox and that hound have gone to the " +
      "den of winter with haste again and again and again and again"
    val docs = Seq(
      (1L, base), (2L, "11 22 33 " * 8 + "44"), (3L, base),
      (4L, base + " but different")
    ).toDF("doc_id", "text")
    val passed = graft.operators.TextStats
      .gopherRules(docs, "doc_id", "text", minWords = 20)
      .where(col("n_words") >= 20 and col("mean_wlen") >= 3.0 and
        col("symbol_ratio") < 0.1 and col("alpha_frac") >= 0.8)
      .select("doc_id")
    val clean = docs.join(passed, "doc_id")
    val keep = clean.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val packed = Corpus.packSequencesBpe(clean.join(keep, "doc_id"),
      "doc_id", "text", budgetTokens = 512, shards = 1)
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(packed == 2L, s"expected docs 1 and 4 to survive, got $packed")
  }

  test("packSequencesBpe: bins fill by piece count, not word count") {
    // "the then" = 2 words but 3 BPE pieces under DefaultMerges
    // ("the" → 1, "then" → "the n" = 2); with budget 3 the FIRST doc
    // alone fills bin 0 under BPE packing, while whitespace packing
    // (2 tokens) would still have room
    val df = Seq((1L, "the then"), (2L, "the then")).toDF("doc_id", "text")
    val bpe = Corpus.packSequencesBpe(df, "doc_id", "text",
        budgetTokens = 3, shards = 1)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // each doc is exactly one full 3-piece bin
    assert(bpe == Map(0L -> ((1L, 3L)), 1L -> ((1L, 3L))))
    val ws = Corpus.packSequences(df, "doc_id", "text",
        budgetTokens = 3, shards = 1)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // whitespace counting packs BOTH docs (2+2=4 tokens) across bins
    // starting in bin 0 — the under-estimate the BPE form fixes
    assert(ws(0L) == 2L)
  }

  test("bpeTokenCounts: per-doc piece budget over the vocab join") {
    val df = Seq((1L, "the then the"), (2L, "x")).toDF("doc_id", "text")
    val out = Corpus.bpeTokenCounts(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) == ((3L, 4L)))  // the(1) + then(2) + the(1)
    assert(out(2L) == ((1L, 1L)))
  }

  test("stratifiedSplit: every row assigned, deterministic, layout-independent") {
    val df = spark.range(0, 1000).toDF("doc_id")
    val cuts = Seq("train" -> 80, "val" -> 90, "test" -> 100)
    val out = Corpus.stratifiedSplit(df, "doc_id", "split", cuts)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900) // ~80%
    assert(counts("val") > 50 && counts("test") > 50)
    // same id -> same split regardless of partitioning or row order
    val a = out.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val b = Corpus.stratifiedSplit(df.repartition(13), "doc_id", "split", cuts)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(a == b)
  }

  test("stratifiedSplit rejects malformed cuts") {
    val df = spark.range(1).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Corpus.stratifiedSplit(df, "doc_id", "s", Seq("a" -> 50, "b" -> 90))
    }
    intercept[IllegalArgumentException] {
      Corpus.stratifiedSplit(df, "doc_id", "s", Seq("a" -> 90, "b" -> 80, "c" -> 100))
    }
  }

  test("phraseSearch: overlaps count, case folds, non-matches absent") {
    val docs = Seq(
      (1L, "the quick fox and the quick fox again"), // 2 hits of "quick fox"
      (2L, "a a a a"),                               // overlapping "a a": 3
      (3L, "QUICK   Fox"),                           // case + multi-space: 1
      (4L, "quick brown fox"),                       // adjacency broken: 0
      (5L, "fox quick")                              // wrong order: 0
    ).toDF("doc_id", "text")
    val qf = Corpus.phraseSearch(docs, "doc_id", "text", Seq("quick", "Fox"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(qf == Map(1L -> ((2L, 1)), 3L -> ((1L, 0))))
    val aa = Corpus.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa == Map(2L -> 3L))
    intercept[IllegalArgumentException](
      Corpus.phraseSearch(docs, "doc_id", "text", Seq("two words")))
  }

  test("phraseSearch single-term and partitioning independence") {
    val docs = graft.Tables.t(spark, sf0001, "documents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Corpus.phraseSearch(d, "doc_id", "text", Seq("slow", "hash"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = run(docs)
    assert(a.nonEmpty && run(docs.repartition(9)) == a)
    // single-term phrase degenerates to term lookup with positions
    val one = Corpus.phraseSearch(docs, "doc_id", "text", Seq("hash"))
    assert(one.count() >= a.size)
  }

  test("hashEmbed matches a reference md5 hashing-trick computation") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha alpha beta gamma"),
      (2L, "alpha beta"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.hashEmbed(df, "doc_id", "text", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

    def h60(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def expected(docId: Long, toks: Seq[String]) = {
      val m = scala.collection.mutable.Map[Int, Long]()
      toks.foreach { t =>
        val h = h60(t)
        val d = (h % 64).toInt
        val s = if (((h >> 12) & 1L) == 1L) 1L else -1L
        m(d) = m.getOrElse(d, 0L) + s
      }
      m.filter(_._2 != 0).map { case (d, v) => (docId, d) -> v }
    }
    val want = (expected(1L, Seq("alpha", "alpha", "beta", "gamma")) ++
      expected(2L, Seq("alpha", "beta"))).toMap
    assert(out == want)
    assert(!out.keys.exists(_._1 == 3L), "empty doc contributes nothing")
  }

  test("hashEmbed sign is not a function of the dimension for dim > 64") {
    import spark.implicits._
    // with the sign at a bit INSIDE h mod dim (the pre-r8 bit 6), every
    // token landing on a given dim of a power-of-two dim > 64 carries
    // the SAME sign, so |v| would equal the token count in EVERY dim;
    // bit 12 sits above the 4096 cap, so distinct tokens colliding on a
    // dim must show mixed signs about half the time. The sf fixtures'
    // vocab is too small to collide (31 tokens at sf0.001) — use a
    // synthetic 4000-token doc against dim=256 (≈15.6 tokens/dim).
    val text = (0 until 4000).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val perDim = Corpus.hashEmbed(df, "doc_id", "text", dim = 256)
    val tokensPerDim = df
      .selectExpr("explode(split(lower(text), ' ')) AS tok")
      .where("tok <> ''")
      .selectExpr(
        "CAST(CONV(SUBSTRING(MD5(tok), 1, 15), 16, 10) AS BIGINT) AS h")
      .selectExpr("CAST(pmod(h, 256) AS INT) AS dim")
      .groupBy("dim").count()
    val cancelled = perDim
      .join(tokensPerDim, "dim")
      .where(org.apache.spark.sql.functions.abs(
        org.apache.spark.sql.functions.col("v")) <
        org.apache.spark.sql.functions.col("count"))
      .count()
    assert(cancelled > 100,
      s"only $cancelled/256 dims showed sign mixing — sign correlated with dim")
  }

  test("hashEmbed is partition-count independent (exact integer sums)") {
    val docs = Tables.documents(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.hashEmbed(df, "doc_id", "text", dim = 64)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("shuffleOrder: dense per-shard positions, epoch reseed permutes, partition independent") {
    import org.apache.spark.sql.functions.{col, countDistinct, count, max}
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val out = Corpus.shuffleOrder(docs, "doc_id", seed = "ep1", shards = 8)
    // a PERMUTATION: every doc exactly once, positions dense 1..|shard|
    assert(out.count() == n)
    assert(out.groupBy("shard")
      .agg(count(col("pos")).as("n"), countDistinct(col("pos")).as("d"),
        max(col("pos")).as("m"))
      .where(col("n") =!= col("d") || col("m") =!= col("n"))
      .count() == 0, "positions not dense 1..n within a shard")
    // a different epoch seed yields a genuinely different order…
    val e1 = out.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3))).toMap
    val e2 = Corpus.shuffleOrder(docs, "doc_id", seed = "ep2", shards = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3))).toMap
    assert(e1 != e2, "epoch reseed produced the identical permutation")
    // …but NEVER a different shard: shard assignment is epoch-stable
    // (unseeded salt — r9 advice: a consumer that materialized files by
    // shard must not move data on reseed) and identical to shardStats'
    assert(e1.view.mapValues(_._1).toMap == e2.view.mapValues(_._1).toMap,
      "epoch reseed moved docs across shards")
    // determinism under any partitioning
    val re = Corpus.shuffleOrder(docs.repartition(13), "doc_id",
        seed = "ep1", shards = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3))).toMap
    assert(re == e1)
  }

  test("temperatureMix: α=1 proportional, α<1 flattens toward uniform, rate caps at 1") {
    val docs = Seq(
      (1L, "en", "a b c d e f g h"),        // en: 16 tokens
      (2L, "en", "a b c d e f g h"),
      (3L, "zh", "x y"),                    // zh: 2 tokens
      (4L, "fr", "p q r s")                 // fr: 4 tokens
    ).toDF("doc_id", "lang", "text")
    def mix(a: Double, b: Long) =
      Corpus.temperatureMix(docs, "text", "lang", a, b)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // α = 1: weights exactly proportional to token mass
    val p = mix(1.0, 11L)
    assert(p("en")._1 == 16L && p("zh")._1 == 2L && p("fr")._1 == 4L)
    assert(p("en")._2 == math.rint(16.0 / 22 * 1e6) / 1e6)
    // budget 11 at proportional weights = rate 0.5 everywhere
    assert(p.values.forall(_._3 == 0.5))
    // α = 0.5 flattens: en's share drops below proportional, zh's rises
    val t = mix(0.5, 11L)
    assert(t("en")._2 < p("en")._2 && t("zh")._2 > p("zh")._2)
    // weights still sum to 1 (within rounding)
    assert(math.abs(t.values.map(_._2).sum - 1.0) < 1e-5)
    // a budget exceeding the corpus caps every rate at 1
    assert(mix(0.5, 1000000L).values.forall(_._3 == 1.0))
  }

  test("spanCorruption: sentinel splice reassembles the token stream exactly") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two"),
      (3L, "solo"),                    // < 2 tokens: dropped
      (4L, "a b c d e f g h i j k l m n o p q r s t")
    ).toDF("doc_id", "text")
    val out = Corpus.spanCorruption(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L))
    out.values.foreach { r =>
      val (n, s1, l1, s2, l2) = (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5))
      val (src, tgt) = (r.getString(6), r.getString(7))
      // spans sit inside their halves and never overlap
      assert(s1 >= 0 && s1 + l1 <= s2 && s2 + l2 <= n)
      // splicing each target span back over its sentinel reproduces
      // the original token stream EXACTLY
      val toks = df.where(col("doc_id") === r.getLong(0))
        .select(lower(col("text"))).head().getString(0)
        .split(" ").filter(_.nonEmpty).toSeq
      val Array(pre, rest) = src.split(" <X> ", 2)
      val Array(mid, post) = rest.split(" <Y> ", 2)
      val Array(m1, m2) = tgt.stripPrefix("<X> ").split(" <Y> ", 2)
      def t(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
      assert(t(pre) ++ t(m1) ++ t(mid) ++ t(m2) ++ t(post) == toks,
        s"doc ${r.getLong(0)} splice mismatch")
    }
    // hash-deterministic: repartitioning changes nothing
    val re = Corpus.spanCorruption(df.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(re == out.view.mapValues(_.getString(6)).toMap)
  }

  test("fimSplit: PSM reassembles the document, offsets hash-deterministic") {
    val df = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xyz"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Corpus.fimSplit(d, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
          r.getString(4)))).toMap
    val out = run(df)
    val texts = Map(1L -> "abcdefghij", 2L -> "", 3L -> "xyz")
    out.foreach { case (id, (n, p1, p2, fim)) =>
      val t = texts(id)
      assert(n == t.length && 0 <= p1 && p1 <= p2 && p2 <= n)
      // <PRE>prefix<SUF>suffix<MID>middle — reassembly is lossless
      val body = fim.stripPrefix("<PRE>")
      val Array(pre, rest) = body.split("<SUF>", 2)
      val Array(suf, mid) = rest.split("<MID>", 2)
      assert(pre == t.substring(0, p1) && mid == t.substring(p1, p2) &&
        suf == t.substring(p2))
      assert(pre + mid + suf == t)
    }
    assert(out(2L)._4 == "<PRE><SUF><MID>")  // empty doc → empty pieces
    assert(run(df.repartition(5)) == out)    // hash-keyed, layout-proof
  }

  test("contrastivePairs: rank-matched disjoint quarters per language") {
    val scored = (1 to 8).map(i => (i.toLong, "x", i.toDouble)) ++
      Seq((100L, "y", 1.0), (101L, "y", 2.0), (102L, "y", 3.0))
    val df = scored.toDF("doc_id", "lang", "score")
    val out = Corpus.contrastivePairs(df, "doc_id", "lang", "score")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(4))).toSet
    // x: 8 docs → 2 pairs (best↔worst, 2nd↔2nd); y: 3 docs → 0 pairs
    assert(out == Set(("x", 1, 8L, 1L), ("x", 2, 7L, 2L)))
    // pos and neg sides never overlap (¼ + ¼ ≤ ½ by construction)
    val full = Corpus.contrastivePairs(df, "doc_id", "lang", "score")
      .collect()
    assert(full.map(_.getLong(2)).toSet
      .intersect(full.map(_.getLong(4)).toSet).isEmpty)
  }

  test("contrastivePairs: all-tied scores still yield disjoint sides") {
    // r9 advice: with both windows tie-breaking doc_id ASC, a tied-score
    // doc ranks 1-best AND 1-worst → degenerate pos_id == neg_id pairs.
    // lo is now the exact reverse of hi's total order (score ASC,
    // doc_id DESC), so hi + lo = count + 1 for EVERY doc and the
    // quarter windows cannot touch — even on a fully tied fixture.
    val tied = (1L to 8L).map(i => (i, "x", 1.0))
      .toDF("doc_id", "lang", "score")
    val out = Corpus.contrastivePairs(tied, "doc_id", "lang", "score")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(out.length == 2)
    out.foreach { case (_, pos, neg) => assert(pos != neg) }
    // exact reverse order: hi = 1,2,... by id ASC, lo = 8,7,... so
    // rank 1 pairs doc 1 with doc 8, rank 2 pairs doc 2 with doc 7
    assert(out.toSet.map((t: (Int, Long, Long)) => (t._1, t._2, t._3)) ==
      Set((1, 1L, 8L), (2, 2L, 7L)))
    assert(out.map(_._2).toSet.intersect(out.map(_._3).toSet).isEmpty)
  }

  test("bigramNllKn: interpolated Kneser-Ney on a hand-computed corpus") {
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // c2: (a,b)=2 (b,a)=1 (a,c)=1; c1/n1f: a=3/2 b=1/1; n1b: a=b=c=1; T=3
    val pBA = math.max(2 - 0.75, 0.0) / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    val pAB = math.max(1 - 0.75, 0.0) / 1 + (0.75 * 1 / 1) * (1.0 / 3)
    val pCA = math.max(1 - 0.75, 0.0) / 3 + (0.75 * 2 / 3) * (1.0 / 3)
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    def nl(p: Double) = r(-math.log(p), 6)
    val out = Corpus.bigramNllKn(df, "doc_id", "text")
      .collect().map(r0 => r0.getLong(0) -> ((r0.getLong(1), r0.getDouble(2))))
      .toMap
    assert(out(1L) == ((3L,
      r((nl(pBA) * 2 + nl(pAB)).toDouble / 3, 4).toDouble)))
    assert(out(2L) == ((1L, r(nl(pCA).toDouble, 4).toDouble)))
    // the probabilities in play form a proper distribution slice
    assert(pBA + pCA <= 1.0 + 1e-12)
    intercept[IllegalArgumentException](
      Corpus.bigramNllKn(df, "doc_id", "text", discount = 1.5))
  }

  test("zipfCoverage: rank by frequency, term tie-break, cumulative share") {
    val df = Seq((1L, "a a a"), (2L, "b b c a")).toDF("doc_id", "text")
    val out = Corpus.zipfCoverage(df, "text", topK = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    def f(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(
      (1, "a", 4L, f(4.0 / 7)),
      (2, "b", 2L, f(6.0 / 7)),
      (3, "c", 1L, f(1.0))))
    // cut honors topK
    assert(Corpus.zipfCoverage(df, "text", topK = 1).count() == 1)
  }

  test("tokenBudgetMix: md5-order prefix cut per language, boundary kept") {
    val docs = Seq(
      (1L, "a b c", "en"), (2L, "d e", "en"), (3L, "f g h i", "en"),
      (4L, "x y", "zh"), (5L, "keine quote", "de")   // de not budgeted
    ).toDF("doc_id", "text", "lang")
    def md5ord(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-budget:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val enOrder = Seq((1L, 3L), (2L, 2L), (3L, 4L))
      .sortBy { case (id, _) => (md5ord(id), id) }
    // replicate the contract: cumulative over ALL docs in md5 order,
    // kept iff own cumsum fits — an overflow ENDS the language's intake
    def simulate(budget: Long) = enOrder
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .tail.filter(_._3 <= budget).map(t => t._1 -> ((t._2, t._3))).toMap
    def run(budget: Long) =
      Corpus.tokenBudgetMix(docs, "doc_id", "text", "lang",
          Map("en" -> budget, "zh" -> 100L))
        .where(col("lang") === "en")
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
    assert(run(9L) == simulate(9L) && run(9L).size == 3)   // boundary kept
    assert(run(5L) == simulate(5L))
    assert(run(1L) == simulate(1L) && run(1L).isEmpty)     // first doc > 1 tok
    // unbudgeted language absent; budgeted zh present
    val all = Corpus.tokenBudgetMix(docs, "doc_id", "text", "lang",
        Map("en" -> 9L, "zh" -> 100L))
      .collect().map(r => r.getString(1)).toSet
    assert(all == Set("en", "zh"))
    // partition-count independent (hash order, not arrival order)
    val re = Corpus.tokenBudgetMix(docs.repartition(7), "doc_id", "text",
        "lang", Map("en" -> 5L, "zh" -> 100L))
      .where(col("lang") === "en")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(re == simulate(5L))
    intercept[IllegalArgumentException](
      Corpus.tokenBudgetMix(docs, "doc_id", "text", "lang", Map.empty))
  }

  test("hybridRrf: rank-only fusion consistent with both component rankings") {
    val df = Seq(
      (1L, "alpha alpha alpha pad pad"),
      (2L, "alpha beta"),                    // both terms — tops both lists
      (3L, "beta gamma pad pad pad pad"),
      (4L, "gamma delta pad"),               // no query term
      (5L, "alpha pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val q = Seq("alpha", "beta")
    val out = Corpus.hybridRrf(df, "doc_id", "text", q,
        dim = 64, k = 60, topKPerList = 5, topK = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))
    // ranks are dense from 1 and ordered by rrf desc (doc_id tie-break)
    assert(out.map(_._1).toSeq == (1 to out.length).toSeq)
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted.reverse)
    // every fused doc appears in at least one component list, and the
    // fused score is exactly the RRF formula over its rank columns
    out.foreach { case (_, _, rrf, br, cr) =>
      assert(br.nonEmpty || cr.nonEmpty)
      val want = br.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        cr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(rrf == BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the lexical rank column IS bm25's ranking at the same cut
    val lex = Corpus.bm25(df, "doc_id", "text", q, topK = 5)
      .collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    out.foreach { case (_, id, _, br, _) => assert(br == lex.get(id)) }
    // doc 2 holds both query terms: present in both rankings, and its
    // query-identical token multiset makes it the dense #1
    val d2 = out.find(_._2 == 2L).get
    assert(d2._4.nonEmpty && d2._5.contains(1))
    // deterministic under any input partitioning
    val re = Corpus.hybridRrf(df.repartition(7), "doc_id", "text", q,
        dim = 64, k = 60, topKPerList = 5, topK = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))
    assert(re.toSeq == out.toSeq)
    intercept[IllegalArgumentException](
      Corpus.hybridRrf(df, "doc_id", "text", Nil))
  }
}
