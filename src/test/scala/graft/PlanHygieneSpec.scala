package graft

/** Inventory-wide plan-hygiene gate: no query may plan an all-pairs
  * join. A BroadcastNestedLoopJoin or CartesianProduct is the one plan
  * shape that cannot run at 100 TB, and it can sneak in silently — a
  * join whose equi-condition gets rewritten away, a range predicate
  * without a binned key, a lost broadcast hint — while results stay
  * correct on test-scale data. Asserting over EVERY SparkEntry query
  * keeps the SURVEY §5 claim ("the only cross join is the cross-join
  * query") true by construction as the inventory grows.
  */
class PlanHygieneSpec extends SparkSpec {

  // The only sanctioned all-pairs shapes, each with a structurally
  // bounded build side:
  //  - q_cross_join IS the cross-join capability row;
  //  - ann_topk broadcasts the QUERY set (bounded by the caller) against
  //    the candidate scan — the documented exact Q·N baseline whose
  //    scale paths are ann_lsh/ann_ivf (both equi-joins, NOT listed);
  //  - ann_ivf's centroid assignment broadcasts k=8 centroid rows —
  //    every vector must score all k centroids by definition;
  //  - corpus_tfidf / corpus_lm_score / corpus_bm25 / corpus_perplexity
  //    / etl_surrogate_key attach a scalar (1-row global aggregate,
  //    broadcast) to a keyed stream — a nested "loop" over exactly one
  //    build row, i.e. a map-side constant attach;
  //  - ann_range broadcasts the caller-bounded query set against the
  //    candidate scan, like ann_topk (radius variant of the same
  //    contract);
  //  - ann_sq: the per-dim quantization params are ONE broadcast row
  //    (scalar attach) and the ADC search is the ann_topk broadcast
  //    shape over the dequantized corpus;
  //  - corpus_weighted_sample attaches the 1-row global max-weight
  //    scalar, same constant-attach shape as corpus_tfidf;
  //  - ann_ivfpq's coarse assignment broadcasts cells=4 centroid rows
  //    (every vector scores all cells by definition — ann_ivf's shape);
  //    the SEARCH stage itself is a broadcast-hash equi-join on codes;
  //  - corpus_dsir attaches the 1-row (total_target, total_raw) scalar
  //    to the m-row feature frame — constant attach, m = 64 rows;
  //  - ann_refine runs the ann_ivfpq pipeline for its shortlist (same
  //    cells-row coarse-assign broadcast); the rerank itself is a pair
  //    of key-equality joins;
  //  - etl_drift attaches the 1-row baseline min/max and the 1-row
  //    totals to the bins-row frame — constant attaches.
  // Everything else must be key-partitioned or broadcast-hash.
  private val allPairsAllowed =
    Set("q_cross_join", "ann_topk", "ann_ivf", "corpus_tfidf",
      "corpus_lm_score", "corpus_bm25", "corpus_perplexity",
      "etl_surrogate_key", "ann_range", "ann_sq",
      "corpus_weighted_sample", "ann_ivfpq", "corpus_dsir",
      // ann_index_probe = ann_ivfpq's search served from the stored
      // model: same sanctioned cells-row coarse-assign broadcast
      "ann_refine", "etl_drift", "ann_index_probe",
      // ann_index_upsert = ann_index_probe over base ∪ delta: the same
      // sanctioned probe; ann_index_compact = the same probe again over
      // the compacted layout (compaction is staging, not the plan)
      "ann_index_compact",
      // stored-model probe (cells-row coarse-assign broadcast)
      "ann_index_upsert",
      // ann_negatives broadcasts the caller-bounded query set (the
      // ann_topk contract, plus a scan-stage label filter);
      // embed_kmeans / embed_semdedup broadcast k=8 centroid rows for
      // Lloyd/assignment (every vector scores all k by definition —
      // ann_ivf's sanctioned shape); semdedup's pairwise stage itself
      // is an equi-join on the cell id
      "ann_negatives", "embed_kmeans", "embed_semdedup",
      // corpus_ccnet_bucket = corpus_perplexity's frame + one ntile
      // window: inherits the same sanctioned 1-row vocab-size attach
      "corpus_ccnet_bucket",
      // the eval gates re-run sanctioned shapes to score them:
      // dedup_eval crosses three 1-row count aggregates (scalar
      // attach); ann_recall_eval runs ann_ivf's centroid broadcast and
      // ann_topk's query-set broadcast side by side
      "dedup_eval", "ann_recall_eval",
      // corpus_hybrid_rrf runs corpus_bm25's sanctioned 1-row
      // N/avgdl attach and adds its own 1-row query-norm attach; the
      // dense-side dim join and the 50×50 fusion join are equi-joins
      "corpus_hybrid_rrf",
      // corpus_perplexity_kn attaches the 1-row bigram-type total
      // (corpus_perplexity's vocab-scalar shape); corpus_zipf attaches
      // the 1-row token total to its top-k row set; q_basket_rules
      // attaches the 1-row basket total for the lift denominator
      "corpus_perplexity_kn", "corpus_zipf", "q_basket_rules",
      // graph_modularity attaches the 1-row edge total m; q_benford
      // the 1-row digit total
      "graph_modularity", "q_benford",
      // ann_mmr's shortlist is the ann_topk broadcast-query shape
      // (caller-bounded query side scored against the candidate scan);
      // the r9 form hid it behind a localCheckpoint lineage cut — the
      // r10 kernel removed the checkpoint, so the sweep now SEES the
      // sanctioned join instead of a truncated shell
      "ann_mmr",
      // approx_eval (the sketch QA gate) crosses two 1-row broadcasts:
      // the event total for support, and freqItems' single-row k-item
      // list — both scalar attaches; every other join is group-keyed
      "approx_eval",
      // corpus_temperature_mix attaches the 1-row Σw^α normalizer to
      // the |langs|-row aggregate — the corpus_tfidf constant-attach
      "corpus_temperature_mix")

  // streaming frames cannot be explained without starting a query; their
  // batch-equivalent shapes are covered by the stream_* batch oracles.
  //
  // KNOWN LIMIT of this sweep: iterative queries truncate lineage with
  // localCheckpoint, so executedPlan shows only the post-checkpoint
  // shell — the per-round join shapes of pageRank/PPR/CC/label-prop
  // live BEHIND the checkpoint and are audited by their own specs
  // (ErGraphSpec partitioning-independence + the PLANS.md plan audits),
  // not by this gate. Two queries are excluded outright because
  // CONSTRUCTING their DataFrame executes the whole driver-loop
  // pipeline (corpus_bpe_train runs its merge rounds, etl_forget its
  // stage-write+delete cycle) — their result frames are local/scan-only
  // relations with nothing left for this sweep to inspect.
  private val drivesOnBuild = Set("corpus_bpe_train", "etl_forget")
  private def explainable(name: String): Boolean =
    !name.startsWith("stream_") && !drivesOnBuild(name)

  test("no query plans BroadcastNestedLoopJoin or CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => explainable(name) && !allPairsAllowed(name) }
      .flatMap { case (name, fn) =>
        val plan =
          try fn(spark, sf0001).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
        if (plan.contains("BroadcastNestedLoopJoin") ||
            plan.contains("CartesianProduct") ||
            plan.startsWith("EXPLAIN FAILED"))
          Some(name -> plan.linesIterator
            .filter(l => l.contains("NestedLoop") || l.contains("Cartesian") ||
              l.startsWith("EXPLAIN FAILED"))
            .take(2).mkString(" | "))
        else None
      }
    assert(offenders.isEmpty,
      offenders.map { case (n, l) => s"$n: $l" }.mkString("\n"))
  }

  // the streaming sweep (r9 verdict #4): stream_* plans only exist on a
  // STARTED query, so every harness records its query's executed plan
  // (StreamingQuery.explain = the last IncrementalExecution) into
  // Streaming.lastPlans after termination; running each gate then
  // auditing the registry extends the no-NLJ invariant to the E-group.
  // Per-key caveats, not exclusions: the three foreachBatch harnesses
  // (dedup_probe, quarantine, upsert) record the STREAM side — the
  // batch work inside the batch function reuses batch shapes the main
  // sweep already audits; stream_session returns the typed BATCH
  // sessionization frame (its flatMapGroupsWithState twin runs in
  // StreamingSpec), so it is audited by the batch sweep above.
  test("every started streaming query's executed plan is NLJ/Cartesian-free") {
    graft.streaming.Streaming.lastPlans.clear()
    val gates = SparkEntry.queries.keys.filter(_.startsWith("stream_"))
      .toSeq.sorted
    // stream_txn_tail is the AvailableNow tail PUMP: it starts no
    // StreamingQuery — each micro-batch is a CDF read + Txn commit,
    // batch shapes the main sweep audits (TxnTail scaladoc).
    val batchOnly = Set("stream_session", "stream_txn_tail")
    val silent = gates.filterNot(batchOnly).flatMap { name =>
      val before = graft.streaming.Streaming.lastPlans.keySet.toSet
      SparkEntry.queries(name)(spark, sf0001).count()
      val added = graft.streaming.Streaming.lastPlans.keySet.toSet -- before
      if (added.isEmpty) Some(name) else None
    }
    assert(silent.isEmpty,
      s"gates that started no recorded streaming query: ${silent.mkString(",")}")
    val offenders = graft.streaming.Streaming.lastPlans.toSeq.filter {
      case (_, p) =>
        p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, offenders.map(_._1).mkString(","))
  }
}
