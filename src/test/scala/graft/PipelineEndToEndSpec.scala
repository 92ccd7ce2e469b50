package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.Dedup
import graft.pipeline.Xf
import graft.sinks.ParquetSink

/** The whole training-data story in one flow — what a user of this
  * library actually runs at corpus scale: near-dup detection → cluster
  * resolution → canonical filtering → quality gating → PII scrubbing →
  * deterministic sampling → columnar sink. Every stage is one of the
  * gate-checked operators; this spec checks they COMPOSE (schemas line
  * up, row accounting holds, nothing recomputes or drops silently).
  */
class PipelineEndToEndSpec extends SparkSpec {

  test("corpus pipeline: dedup -> canonical -> quality -> mask -> sample -> sink") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.count()

    // near-dups → clusters → one canonical doc per cluster
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
    val clusters = Dedup.duplicateClusters(pairs, "doc_a", "doc_b")
    val canonical = Dedup.keepCanonical(docs, "doc_id", clusters)
    val nCanonical = canonical.count()
    val nLosers = clusters.where(col("doc_id") =!= col("cluster_id")).count()
    assert(nCanonical == total - nLosers)
    assert(nCanonical > 0 && nLosers > 0) // the sf0.001 corpus has near-dups

    // quality gate + PII scrub + reproducible 50% sample
    val kept = canonical
      .select(col("doc_id"), col("lang"),
        TextAnalysis.maskPii(col("text")).as("text"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .where(col("n_tokens") >= 3)
    val sampled = Xf.sampleHash(col("doc_id"), 50)(kept)
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled <= kept.count())
    // determinism: the same pipeline yields the same sample
    assert(Xf.sampleHash(col("doc_id"), 50)(kept).count() == nSampled)

    // sink: observe()-counted write matches what we sampled
    val out = Files.createTempDirectory("graft-e2e").toString
    assert(ParquetSink(s"$out/corpus").write(sampled) == nSampled)
    val back = spark.read.parquet(s"$out/corpus")
    assert(back.count() == nSampled)
    assert(back.schema.fieldNames.toSet ==
      Set("doc_id", "lang", "text", "n_tokens"))
    // canonical filtering really dropped the cluster losers
    val loserIds = clusters.where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(back.select("doc_id").collect().map(_.getLong(0))
      .forall(!loserIds.contains(_)))
  }
}
