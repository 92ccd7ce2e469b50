package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph centrality over an edge list — PageRank with a
  * fixed iteration count. The natural consumer here is the dedup
  * family's pair graph ([[Dedup.simhashPairs]] etc.): rank inside a
  * near-duplicate cluster identifies the "center" template document
  * that spawned the variants, vs leaf one-off edits.
  *
  * Every iteration is two keyed shuffles (join contributions to edges,
  * aggregate by destination) — the standard BSP PageRank shape that
  * scales to billions of edges; nothing graph-shaped ever reaches the
  * driver (only the node COUNT, one scalar). Iterations unroll into
  * one declarative plan, each truncated with `localCheckpoint` so plan
  * depth and lineage stay O(1) per round (the [[Dedup.duplicateClusters]]
  * discipline).
  *
  * Determinism is FIXED-POINT, not decimal: mass is carried as BIGINT
  * nano-units (1 pr = 1e9). Per-edge contributions round once to an
  * integer, the per-destination reduction is an exact integer sum
  * (order-independent under any partitioning), and the damped update
  * is one IEEE expression rounded back to an integer. Rounding a
  * double to an INTEGER is the one rounding both engines perform
  * identically (halves at integer scale are exactly representable, and
  * both round them away from zero) — unlike round(x, 9), whose
  * internal algorithms differ at decimal half-ties (measured: 1-ulp
  * disagreements every ~20th value when 0.85·(k·1e-9) lands on an
  * exact decimal half). The r5 fix; the earlier decimal-at-scale-9
  * variant is gone.
  */
object Graph {
  /** `edges`: directed (src, dst) pairs, pre-deduplicated; pass both
    * directions for an undirected graph. Nodes = distinct sources
    * (every node of an undirected graph is a source; a directed sink
    * with no out-edges is out of scope for this variant — add
    * self-loops or pass the node list through `edges` to include it).
    * Returns (node, pr_nano BIGINT, pr DOUBLE = pr_nano / 1e9). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      "iterations must be in [1, 20]")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = deg.select(col("src").as("node")).localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    var pr = nodes.withColumn("pr_n",
      round(lit(1.0e9 / n)).cast("long"))
    for (_ <- 1 to iterations) {
      val contrib = pr
        .join(deg, pr("node") === deg("src"))
        .join(e, "src")
        .select(col("dst"),
          round(col("pr_n").cast("double") / col("outdeg"))
            .cast("long").as("c"))
      val sums = contrib.groupBy("dst").agg(sum(col("c")).as("sv"))
      pr = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) * 1.0e9 / n) +
            lit(damping) * coalesce(col("sv"), lit(0L)).cast("double"))
            .cast("long").as("pr_n"))
        .localCheckpoint()
    }
    pr.select(col("node"), col("pr_n").as("pr_nano"),
      (col("pr_n").cast("double") / 1.0e9).as("pr"))
  }
}
