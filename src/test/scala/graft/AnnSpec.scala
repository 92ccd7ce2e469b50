package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (10L, Array(1.0f, 0.0f)),
    (11L, Array(0.8f, 0.6f)),
    (12L, Array(0.0f, 1.0f)),
    (13L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")
  private val qs = Seq((1L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val out = Ann.bruteForceTopK(qs, base, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(out.head.getDouble(3) > 0.99)
  }

  test("lsh bucket is deterministic: identical vectors always collide") {
    val once = base.select(col("vec_id"), Ann.lshBucket("embedding").as("b"))
    val twice = once.union(once).distinct()
    // re-hashing the same vectors adds no new buckets per id
    assert(twice.count() == once.count())
    // opposite vectors land in complementary buckets (not the same one)
    val byId = once.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(10L) != byId(13L))
  }

  test("lshTopK reranks bucket candidates exactly") {
    // query identical to candidate 10 → same bucket, rank 1, cos ~1
    val q = Seq((2L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Ann.lshTopK(q, base, "vec_id", "embedding", 2).collect()
    assert(out.nonEmpty)
    val top = out.minBy(_.getInt(2))
    assert(top.getLong(1) == 10L && top.getDouble(3) == 1.0)
  }
}
