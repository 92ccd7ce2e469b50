package graft

import org.apache.spark.sql.functions._
import graft.operators.{Er, Graph}

class ErGraphSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyMatchPairs: matches within blocks only, ordered, thresholded") {
    val df = Seq(
      (1L, "smith john", "NY"), (2L, "smith jonn", "NY"), // lev 1 → match
      (3L, "smith john", "CA"),                           // other block
      (4L, "doe jane", "NY"),                             // lev > 2 from smiths
      (5L, "doe janet", "NY")                             // lev 1 from doe jane
    ).toDF("id", "name", "state")
    val out = Er.fuzzyMatchPairs(df, "id", "name", Seq("state"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 2L, 1), (4L, 5L, 1)))
  }

  test("fuzzyMatchPairs: NULL block values pair with no one") {
    val df = Seq(
      (1L, "a", Some("x")), (2L, "a", Some("x")),
      (3L, "a", None: Option[String]), (4L, "a", None: Option[String])
    ).toDF("id", "name", "blk")
    val out = Er.fuzzyMatchPairs(df, "id", "name", Seq("blk"), 0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("fuzzyMatchPairs: oversize block fails fast with the block named") {
    val df = (1 to 10).map(i => (i.toLong, s"n$i", "big")).toDF("id", "name", "b")
    val ex = intercept[Exception] {
      Er.fuzzyMatchPairs(df, "id", "name", Seq("b"), 1, maxBlock = 5).collect()
    }
    assert(ex.getMessage.contains("exceeds maxBlock"))
  }

  test("clusterIds: transitive chains resolve to one entity; singletons kept") {
    val df = Seq(
      (1L, "smith john", "NY"), (2L, "smith jonn", "NY"),
      (3L, "smith joon", "NY"),  // chains to 1 via 2 (1~2, 2~3; 1~3 lev 2 too)
      (4L, "doe jane", "NY"),    // singleton
      (5L, "doe janet", "NY")    // pairs with 4
    ).toDF("id", "name", "state")
    val pairs = Er.fuzzyMatchPairs(df, "id", "name", Seq("state"), 1)
    val out = Er.clusterIds(df, "id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lev(smith john, smith joon) = 2 > 1, so 1~3 only via the chain
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L,
      s"chain did not collapse: $out")
    assert(out(4L) == 4L && out(5L) == 4L)
    // every input row appears exactly once, singletons included
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("pageRank: symmetric pair ranks equal, hub outranks leaves") {
    // star: 1 - 2, 1 - 3, 1 - 4 (undirected) plus isolated pair 5 - 6
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("a", "b")
    val edges = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b")))
    val pr = Graph.pageRank(edges, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pr.size == 6)
    assert(pr(1L) > pr(2L))                  // hub beats leaf
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L)) // symmetric leaves tie
    assert(pr(5L) == pr(6L))                 // isolated pair symmetric
    assert(pr(1L) > pr(5L))
    // probability mass stays ~1 (rounding noise only)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("pageRank: result is independent of input partitioning") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("a", "b")
    val edges = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b")))
    val one = Graph.pageRank(edges.repartition(1), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Graph.pageRank(edges.repartition(7), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("triangles: K4 + path, any edge orientation, duplicates dropped") {
    // K4 on 1-4 (one edge given twice, one reversed) and a path 5-6-7:
    // every K4 node sits in C(3,2)=3 triangles at degree 3 → clustering
    // 1.0; the path closes nothing → clustering 0.0
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 3L),                       // duplicate
      (5L, 6L), (7L, 6L)
    ).toDF("a", "b")
    val out = Graph.triangles(pairs, "a", "b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    (1L to 4L).foreach { n => assert(out(n) == ((3L, 3L, 1.0)), s"node $n") }
    assert(out(5L) == ((1L, 0L, 0.0)))
    assert(out(6L) == ((2L, 0L, 0.0)))
    assert(out(7L) == ((1L, 0L, 0.0)))
  }

  test("triangles: independent of partitioning; hub skew handled") {
    // hub 0 connected to 1..20, plus one closing edge 1-2: exactly one
    // triangle (0,1,2) despite the degree-20 hub
    val pairs = ((1L to 20L).map(i => (0L, i)) :+ (1L, 2L)).toDF("a", "b")
    val t1 = Graph.triangles(pairs.repartition(1), "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val t7 = Graph.triangles(pairs.repartition(7), "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t1 == t7)
    assert(t1.filter(_._3 > 0).map(t => t._1 -> t._3) ==
      Set(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  /** Local fixed-point replica of pageRank's exact nano-unit contract
    * (same expression order, same double→integer rounding points) —
    * the cross-check that pins the dangling-mass arithmetic. */
  private def prReplica(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var pr = nodes.map(v => v -> math.round(1.0e9 / n)).toMap
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).map { case (t, es) =>
        t -> es.map { case (s, _) => math.round(pr(s).toDouble / outdeg(s)) }.sum
      }
      val dang = nodes.filterNot(outdeg.contains).map(pr).sum
      val ds = math.round(dang.toDouble / n)
      pr = nodes.map(v => v -> math.round((1.0 - d) * 1.0e9 / n +
        d * (sums.getOrElse(v, 0L) + ds).toDouble)).toMap
    }
    pr
  }

  test("pageRank: sinks redistribute mass; rank is conserved") {
    // directed: 3 -> 1, 1 -> {10, 11}, 2 -> 10; 10 and 11 are true
    // sinks (no out-edges), 3 is a source
    val es = Seq((3L, 1L), (1L, 10L), (1L, 11L), (2L, 10L))
    val out = Graph.pageRank(es.toDF("src", "dst"), "src", "dst",
        iterations = 3, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node universe = src ∪ dst, sinks included
    assert(out.keySet == Set(1L, 2L, 3L, 10L, 11L))
    // bit-exact vs the local replica of the integer contract
    assert(out == prReplica(es, 3, 0.85))
    // dangling redistribution conserves total mass up to per-step
    // integer rounding (without it, the sinks leak ~their whole rank)
    assert(math.abs(out.values.sum - 1000000000L) < 100L)
    // the double-sink 10 outranks the single-parent sink 11
    assert(out(10L) > out(11L))
  }

  test("pageRank: sink-free graph reduces to the non-dangling update") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
    val es = pairs ++ pairs.map(_.swap)
    val out = Graph.pageRank(es.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == prReplica(es, 3, 0.85))
    // replica with the dangling term hard-dropped agrees: dang == 0
    val noDangReplica = {
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val n = nodes.size
      val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size }
      var pr = nodes.map(v => v -> math.round(1.0e9 / n)).toMap
      for (_ <- 1 to 3) {
        val sums = es.groupBy(_._2).map { case (t, g) =>
          t -> g.map { case (s, _) => math.round(pr(s).toDouble / outdeg(s)) }.sum
        }
        pr = nodes.map(v => v -> math.round(0.15 * 1.0e9 / n +
          0.85 * sums.getOrElse(v, 0L).toDouble)).toMap
      }
      pr
    }
    assert(out == noDangReplica)
  }

  test("pageRank: sink graph result independent of input partitioning") {
    val es = Seq((3L, 1L), (1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val one = Graph.pageRank(es.repartition(1), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Graph.pageRank(es.repartition(7), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("personalizedPageRank: seeds == all nodes reduces to pageRank") {
    // with a uniform teleport over every node, PPR IS PageRank: same
    // init, same teleport term, same dangling redistribution
    val es = Seq((3L, 1L), (1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val allNodes = es.select(col("src").as("n"))
      .unionAll(es.select(col("dst").as("n"))).distinct()
    val ppr = Graph.personalizedPageRank(es, "src", "dst", allNodes, "n", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRank(es, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr)
  }

  test("personalizedPageRank: mass concentrates near seeds; conserved") {
    // two disconnected directed cycles; seeding only the first means
    // the second component must end with exactly zero rank
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L))
    val seeds = Seq(1L).toDF("s")
    val out = Graph.personalizedPageRank(es.toDF("src", "dst"), "src", "dst",
        seeds, "s", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 10L, 11L))
    assert(out(10L) == 0L && out(11L) == 0L,
      "rank leaked into the unseeded component")
    // cycle graph has no sinks: mass conserved up to per-step rounding
    assert(math.abs(out.values.sum - 1000000000L) < 100L)
    // proximity ordering: the seed holds the teleport mass, its direct
    // successor beats the two-hop node
    assert(out(1L) > out(2L) && out(2L) > out(3L))
    // an isolated seed (not in the edge list) still appears and holds
    // teleport mass
    val out2 = Graph.personalizedPageRank(es.toDF("src", "dst"), "src", "dst",
        Seq(1L, 99L).toDF("s"), "s", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2.contains(99L) && out2(99L) > 0L)
  }

  test("personalizedPageRank: dangling mass returns to seeds; partitioning-independent") {
    // 1 -> 10, 10 is a sink: its mass must flow back to the seed only
    val es = Seq((1L, 10L)).toDF("src", "dst")
    val one = Graph.personalizedPageRank(es.repartition(1), "src", "dst",
        Seq(1L).toDF("s"), "s", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Graph.personalizedPageRank(es.repartition(7), "src", "dst",
        Seq(1L).toDF("s"), "s", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
    assert(math.abs(one.values.sum - 1000000000L) < 100L)
    intercept[IllegalArgumentException](
      Graph.personalizedPageRank(es, "src", "dst",
        Seq.empty[Long].toDF("s"), "s", 3))
  }

  test("labelPropagation: clamped seeds, majority vote, hop-bounded reach") {
    // chain 1-2-3-4-5 with seed labels at the ends: 1='a', 5='b';
    // 3 hops reach everything; majority/tie rules decide the middle
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val seeds = Seq((1L, "a"), (5L, "b")).toDF("n", "lab")
    val out = Graph.labelPropagation(es, "u", "v", seeds, "n", "lab", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(out(1L) == (("a", true)) && out(5L) == (("b", true)))
    assert(out(2L) == (("a", false)))
    // node 3: one 'a' neighbor, one 'b' neighbor — tie breaks to 'a';
    // then in round 3 node 4 sees 3='a', 5='b' — tie again, so the
    // ascending-label rule lets 'a' invade 4 as well (synchronous
    // recompute, deterministic — the oracle replays it identically)
    assert(out(3L) == (("a", false)))
    assert(out(4L) == (("a", false)))
    // seeds never flip even when outvoted: 2 is 'a'-seeded with two
    // 'b' neighbors
    val es2 = Seq((1L, 2L), (3L, 2L)).toDF("u", "v")
    val out2 = Graph.labelPropagation(es2, "u", "v",
      Seq((1L, "b"), (3L, "b"), (2L, "a")).toDF("n", "lab"), "n", "lab", 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2(2L) == "a")
    // unreached nodes carry no row: isolated edge far from any seed
    val es3 = Seq((1L, 2L), (10L, 11L)).toDF("u", "v")
    val out3 = Graph.labelPropagation(es3, "u", "v",
      Seq((1L, "x")).toDF("n", "lab"), "n", "lab", 3)
      .collect().map(_.getLong(0)).toSet
    assert(out3 == Set(1L, 2L))
  }

  test("shortestHops: exact BFS levels, hop bound, min over multiple paths") {
    // chain 1-2-3-4-5-6 plus shortcut 1-4: node 4 is 1 hop via the
    // shortcut (not 3 via the chain); 6 is 3 hops (4-5-6); with
    // maxHops=3 every node is reachable from seed 1 except none
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 4L))
      .toDF("u", "v")
    val out = Graph.shortestHops(es, "u", "v", Seq(1L).toDF("n"), "n", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2, 6L -> 3))
    // the bound truncates reach: maxHops=1 sees only direct neighbors
    val near = Graph.shortestHops(es, "u", "v", Seq(1L).toDF("n"), "n", 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(near == Map(1L -> 0, 2L -> 1, 4L -> 1))
    // multiple seeds take the min over seeds; partitioning-independent
    val multi = Graph.shortestHops(es.repartition(7), "u", "v",
      Seq(1L, 6L).toDF("n"), "n", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(multi(5L) == 1 && multi(4L) == 1 && multi(3L) == 2)
  }

  test("labelPropagation is independent of input partitioning") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 5L)).toDF("u", "v")
    val seeds = Seq((1L, "a"), (4L, "b")).toDF("n", "lab")
    def run(e: org.apache.spark.sql.DataFrame) =
      Graph.labelPropagation(e, "u", "v", seeds, "n", "lab", 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(run(es.repartition(1)) == run(es.repartition(7)))
  }

  test("pageRank: guards on empty graph and bad parameters") {
    val e = Seq.empty[(Long, Long)].toDF("a", "b")
    intercept[IllegalArgumentException](Graph.pageRank(e, "a", "b", 3))
    val ok = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException](Graph.pageRank(ok, "a", "b", 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(ok, "a", "b", 3, damping = 1.0))
  }

  test("hierarchyClosure: roots, depths, forests; cycles fail loudly") {
    // forest: chain 1<-2<-3<-4<-5 plus a second tree 10<-11, 10<-12
    val edges = Seq(
      (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (11L, 10L), (12L, 10L)
    ).toDF("child", "parent")
    val out = Graph.hierarchyClosure(edges, "child", "parent")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out == Map(
      1L -> ((1L, 0)), 2L -> ((1L, 1)), 3L -> ((1L, 2)),
      4L -> ((1L, 3)), 5L -> ((1L, 4)),
      10L -> ((10L, 0)), 11L -> ((10L, 1)), 12L -> ((10L, 1))))
    // depth 16 chain converges in ~5 doubling rounds, well under the cap
    val deep = (2L to 17L).map(i => (i, i - 1)).toDF("child", "parent")
    val deepOut = Graph.hierarchyClosure(deep, "child", "parent")
      .where(col("node") === 17L).head()
    assert(deepOut.getLong(1) == 1L && deepOut.getInt(2) == 16)
    // a cycle pointer-doubles into a STABLE self-pointer at nonzero
    // distance (not non-convergence!) — the post-loop check must catch
    // it rather than silently reporting cycle members as their own roots
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("child", "parent")
    val err = intercept[IllegalArgumentException](
      Graph.hierarchyClosure(cyc, "child", "parent", maxRounds = 5))
    assert(err.getMessage.contains("cycle"))
    // an ODD-length cycle never stabilizes under pointer doubling —
    // the loop exhausts maxRounds instead; that error must ALSO name
    // cycles as a cause, not just suggest a deeper tree
    val odd = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("child", "parent")
    val errOdd = intercept[IllegalArgumentException](
      Graph.hierarchyClosure(odd, "child", "parent", maxRounds = 5))
    assert(errOdd.getMessage.contains("no convergence") &&
      errOdd.getMessage.contains("cycle"))
  }

  test("neighborJaccard counts common neighbors, adjacent or not") {
    // triangle 1-2-3 plus pendant 3-4:
    //   N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val out = Graph.neighborJaccard(pairs, "doc_a", "doc_b", minCommon = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // (1,4) and (2,4) are NOT adjacent yet share neighbor 3 — the
    // predicted links; jac = 1/(2+1-1) = 0.5
    assert(out((1L, 4L)) == ((1L, 0.5)) && out((2L, 4L)) == ((1L, 0.5)))
    // adjacent pairs: (1,2) share {3}: 1/(2+2-1); (1,3)/(2,3) share one
    assert(out((1L, 2L)) == ((1L, 0.3333)))
    assert(out((1L, 3L)) == ((1L, 0.25)) && out((2L, 3L)) == ((1L, 0.25)))
    assert(!out.contains((3L, 4L)), "no shared neighbor, no row")
    // direction/duplication of the input pair list must not matter
    val noisy = pairs.unionAll(
      Seq((2L, 1L), (3L, 1L)).toDF("doc_a", "doc_b"))
    val out2 = Graph.neighborJaccard(noisy, "doc_a", "doc_b", minCommon = 1)
    assert(out2.count() == out.size)
  }

  test("neighborJaccardGrouped == doc-level op on a dup-heavy graph") {
    import graft.operators.Dedup
    // triple every 7th doc: real duplicate multiplicity through the
    // sketch family — the gid-collapsed formulas must reproduce the
    // doc-level wedge join exactly (intra-clique pairs, adjacency
    // corrections, weighted external wedges)
    val base = Tables.documents(spark, sf0001).select("doc_id", "text")
    val dup1 = base.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val dup2 = base.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val df = base.unionByName(dup1).unionByName(dup2)
    val docLevel = Graph.neighborJaccard(
      Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 8),
      "doc_a", "doc_b", minCommon = 2)
    val st = Dedup.simhashStages(df, "doc_id", "text", maxHamming = 8)
    val grouped = Graph.neighborJaccardGrouped(
      st.gidPairs, "gid_a", "gid_b", st.members, "id", "gid",
      minCommon = 2)
    assert(docLevel.exceptAll(grouped).isEmpty &&
      grouped.exceptAll(docLevel).isEmpty)
    assert(grouped.count() > 0)
  }

  test("goldenRecords: modal segment, shortest-lex name, max balance, min id") {
    val mem = Seq(
      (1L, 1L, "Bobby", "A", 10.0), (1L, 2L, "Bob", "B", 30.0),
      (1L, 3L, "Bobb", "B", 20.0),
      (5L, 5L, "Al", "A", 1.0), (5L, 6L, "Al", "B", 1.0), // seg tie → A
      (9L, 9L, "Zed", "C", 5.0)
    ).toDF("cluster_id", "id", "nm", "seg", "bal")
    val out = Er.goldenRecords(mem, "cluster_id", "id", "nm", "seg", "bal")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getDouble(5)))).toMap
    assert(out == Map(
      1L -> ((3L, 1L, "Bob", "B", 30.0)),
      5L -> ((2L, 5L, "Al", "A", 1.0)),
      9L -> ((1L, 9L, "Zed", "C", 5.0))))
    val re = Er.goldenRecords(mem.repartition(7), "cluster_id", "id",
        "nm", "seg", "bal")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(re == Map(1L -> "Bob", 5L -> "Al", 9L -> "Zed"))
  }

  test("kCore: peels pendants and chains, keeps the triangle, converges") {
    // triangle {1,2,3} + pendant 4-1 + chain 5-6, with a duplicate row
    // AND a reversed duplicate (3,2) — both must collapse under the
    // canonical orientation, or degrees double-count and a lone
    // bidirectional edge would fake a 2-core
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L),
      (1L, 2L), (3L, 2L)).toDF("a", "b")
    def run(r: Int) = Graph.kCore(edges, "a", "b", k = 2, rounds = r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val core = run(4)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // monotone: extra rounds after convergence are no-ops
    assert(run(6) == core)
    // k above the densest degree empties the graph
    assert(Graph.kCore(edges, "a", "b", k = 3, rounds = 4).count() == 0)
    // the review's exact hazard: ONE edge listed in both directions is
    // one undirected edge (degree 1 each side), never a 2-core
    val sym = Seq((7L, 8L), (8L, 7L)).toDF("a", "b")
    assert(Graph.kCore(sym, "a", "b", k = 2, rounds = 2).count() == 0)
    // partition-count independence
    assert(Graph.kCore(edges.repartition(7), "a", "b", k = 2, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap == core)
  }

  test("modularityParts: exact rational parts, unlabeled mass in m only") {
    // path 1-2-3-4-5 (a<b rows, one duplicate to collapse); labels
    // x={1,2}, y={3,4}, node 5 unlabeled: m=4, degrees 1,2,2,2,1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 2L))
      .toDF("a", "b")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"))
      .toDF("id", "c")
    val out = Graph.modularityParts(edges, "a", "b", labels, "id", "c")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          r.getDecimal(3).longValueExact(),
          r.getDecimal(4).longValueExact()))).toMap
    // x: e_within=1 (1-2), d_sum=3 → 4·4·1−9=7,  q_den=64
    // y: e_within=1 (3-4), d_sum=4 → 4·4·1−16=0; node 5 only feeds m
    assert(out == Map(
      "x" -> ((1L, 3L, 7L, 64L)),
      "y" -> ((1L, 4L, 0L, 64L))))
    // Q recovers from the parts: (7+0)/64 = 1/3·1 − (3/8)² + 1/4 − (4/8)²
    assert(out.values.map(_._3).sum.toDouble / 64 ==
      (1.0 / 4 - 9.0 / 64) + (1.0 / 4 - 16.0 / 64))
    // partition-count independence
    val re = Graph.modularityParts(edges.repartition(5), "a", "b",
        labels.repartition(3), "id", "c")
      .collect().map(r => r.getString(0) ->
        r.getDecimal(3).longValueExact()).toMap
    assert(re == Map("x" -> 7L, "y" -> 0L))
  }
}
