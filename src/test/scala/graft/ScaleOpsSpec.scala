package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sinks.BucketedParquetSink

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain-join rows") {
    // skewed fact: key 1 holds 90% of rows
    val fact = (Seq.fill(90)(1) ++ (2 to 11)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("fk", "payload")
    val dim = (1 to 11).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val salted = Skew.saltedJoin(fact, dim, "fk", "dk", buckets = 8)
      .select("fk", "payload", "name").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && salted.size == 100)
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val fact = (1 to 1000).map(i => (1, i.toLong)).toDF("fk", "payload")
    val spread = fact
      .withColumn("s", pmod(xxhash64(col("fk"), col("payload")), lit(8)))
      .select("s").distinct().count()
    assert(spread == 8) // all 8 sub-keys occupied
  }

  test("RangeJoin equals the naive inequality join, without a nested loop") {
    import graft.operators.RangeJoin
    val events = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "ts")
    val win = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("w_start"), expr("ts + INTERVAL '2' HOUR").as("w_end"))
    val binned = RangeJoin.pointInInterval(events, win,
      "user_id", "p_user", "ts", "w_start", "w_end",
      binMicros = 2L * 3600 * 1000000L)
    val naive = events.join(win,
      col("user_id") === col("p_user") &&
        col("ts") >= col("w_start") && col("ts") <= col("w_end"))
    val b = binned.select("event_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val n = naive.select("event_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(b == n && b.nonEmpty)
    // each qualifying pair meets exactly once (no dedup in the operator)
    assert(b.distinct.size == b.size)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlap equals the naive overlap join, one row per pair") {
    import graft.operators.RangeJoin
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("ps"), expr("ts + INTERVAL 2 HOUR").as("pe"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        col("ts").as("cs"), expr("ts + INTERVAL 1 HOUR").as("ce"))
    val binned = RangeJoin.intervalOverlap(p, c, "user_id", "cu",
        "ps", "pe", "cs", "ce", binMicros = 3600000000L)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = p.join(c, col("user_id") === col("cu") &&
        col("ps") < col("ce") && col("cs") < col("pe"))
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // set equality AND multiplicity: the later-start-bin rule must
    // yield each overlapping pair exactly once, with no DISTINCT node
    assert(binned.sorted.toSeq == naive.sorted.toSeq)
    val plan = RangeJoin.intervalOverlap(p, c, "user_id", "cu",
      "ps", "pe", "cs", "ce", 3600000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("bucketed tables join without an exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    // a dropped catalog entry does not remove the warehouse dir from a
    // previous JVM — clear it or saveAsTable hits LOCATION_ALREADY_EXISTS
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("graft_bkt_orders", "graft_bkt_lineitem").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    BucketedParquetSink("graft_bkt_orders", Seq("o_orderkey"), 4,
      sortCols = Seq("o_orderkey")).write(orders)
    BucketedParquetSink("graft_bkt_lineitem", Seq("l_orderkey"), 4,
      sortCols = Seq("l_orderkey")).write(lineitem)
    // force the sort-merge path: broadcast would bypass bucketing here
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // and it still computes the right thing
      val expected = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned scans prune dynamically from a dimension filter") {
    // Dynamic partition pruning: the 100 TB fact table is partitioned
    // on a key; a selective dim filter must prune fact PARTITIONS at
    // runtime (no static literal exists at plan time). Without DPP a
    // dim-filtered star join scans the whole fact table.
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").partitionBy("o_orderpriority")
      .parquet(s"$dir/fact")
    // the dim must be a real scan: over a local relation the tier
    // filter constant-folds away and the DPP rule sees no build-side
    // Filter to derive a pruning subquery from
    Seq(("1-URGENT", "hot"), ("5-LOW", "cold")).toDF("pri", "tier")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = spark.read.parquet(s"$dir/fact")
      .join(dim.where(col("tier") === "hot"),
        col("o_orderpriority") === col("pri"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    // prunes to exactly the URGENT partition's rows
    val expected = Tables.orders(spark, sf0001)
      .where(col("o_orderpriority") === "1-URGENT").count()
    assert(joined.count() == expected)
  }

  test("runtime bloom filter prunes the shuffle side of a selective join") {
    // Row-level runtime filtering: when a shuffle join's build side is
    // selective, Spark injects a bloom-filter aggregate on it and
    // pre-filters the probe side BEFORE the probe's shuffle — at 100 TB
    // this is the difference between shuffling the whole fact table and
    // shuffling the matching slice. Thresholds drop to test scale.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_quantity")
      val sel = Tables.orders(spark, sf0001)
        .where(col("o_totalprice") > 500000).select("o_orderkey")
      val joined = fact.join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"), plan)
      val expected = Tables.lineitem(spark, sf0001).as("l")
        .join(Tables.orders(spark, sf0001).where(col("o_totalprice") > 500000),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("binned percentile matches PERCENTILE exactly, without its buffer") {
    import graft.operators.Percentile
    val orders = Tables.orders(spark, sf0001)
    val got = Percentile.binned(orders, "o_orderpriority", "o_totalprice",
        Seq(0.5, 0.9), bins = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val want = orders.groupBy("o_orderpriority")
      .agg(expr("CAST(ROUND(PERCENTILE(o_totalprice, 0.5), 2) AS DOUBLE)").as("m"),
        expr("CAST(ROUND(PERCENTILE(o_totalprice, 0.9), 2) AS DOUBLE)").as("p90"))
      .collect().flatMap(r => Seq(
        (r.getString(0), 0.5) -> r.getDouble(1),
        (r.getString(0), 0.9) -> r.getDouble(2))).toMap
    assert(got == want, s"binned $got vs exact $want")
    // the at-scale plan must never contain the value-map PERCENTILE
    // aggregate — buffers stay counters, order statistics come from a
    // spillable window sort
    val plan = Percentile.binned(orders, "o_orderpriority", "o_totalprice",
      Seq(0.5)).queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("percentile("), plan)
  }

  test("bm25: term filter precedes the aggregate; top-k is a heap, not a sort") {
    import graft.operators.Corpus
    val docs = Tables.documents(spark, sf0001)
    val qe = Corpus.bm25(docs, "doc_id", "text", Seq("vector", "hash"), 5)
      .queryExecution
    // the corpus-sized token stream must die at the scan stage: the IN
    // filter sits under the tf aggregate, not above it
    assert(qe.optimizedPlan.toString.contains("IN (vector,hash)"))
    // orderBy+limit plans as TakeOrderedAndProject (per-partition heaps
    // + k-row driver merge); a global Sort here would be the scale bug
    assert(qe.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("knnGraph: bucket self-join co-partitions, never nested-loops") {
    import graft.operators.Ann
    val e = Tables.embeddings(spark, sf0001)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast: this is the shape the join takes when both
      // sides are corpus-sized (the query set IS the corpus here)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Ann.knnGraph(e, "vec_id", "embedding", k = 3, probes = 2)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(500))
      assert(plan.contains("hashpartitioning(bkt") &&
        plan.contains("hashpartitioning(probe_bkt"), plan.take(500))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("surrogate keys: the data-path window is keyed; only the " +
      "bucket-offset table single-partitions") {
    import graft.operators.Keys
    val plan = Keys.surrogate(Tables.part(spark, sf0001), "p_name")
      .queryExecution.executedPlan.toString
    // per-bucket row_number is partitioned by the bucket key — the rank
    // over the key set runs in parallel
    assert("windowspecdefinition\\(gb#\\d+L, nat#".r
      .findFirstIn(plan).isDefined, plan.take(800))
    // exactly one SinglePartition exchange: the <= buckets-row offsets
    // cumulative — metadata, never the key set
    assert("Exchange SinglePartition".r.findAllIn(plan).size == 1,
      plan.take(800))
  }

  test("binned percentile: degenerate and single-row groups") {
    import graft.operators.Percentile
    import spark.implicits._
    val df = Seq(
      ("a", 5.0), ("a", 5.0), ("a", 5.0), // mn == mx
      ("b", 1.0),                         // n == 1
      ("c", 1.0), ("c", 2.0), ("c", 3.0), ("c", 4.0)
    ).toDF("g", "v")
    val got = Percentile.binned(df, "g", "v", Seq(0.5), bins = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 5.0, "b" -> 1.0, "c" -> 2.5))
  }

  test("interleave16 matches a reference Morton implementation") {
    import graft.functions.ZOrder
    import spark.implicits._
    def mortonRef(x: Int, y: Int): Long = {
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((x.toLong >> i) & 1L) << (2 * i)
        z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (65535, 0), (255, 256))
    val got = cases.toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map { case (x, y) => mortonRef(x, y) })
  }

  test("stringCoord: order-preserving, prefix-strip aware, bit-identical to its driver twin") {
    import graft.functions.ZOrder
    import spark.implicits._
    // tricky orderings: shorter-is-prefix ("ab" < "b" after padding),
    // multi-byte UTF-8, equal-past-7-bytes collapse, empty string
    val vals = Seq("", "a", "ab", "aba", "b", "zz", "ませ", "まa",
      "2024-01-05", "2024-01-15", "2024-01-30", "longprefix1",
      "longprefix2")
    for (skip <- Seq(0, 5)) {
      val engine = vals.toDF("s")
        .select(ZOrder.stringCoord(col("s"), skip).as("c"))
        .collect().map(_.getDouble(0))
      val driver = vals.map(ZOrder.stringCoordValue(_, skip))
      assert(engine.toSeq == driver,
        s"engine/driver coordinate mismatch at skip=$skip")
    }
    // monotone in binary UTF8 order (skip=0): sort by coordinate must
    // never INVERT a strict byte-order relation (ties allowed — the
    // 7-byte collapse)
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val sorted = vals.sortWith((a, b) => u8(a).compareTo(u8(b)) < 0)
    val coords = sorted.map(ZOrder.stringCoordValue(_, 0))
    assert(coords.zip(coords.tail).forall { case (a, b) => a <= b },
      s"coordinate order inverted: ${sorted.zip(coords)}")
  }

  test("clusterBy yields range-disjoint, internally sorted z-partitions") {
    import graft.functions.ZOrder
    val df = Tables.orders(spark, sf0001)
    val clustered = ZOrder.clusterBy(df,
      col("o_custkey") % 65536,
      datediff(col("o_orderdate"), to_date(lit("1992-01-01"))) % 65536,
      numFiles = 4)
    // recompute z on the clustered output and take per-partition ranges
    val z = ZOrder.interleave16(col("o_custkey") % 65536,
      datediff(col("o_orderdate"), to_date(lit("1992-01-01"))) % 65536)
    val ranges = clustered
      .select(spark_partition_id().as("pid"), z.as("z"))
      .groupBy("pid").agg(min("z").as("mn"), max("z").as("mx"))
      .orderBy("mn")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.nonEmpty && ranges.length <= 4)
    // disjoint: each partition's min exceeds the previous partition's max
    ranges.sliding(2).foreach {
      case Array((_, mxA), (mnB, _)) => assert(mxA <= mnB,
        s"overlapping z-ranges: $ranges")
      case _ => ()
    }
    // the layout payoff: per-file min/max on BOTH source columns are
    // tighter than the global range (files can be skipped on either)
    val spans = clustered
      .select(spark_partition_id().as("pid"),
        (col("o_custkey") % 65536).as("x"))
      .groupBy("pid").agg((max("x") - min("x")).as("span"))
      .collect().map(_.getLong(1))
    val globalSpan = df.select(
        (max(col("o_custkey") % 65536) - min(col("o_custkey") % 65536)))
      .head().getLong(0)
    assert(spans.exists(_ < globalSpan),
      s"no partition has a tighter custkey span than global $globalSpan")
  }

  test("q_join_bucketed: the only exchange is the post-join aggregate") {
    val df = QueriesCore.queries("q_join_bucketed")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected 1 exchange (final agg), got $exchanges:\n$plan")
  }

  test("rowChecksum aggregates are order- and partitioning-independent") {
    import graft.functions.Hashes
    val base = Tables.lineitem(spark, sf0001)
    def sums(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ck", Hashes.rowChecksum(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag")))
      .agg(sum(col("ck").cast("decimal(38,0)")).as("s"),
        expr("BIT_XOR(ck)").as("x"))
      .head()
    assert(sums(base) == sums(base.repartition(13).sortWithinPartitions("l_quantity")))
  }

  test("sessionize plans exactly one exchange: both roll-ups reuse the window's user partitioning") {
    val df = Tables.events(spark, sf0001)
    val plan = graft.operators.Analytics
      .sessionize(df, "user_id", "ts", 1800000000L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("stratifiedSplit is row-local: no exchange, evaluates in the scan stage") {
    val df = Tables.documents(spark, sf0001)
    val plan = graft.operators.Corpus
      .stratifiedSplit(df, "doc_id", "split",
        Seq("train" -> 80, "val" -> 90, "test" -> 100))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
  }

  test("deltaEmbedding: equi-joins only, band tables carry no vectors") {
    val e = Tables.embeddings(spark, sf0001)
    val isFresh = graft.operators.Corpus.hashBucket(col("vec_id"), "edelta", 5) === 0
    val plan = graft.operators.Dedup
      .deltaEmbedding(e.where(!isFresh), e.where(isFresh), "vec_id", "embedding", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
