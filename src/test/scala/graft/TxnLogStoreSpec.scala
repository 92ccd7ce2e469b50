package graft

import java.util.concurrent.Executors

import graft.operators.Txn
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** The commit seam ([[Txn.TxnLogStore]]): everything the protocol asks
  * of storage is one atomic `putIfAbsent`. Proved both directions —
  * a store offering ONLY conditional-put (no rename) keeps the
  * protocol exactly-once under a concurrent soak, and a store that
  * CLOBBERS instead of refusing breaks it. That pair pins the
  * correctness boundary AT the seam, which is what an S3 deployment
  * needs to know: implement putIfAbsent as a conditional PUT and
  * nothing else matters. */
class TxnLogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_store").toString

  /** Conditional-put-only store: atomicity comes from the store's own
    * serialization (here an in-JVM lock standing in for the object
    * store's server side) — no temp files, no rename, direct create. */
  private object CondPutStore extends Txn.TxnLogStore {
    val lock = new Object
    @volatile var puts = 0
    override def putIfAbsent(f: FileSystem, target: Path,
        content: Array[Byte]): Boolean = lock.synchronized {
      puts += 1
      if (f.exists(target)) false
      else {
        val os = f.create(target, false)
        try os.write(content) finally os.close()
        true
      }
    }
  }

  /** Deliberately BROKEN store: writes unconditionally and always
    * claims success — the clobbering behavior an object store without
    * conditional-put (plain S3 PUT) exhibits. */
  private object ClobberStore extends Txn.TxnLogStore {
    override def putIfAbsent(f: FileSystem, target: Path,
        content: Array[Byte]): Boolean = {
      val os = f.create(target, true)
      try os.write(content) finally os.close()
      true
    }
  }

  /** Thread-confined store swap (the raceOnce discipline): suites
    * share one JVM and run in parallel, so a GLOBAL swap would route
    * unrelated suites' commits through the fake for the window. The
    * override is inheritable, so this spec's own worker pools —
    * created inside the body — see it; other suites' threads never
    * do. */
  private def withStore[T](s: Txn.TxnLogStore)(body: => T): T = {
    Txn.logStoreOverride.set(Some(s))
    try body finally Txn.logStoreOverride.set(None)
  }

  test("conditional-put-only store: concurrent appends stay exactly-once (no rename anywhere)") {
    withStore(CondPutStore) {
      val root = freshRoot()
      Txn.commitOverwrite(spark, root,
        Seq((0L, 0L)).toDF("k", "v"), statsCol = Some("k"))
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      try {
        // 8 concurrent appenders × disjoint rows: every row must land
        // exactly once, every version exactly one writer
        val fs = (1 to 8).map { i =>
          Future {
            // maxRetries > thread count: with 8 racers each round has
            // 7 losers, so a worst-case loser needs up to 7 retries
            Txn.commitAppend(spark, root,
              Seq((i.toLong, i.toLong)).toDF("k", "v"), maxRetries = 20)
          }
        }
        val versions = Await.result(Future.sequence(fs), 120.seconds)
        assert(versions.toSet.size == 8,
          s"two appenders claimed one version: $versions")
        val got = Txn.read(spark, root).select("k").as[Long]
          .collect().sorted.toSeq
        assert(got == (0L to 8L),
          s"lost or duplicated rows through the cond-put store: $got")
        // history is contiguous 1..9 and time travel works
        assert(Txn.currentVersion(spark, root) == 9)
        assert(Txn.read(spark, root, Some(1)).count() == 1)
      } finally pool.shutdown()
    }
  }

  test("conditional-put-only store: row-level conflict detection still fires") {
    withStore(CondPutStore) {
      val root = freshRoot()
      Txn.commitOverwrite(spark, root,
        spark.range(100).select(col("id").as("k"), lit(0L).as("v")),
        statsCol = Some("k"))
      // inject a racing overlapping delete between stage and publish
      Txn.raceOnce.set(Some(() => {
        Txn.commitDelete(spark, root, Seq(5L).toDF("k"), "k")
      }))
      val e = intercept[Txn.ConcurrentWriteException] {
        Txn.commitMerge(spark, root,
          Seq((5L, 99L)).toDF("k", "v"), "k")
      }
      assert(e.getMessage.contains("overlapping"), e.getMessage)
    }
  }

  test("the seam is load-bearing: a clobbering store lets racers double-claim") {
    withStore(ClobberStore) {
      val root = freshRoot()
      Txn.commitOverwrite(spark, root, Seq((0L, 0L)).toDF("k", "v"))
      // two sequential publishes of the SAME version both "succeed"
      // under a clobbering store — the lost-update the contract exists
      // to prevent (under the real stores the second returns false /
      // retries to the next version)
      val a = Txn.commitAppend(spark, root, Seq((1L, 1L)).toDF("k", "v"))
      // fabricate a racer that re-claims version a with different rows
      val lines = Txn.rawManifestLines0(spark, root, a)
      val f = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val won = ClobberStore.putIfAbsent(f,
        new Path(f"$root/_manifests/v$a%05d.manifest"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      assert(won, "clobbering store should (wrongly) claim success — " +
        "this is exactly the store shape the seam rejects")
    }
  }

  test("putIfAbsent races on one target: exactly one winner") {
    val root = freshRoot()
    val f = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val target = new Path(s"$root/one")
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      for (store <- Seq[Txn.TxnLogStore](Txn.HadoopRenameLogStore,
          CondPutStore)) {
        f.delete(target, false)
        val wins = Await.result(Future.sequence((1 to 8).map(i =>
          Future(store.putIfAbsent(f, target,
            s"writer-$i\n".getBytes("UTF-8"))))), 60.seconds)
        assert(wins.count(identity) == 1,
          s"$store: ${wins.count(identity)} winners")
      }
    } finally pool.shutdown()
  }
}
