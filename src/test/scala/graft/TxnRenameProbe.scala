package graft

import org.apache.hadoop.fs.Path

/** Empirical probe for the commit-point primitive: does THIS
  * filesystem's Hadoop rename refuse an existing destination? The Txn
  * protocol depends on the answer (see Txn.publish). */
class TxnRenameProbe extends SparkSpec {
  test("hadoop local rename refuses an existing destination file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rnm").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mk(name: String, content: String): Path = {
      val p = new Path(s"$dir/$name")
      val os = fs.create(p, false)
      os.write(content.getBytes("UTF-8")); os.close(); p
    }
    val a = mk("a", "AAA")
    val b = mk("b", "BBB")
    val won = fs.rename(a, b)
    val bContent = {
      val in = fs.open(new Path(s"$dir/b"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    info(s"rename-onto-existing returned $won; dest content now '$bContent'")
    assert(!won && bContent == "BBB",
      s"LOCAL RENAME CLOBBERS: won=$won content=$bContent — Txn.publish " +
        "cannot use rename as the version-claim CAS on this filesystem")
  }
}
