package graft

import org.apache.spark.sql.functions._
import graft.functions.{Envelope, Hl7, MappingSpec}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("Envelope.wrapRecord produces schema'd JSON with fixed metadata") {
    val out = Seq((7L, "x")).toDF("ms", "payload")
      .select(Envelope.wrapRecord(col("ms"), "s1",
        struct(col("payload"))).as("j"))
      .head().getString(0)
    assert(out.contains("\"type\":\"record\""))
    assert(out.contains("\"version\":\"0.1.0\""))
    assert(out.contains("\"source_stream\":\"s1\""))
    assert(out.contains("\"payload\":\"x\""))
  }

  test("Envelope.canonicalJson is byte-stable") {
    val out = Seq((1234L, "{\"a\":1}")).toDF("ms", "data")
      .select(Envelope.canonicalJson("log", col("ms"), "s2", col("data")).as("j"))
      .head().getString(0)
    assert(out ==
      """{"type":"log","timestamp":1234,"version":"0.1.0","schema":"etlp_raw","source_stream":"s2","data":{"a":1}}""")
  }

  test("Hl7 parses segments, fields and components") {
    val msg = "MSH|^~\\&|APP\rPID|1||42^MRN||Doe^John"
    val df = Seq(msg).toDF("msg")
    val segs = Hl7.explodeSegments(df, col("msg"))
    assert(segs.count() == 2)
    val pid = segs.where(Hl7.segmentId(col("seg")) === "PID")
    assert(pid.select(Hl7.field(col("seg"), 3)).head().getString(0) == "42^MRN")
    assert(pid.select(element_at(Hl7.components(Hl7.field(col("seg"), 5)), 2))
      .head().getString(0) == "John")
  }

  test("MappingSpec compiles template rules to columns") {
    val spec = MappingSpec.parse(
      """# comment
        |id   = col: a
        |dbl  = expr: a * 2
        |kind = lit: fixed
        |j    = json: js $.k int
        |""".stripMargin)
    val out = spec(Seq((21, "{\"k\": 9}")).toDF("a", "js")).head()
    assert(out.getInt(0) == 21 && out.getInt(1) == 42)
    assert(out.getString(2) == "fixed" && out.getInt(3) == 9)
  }

  test("MappingSpec rejects malformed rules eagerly") {
    intercept[IllegalArgumentException](
      MappingSpec.parse("x = nope: y").compile)
    intercept[IllegalArgumentException](
      MappingSpec.parse("broken-line-without-equals").compile)
  }

  test("Vectors.centroids: exact means per (group, dim), no negative zero") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 4.0f)),
      ("b", Seq(10.0f, -1e-9f)), // tiny negative mean must print as 0.0
      ("c", null.asInstanceOf[Seq[Float]])
    ).toDF("g", "vec")
    val out = graft.functions.Vectors.centroids(df, "g", "vec")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", 0)) == ((2L, 2.0)) && out(("a", 1)) == ((2L, 3.0)))
    assert(out(("b", 0)) == ((1L, 10.0)))
    val bz = out(("b", 1))._2
    assert(bz == 0.0 && (1.0 / bz) > 0, s"got $bz (negative zero?)")
    assert(!out.keySet.exists(_._1 == "c")) // null vectors drop
  }

  test("canonicalizeUrl: case, default ports, utm params, fragments") {
    def canon(urls: String*): Seq[String] =
      urls.toDF("u")
        .select(graft.functions.TextAnalysis.canonicalizeUrl("u"))
        .collect().toSeq.map(_.getString(0))
    // the same page under four kinds of crawl noise → one canonical form
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b?z=1&utm_source=x#frag",
      "https://www.example.com/a/b?utm_campaign=y&z=1",
      "https://www.example.com:443/a/b?z=1",
      "https://www.example.com/a/b?z=1#other"
    ).distinct == Seq("https://www.example.com/a/b?z=1"))
    // non-default port survives; param order normalizes; empty query
    // drops its '?'; http default port 80 also drops
    assert(canon("http://Host:8080/p?b=2&a=1") ==
      Seq("http://host:8080/p?a=1&b=2"))
    assert(canon("http://host:80/p?utm_x=1") == Seq("http://host/p"))
    assert(canon("https://host/") == Seq("https://host/"))
    // only the scheme's OWN default port drops (RFC 3986 §6):
    // http://h:443 and https://h:80 are distinct origins, not defaults
    assert(canon("http://host:443/p") == Seq("http://host:443/p"))
    assert(canon("https://host:80/p") == Seq("https://host:80/p"))
    // a '?' INSIDE the fragment is fragment, not query: the whole
    // fragment drops (regression: '\?([^#]*)' grabbed 'x=1' here)
    assert(canon("http://host/p#sec?x=1") == Seq("http://host/p"))
    assert(canon("http://host/p?a=1#sec?x=2&utm_z=3") ==
      Seq("http://host/p?a=1"))
  }
}
