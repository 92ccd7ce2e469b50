package graft

import org.apache.spark.sql.functions._
import graft.functions.{Jute, MappingSpec}

class JuteSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "alice smith", "en", 30.0),
    (2L, "bob", "fr", -4.5)
  ).toDF("id", "name", "lang", "score")

  test("nested mapping compiles to named_struct columns") {
    val out = df.select(Jute.columns(
      """rec:
        |  meta:
        |    lang: "$ lang"
        |    fixed: tagged
        |  id: "$ id"
        |""".stripMargin): _*)
    val r = out.select(col("rec.meta.lang"), col("rec.meta.fixed"), col("rec.id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(r == Set(("en", "tagged", 1L), ("fr", "tagged", 2L)))
  }

  test("$if conditional with and without $else") {
    val out = df.select(Jute.columns(
      """band:
        |  $if: "score > 0"
        |  $then: pos
        |  $else: neg
        |maybe:
        |  $if: "score > 0"
        |  $then: "$ score * 2"
        |""".stripMargin): _*)
    val rows = out.collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(rows.contains(("pos", Some(60.0))))
    assert(rows.contains(("neg", None)))
  }

  test("$map loop binds the lambda variable in $body") {
    val out = df.select(Jute.column(
      """$map: "split(name, ' ')"
        |$as: w
        |$body: "$ upper(w)"
        |""".stripMargin).as("words"))
    assert(out.collect().map(_.getSeq[String](0)).toSet ==
      Set(Seq("ALICE", "SMITH"), Seq("BOB")))
  }

  test("$let bindings: later bindings and body see earlier ones") {
    val out = df.select(Jute.column(
      """$let:
        |  base: "$ score * 10"
        |  shifted: "$ base + 1"
        |$body: "$ shifted - base"
        |""".stripMargin).as("one"))
    assert(out.collect().forall(_.getDouble(0) == 1.0))
  }

  test("scalars, arrays and JSON flow syntax; string escaping") {
    val out = df.select(Jute.column(
      """{"n": 42, "pi": 3.5, "flag": true, "none": null,
        |"quoted": "it's", "arr": [1, 2]}""".stripMargin).as("v"))
    val r = out.select("v.n", "v.pi", "v.flag", "v.none", "v.quoted", "v.arr")
      .head()
    assert(r.getLong(0) == 42L && r.getDouble(1) == 3.5 && r.getBoolean(2))
    assert(r.isNullAt(3) && r.getString(4) == "it's")
    assert(r.getSeq[Long](5) == Seq(1L, 2L))
  }

  test("jute rule integrates with the flat MappingSpec line format") {
    val out = MappingSpec.parse(
      """id  = col: id
        |env = jute: {"meta": {"lang": "$ lang"}, "up": "$ upper(name)"}
        |""".stripMargin)(df)
    val r = out.select(col("id"), col("env.meta.lang"), col("env.up")).head()
    assert(r.getLong(0) == 1L && r.getString(1) == "en" && r.getString(2) == "ALICE SMITH")
  }

  test("top-level template must be a mapping") {
    intercept[IllegalArgumentException](Jute.columns("[1,2,3]"))
  }

  test("fetchMappings compiles served templates, isolates failures") {
    // fake mapper service: one good template, one missing, one malformed
    val served = Map(
      "http://mapper/mappings/13" ->
        """{"content": {"yaml": "up: \"$ upper(name)\"\nid: \"$ id\""}}""",
      "http://mapper/mappings/16" -> """{"status": "no yaml here"}""")
    def fetch(url: String): String =
      served.getOrElse(url, throw new java.io.FileNotFoundException(url))
    val out = graft.functions.Jute.fetchMappings("http://mapper",
      Map("adt" -> "13", "bad" -> "16", "gone" -> "404"), fetch)
    val cols = out("adt").toOption.get
    val r = df.select(cols: _*).where(col("id") === 1L).head()
    assert(r.getString(0) == "ALICE SMITH" && r.getLong(1) == 1L)
    assert(out("bad").left.exists(_.contains("mapping-id: 16")))
    assert(out("gone").left.exists(_.contains("mapping-id: 404")))
  }

  test("backslashes in literals survive Spark's escape processing") {
    val out = df.select(Jute.column("""{"p": "C:\\temp\\new"}""").as("v"))
    assert(out.select("v.p").head().getString(0) == "C:\\temp\\new")
  }

  test("missing directive operands are template errors, not NPEs") {
    val bad1 = intercept[IllegalArgumentException](
      Jute.column("""{"$if": "score > 0"}"""))
    assert(bad1.getMessage.contains("$then"))
    val bad2 = intercept[IllegalArgumentException](
      Jute.column("""{"$map": "$ split(name, ' ')"}"""))
    assert(bad2.getMessage.contains("$body"))
  }
}
