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

  test("$switch dispatches on string cases with and without $default") {
    val out = df.select(Jute.columns(
      """cls:
        |  $switch: "$ lang"
        |  en: english
        |  fr: french
        |  $default: other
        |nodefault:
        |  $switch: "$ lang"
        |  en: "$ score"
        |""".stripMargin): _*)
    val rows = out.collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(rows == Set(("english", Some(30.0)), ("french", None)))
    intercept[IllegalArgumentException](
      Jute.column("""{"$switch": "$ lang", "$default": "x"}"""))
  }

  test("$reduce folds left with named accumulator and element") {
    val out = df.select(Jute.column(
      """$reduce: "$ split(name, ' ')"
        |$acc: a
        |$as: w
        |$start: "$ CAST(0 AS BIGINT)"
        |$body: "$ a + length(w)"
        |""".stripMargin).as("chars"))
    // 'alice smith' -> 10, 'bob' -> 3 (separator not counted)
    assert(out.collect().map(_.getLong(0)).toSet == Set(10L, 3L))
  }

  test("$defs/$call: template functions expand inline, builtins pass through") {
    val out = df.select(Jute.columns(
      """$defs:
        |  initials:
        |    $args: [full]
        |    $body:
        |      $map: "$ split(full, ' ')"
        |      $as: w
        |      $body: "$ upper(substring(w, 1, 1))"
        |mono:
        |  $call: initials
        |  $args: ["$ name"]
        |shout:
        |  $call: upper
        |  $args: ["$ name"]
        |""".stripMargin): _*)
    val rows = out.collect()
      .map(r => (r.getSeq[String](0), r.getString(1))).toSet
    assert(rows == Set((Seq("A", "S"), "ALICE SMITH"), (Seq("B"), "BOB")))
    // arity is checked at compile time
    val bad = intercept[IllegalArgumentException](df.select(Jute.columns(
      """$defs:
        |  f:
        |    $args: [a, b]
        |    $body: "$ a + b"
        |x:
        |  $call: f
        |  $args: ["$ score"]
        |""".stripMargin): _*))
    assert(bad.getMessage.contains("expects 2 args"))
    // recursion cannot produce a finite expression tree — rejected
    val rec = intercept[IllegalArgumentException](df.select(Jute.columns(
      """$defs:
        |  loop:
        |    $args: [a]
        |    $body:
        |      $call: loop
        |      $args: ["$ a"]
        |x:
        |  $call: loop
        |  $args: ["$ score"]
        |""".stripMargin): _*))
    assert(rec.getMessage.contains("recursive"))
  }

  test("$call expansion is hygienic: args never capture earlier params") {
    // f(a, b) = a - b, called as f(1, a) where the OUTER $let binds
    // a = 10: the second arg's `a` must read the $let binding (→ 1-10 =
    // -9), not f's first parameter (an unhygienic expansion substitutes
    // it, yielding 1-1 = 0)
    val out2 = df.select(Jute.columns(
      """$defs:
        |  f:
        |    $args: [a, b]
        |    $body: "$ a - b"
        |x:
        |  $let:
        |    a: "$ 10"
        |  $body:
        |    $call: f
        |    $args: ["$ 1", "$ a"]
        |""".stripMargin): _*)
    assert(out2.select("x").head().getInt(0) == -9,
      "arg `a` was captured by f's first parameter")
    // reserved fresh-name prefix is rejected for user identifiers
    val bad = intercept[IllegalArgumentException](Jute.column(
      """{"$let": {"__graft_a0": "$ 1"}, "$body": "$ __graft_a0"}"""))
    assert(bad.getMessage.contains("reserved"))
  }

  test("lambda and function names must be identifiers (no SQL splicing)") {
    val bad = intercept[IllegalArgumentException](
      Jute.column("""{"$map": "$ split(name, ' ')", "$as": "x) + (1", "$body": "$ x"}"""))
    assert(bad.getMessage.contains("identifier"))
    val badCall = intercept[IllegalArgumentException](
      Jute.column("""{"$call": "upper(name); drop", "$args": []}"""))
    assert(badCall.getMessage.contains("identifier"))
  }
}
