package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative record mapping — the reference fetches JUTE YAML templates
  * and compiles them to record-transforming fns
  * (/root/reference/src/etlp/utils/mapper.clj:28-47
  * `resolve-jute-template` / `fetch-mappings`), decoupling mapping logic
  * from pipeline code (etlp-mapper).
  *
  * Spark-first: a mapping template compiles to `Column` expressions, so
  * the "template" runs inside Catalyst (constant-folded, codegen'd,
  * prunable) rather than per-record in an interpreter. Specs are data
  * (`target -> rule`), can be loaded from JSON/YAML-ish text at runtime,
  * and validate eagerly at compile time.
  *
  * Rule forms:
  *  - `"expr: <sql>"`  — any SQL expression over input columns
  *  - `"col: <name>"`  — straight column pass-through/rename
  *  - `"json: <col> <path> [<type>]"` — JSON path extraction (e.g.
  *     `json: props $.k int`), the etlp-mapper bread-and-butter
  *  - `"lit: <value>"` — string literal
  *  - `"jute: <template>"` — nested JUTE-style template (inline
  *     JSON/YAML flow syntax) compiled by [[Jute]]: nested structs,
  *     `$if` conditionals, `$map` loops, `$let` bindings
  */
final case class MappingSpec(fields: Seq[(String, String)]) {
  def compile: Seq[Column] = fields.map { case (target, rule) =>
    MappingSpec.compileRule(rule).as(target)
  }
  /** Apply the mapping: the output has exactly the spec'd columns. */
  def apply(df: DataFrame): DataFrame = df.select(compile: _*)
}

object MappingSpec {
  private[functions] def compileRule(rule: String): Column = {
    val (kind, rest) = rule.span(_ != ':')
    val body = rest.drop(1).trim
    kind.trim match {
      case "expr" => expr(body)
      case "col"  => col(body)
      case "lit"  => lit(body)
      case "jute" => Jute.column(body)
      case "json" =>
        body.split("\\s+") match {
          case Array(c, path)     => get_json_object(col(c), path)
          case Array(c, path, tp) => get_json_object(col(c), path).cast(tp)
          case _ => throw new IllegalArgumentException(s"json rule: '$body'")
        }
      case other => throw new IllegalArgumentException(s"unknown rule kind: '$other'")
    }
  }

  /** Parse a minimal `target: rule` line format (one mapping per line,
    * `#` comments) — the stand-in for the reference's YAML templates in
    * this zero-egress environment. */
  def parse(template: String): MappingSpec =
    MappingSpec(template.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        val (target, rest) = line.span(_ != '=')
        require(rest.nonEmpty, s"mapping line needs 'target = rule': $line")
        (target.trim, rest.drop(1).trim)
      }.toSeq)
}
