package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines: tokenization,
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is a pure Catalyst expression (no UDF): row-local, fused
  * into the scan stage by whole-stage codegen, and therefore shuffle-free
  * and embarrassingly parallel at 100 TB — per-doc cost is O(doc length).
  */
object TextAnalysis {

  /** whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Per-language stopword lists for the hit-count language heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "los", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "dans"),
    "de" -> Seq("der", "die", "das", "und", "von", "mit", "den", "ist", "im", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "中"))

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  /** stopword hits (with multiplicity) for one language list, over a
    * token-array column named `toksCol`. */
  def stopwordHits(toksCol: String, lang: String): Column = {
    val ws = Stopwords.toMap.apply(lang)
    expr(s"size(filter($toksCol, t -> t IN (${sqlList(ws)})))")
  }

  /** Language prediction: argmax of stopword hits, ties broken by list
    * order, zero hits → 'und'. Expects hit columns named hits_<lang>. */
  def predLang: Column = {
    val langs = Stopwords.map(_._1)
    val cases = langs.map { l =>
      val geAll = langs.map(o => s"hits_$l >= hits_$o").mkString(" AND ")
      s"WHEN $geAll AND hits_$l > 0 THEN '$l'"
    }.mkString(" ")
    expr(s"CASE $cases ELSE 'und' END")
  }

  /** Training-corpus text cleaning: lowercase, strip non-alphanumerics
    * to spaces, collapse runs, trim. One codegen'd expression chain. */
  def clean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), lit("[^a-z0-9 ]"), lit(" ")),
      lit(" +"), lit(" ")))

  /** Drop one language's stopwords from a token array. */
  def removeStopwords(toksCol: String, lang: String): Column = {
    val ws = Stopwords.toMap.apply(lang)
    expr(s"filter($toksCol, t -> NOT t IN (${sqlList(ws)}))")
  }

  /** BPE-ish subword count: letter runs, digit runs, single punctuation
    * marks — a cheap, deterministic proxy for a real tokenizer's token
    * count (the container has no tokenizer libs; the regex is the
    * documented public approximation). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** PII patterns shared by [[maskPii]] and [[piiCounts]] — the regex
    * subset (character classes, bounded repetition) behaves identically
    * under Java regex and RE2-family engines, so masks are
    * engine-portable. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{6,}"

  /** Scrub emails and long digit runs (phone/account/SSN-shaped) from a
    * training corpus — row-local codegen'd regex, shuffle-free. */
  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
      lit(LongNumRe), lit("<NUM>"))

  /** How many of each PII class were present (for filtering/reporting). */
  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    size(regexp_extract_all(text, lit(LongNumRe), lit(0))))

  /** Winnowing-lite document fingerprint: the 4 lexicographically
    * smallest md5s over distinct word 4-grams, concatenated. Two docs
    * sharing most 4-grams collide with high probability; one changed
    * word usually leaves >=1 of the 4 minima intact for fuzzy matching.
    */
  def fingerprint(toksCol: String): Column =
    expr(
      s"""concat_ws('', slice(array_sort(array_distinct(
         |  transform(sequence(1, size($toksCol) - 3),
         |            i -> md5(concat_ws(' ', slice($toksCol, i, 4)))))), 1, 4))""".stripMargin)

  /** Canonical URL for crawl dedup — the web-corpus primitive: the same
    * page arrives under case-varied hosts, default ports, tracking
    * params in shuffled order, and fragments; exact-dedup on the raw
    * string misses all of it. Normalization (RFC 3986 §6 plus the
    * standard utm_* strip):
    *   - scheme and host lowercased; default :80/:443 port dropped
    *   - fragment dropped
    *   - utm_* query params dropped; survivors sorted for order
    *     independence; empty query → no '?'
    * One row-local chain of regexp/split/sort expressions — codegen'd,
    * shuffle-free; canonicalizing 100 TB of crawl is a scan. The
    * `urlCol` must be a parseable absolute URL (scheme://host...). */
  def canonicalizeUrl(urlCol: String): Column = {
    val scheme = s"lower(regexp_extract($urlCol, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    // host[:port] = authority up to the first /, ?, or #. Only the
    // SCHEME'S OWN default port drops (RFC 3986 §6): http://h:443 is a
    // distinct origin from http://h and must survive canonicalization.
    val hostRaw = s"lower(regexp_extract($urlCol, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    val host = s"""CASE WHEN $scheme = 'http'
                  |       THEN regexp_replace($hostRaw, ':80$$', '')
                  |     WHEN $scheme = 'https'
                  |       THEN regexp_replace($hostRaw, ':443$$', '')
                  |     ELSE $hostRaw END""".stripMargin
    val path = s"regexp_extract($urlCol, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    // anchor to the pre-fragment region: [^#?]* consumes up to the
    // FIRST '?' or '#', so a '?' that only appears inside the fragment
    // (http://h/p#sec?x=1) never matches — the fragment, '?' included,
    // is dropped whole
    val query = s"regexp_extract($urlCol, '^[^#?]*\\\\?([^#]*)', 1)"
    val kept =
      s"array_sort(filter(split($query, '&'), p -> p != '' AND substr(p, 1, 4) != 'utm_'))"
    expr(
      s"""concat($scheme, '://', $host, $path,
         |  IF(size($kept) = 0, '', concat('?', array_join($kept, '&'))))""".stripMargin)
  }
}
