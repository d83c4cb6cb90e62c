package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for the LLM-data-pipeline surface
 * (north-star extension per SURVEY.md §2.2 — absent from the reference,
 * which has no scalar function library at all,
 * /root/reference/src/lib.rs grep: no string ops).
 *
 * Everything is built from codegen'd built-ins so a 100 TB `documents`
 * scan stays in WholeStageCodegen: no UDFs, no driver round-trips.
 * Each helper has a line-for-line DuckDB-SQL equivalent used by the
 * correctness oracle (see graft.queries.LlmQueries).
 */
object TextFunctions {

  /** Whitespace tokens. Matches DuckDB `string_split(text, ' ')` on the
    * single-spaced synthetic corpus. */
  def wsTokens(text: Column): Column = split(text, " ")

  /** Whitespace token count via length arithmetic — engine-portable. */
  def wsTokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + lit(1L)).cast("long")

  /** Word n-gram shingles (distinct), space-joined. Empty array when the
    * document has fewer than n tokens (guards Spark's descending
    * `sequence` when size-n < 0). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = wsTokens(text)
    val grams = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Count of occurrences of a literal marker substring. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(marker), ""))) /
      lit(marker.length)).cast("long")

  /** Polynomial rolling-hash document fingerprint:
    * fold((acc * 31 + codepoint(ch)) mod 1e9+7) over the characters,
    * left-to-right — same fold as DuckDB `list_reduce`. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(substring(text, i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)

  /** BPE-ish token count: runs of lowercase letters, runs of digits, or a
    * single non-alphanumeric non-space byte, over the lowercased text.
    * The pattern is deliberately dialect-neutral (no \s, no classes that
    * differ between Java regex and RE2). */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit(BpePattern)).cast("long")

  /** substring(col, pos, 1) where pos is a Column (the DataFrame API's
    * `substring` only takes literal pos). */
  private def substring(c: Column, pos: Column, len: Column): Column =
    c.substr(pos, len)
}
