package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline. All are
  * pure Catalyst expressions (codegen'd, shuffle-free per row) and all
  * arithmetic is oracle-portable: integer counts and single IEEE
  * double divisions only (SURVEY.md §4).
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (space-joined) of an array of tokens.
    * (Guarded: Spark's sequence(1, 0) counts DOWN, so short docs need
    * an explicit empty-array branch.) */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*)))

  /** Language marker sets: tiny per-language stopword lists. Order is
    * the tie-break priority for [[langidPredict]]. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "por"))

  /** Count of tokens found in a marker set (duplicates counted). */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, w => w.isin(markers: _*))).cast("int")

  /** Argmax language by marker score; earlier entries win ties. */
  def langidPredict(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), rest) =>
      when(s === best && s > 0, lit(lang)).otherwise(rest)
    }
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("int")

  /** BPE-ish token count: letter runs, single digits, single symbols. */
  def regexTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("int")
}
