package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders (tokenize, shingle, quality signals) —
  * generalizations of the reference's regex tokenizers
  * (`word_count/map.py:10`, `performance_functions/simplified_page_rank.py:4`)
  * built from codegen'd `org.apache.spark.sql.functions` only: everything
  * here stays inside WholeStageCodegen, no UDFs.
  *
  * All builders mirror 1-based `element_at` semantics so the DuckDB oracle
  * SQL can be written with identical list indexing.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** The SAME token rule as a plain static function — the single shared
    * kernel for every JVM-side tokenizer (SimHash, Shingles), so the
    * rule cannot drift per call site. Locale.ROOT: default-locale
    * lowercasing is executor-locale-sensitive (tr-TR dotless-i would
    * break same-text-same-fingerprint determinism and oracle parity). */
  def tokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Token count as BIGINT (matches DuckDB `len()`). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** Contiguous word n-gram shingles, space-joined ("a b c").
    * NULL text → NULL (matching ShinglesExpression and the SQL oracle);
    * fewer than n tokens → empty array — the size guard also avoids
    * Spark's `sequence(1, 0)` counting DOWN rather than returning empty. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(text.isNull, lit(null).cast("array<string>"))
      .when(size(t) >= n,
        transform(
          sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Count of tokens that appear in a fixed marker set. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("bigint")

  // Marker sets for the n-gram-free language-ID heuristic. Deterministic
  // and SQL-expressible — the oracle recomputes the same score.
  // (Declared ABOVE sqlQuality, which initializes from enMarkers.)
  val enMarkers = Seq("the", "a", "of", "and", "is", "to", "in")
  val deMarkers = Seq("der", "die", "das", "und", "ist", "nicht")
  val frMarkers = Seq("le", "la", "et", "les", "des", "est")
  val esMarkers = Seq("el", "los", "que", "de", "y", "es")

  /** The DuckDB spelling of the same token rule, for oracle SQL strings
    * — defined ONCE so engine and oracle tokenizers cannot drift. */
  val sqlTokens: String =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> length(x) > 0)"

  /** Composite quality score over a token array column + char count —
    * the SINGLE definition used by both the scoring query and the
    * pipeline's quality gate. Mirrored term-for-term by [[sqlQuality]]. */
  def qualityScore(t: Column, nChars: Column): Column =
    (size(array_distinct(t)).cast("double") / size(t)) * 0.5 +
      (markerHits(t, enMarkers).cast("double") / size(t)) * 0.3 +
      least(nChars.cast("double") / size(t) / 10.0, lit(1.0)) * 0.2

  /** DuckDB spelling of [[qualityScore]] over a token list aliased `t`
    * and a char count column `n_chars`. */
  val sqlQuality: String =
    "CAST(len(list_distinct(t)) AS DOUBLE) / len(t) * 0.5 + " +
      s"CAST(len(list_filter(t, x -> list_contains(${enMarkers.mkString("['", "', '", "']")}, x))) AS DOUBLE) / len(t) * 0.3 + " +
      "least(CAST(n_chars AS DOUBLE) / len(t) / 10.0, 1.0) * 0.2"
}
