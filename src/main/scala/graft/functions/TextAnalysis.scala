package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, built entirely
  * from codegen'd Spark SQL functions (no UDFs — every operator here stays
  * inside whole-stage codegen and scales linearly with no driver state).
  *
  * Determinism is a design constraint: each function is defined so an
  * independent engine (the DuckDB oracle) reproduces it bit-for-bit —
  * integer counts, exact string ops, and IEEE double arithmetic on exact
  * integer inputs only.
  */
object TextAnalysis {

  /** Whitespace tokenizer (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: alpha runs + digit runs + individual
    * punctuation, the standard pre-tokenization regex shape. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** Count of tokens drawn from a marker set (n-gram-free language-ID
    * signal). */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(m => m: Any): _*))).cast("long")

  /** Language marker lexicons (tiny on purpose: the heuristic must be
    * reproducible in plain SQL; swap in real lexicons at deployment). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "est"))

  /** Predicted language: argmax of marker counts with fixed precedence
    * (en > es > de > fr), 'unknown' when no marker hits. */
  def langId(text: Column): Column = {
    val counts = langMarkers.map { case (lang, ms) => lang -> markerCount(text, ms) }
    // fixed-precedence argmax: first language whose count equals the max
    val maxC = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("unknown")) { case ((lang, c), els) =>
      when(c === maxC && maxC > 0, lang).otherwise(els)
    }
  }

  /** Distinct-token ratio (vocabulary richness), exact double from two ints. */
  def uniqueRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / size(tokens(text))

  /** Stopword ratio against the English marker set. */
  def stopwordRatio(text: Column): Column =
    markerCount(text, langMarkers.head._2).cast("double") / tokenCount(text)

  /** Mean token length: non-space chars / tokens, exact double from ints. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]-ish: rewards vocabulary richness and
    * a natural stopword rate, penalizes degenerate token lengths. All
    * inputs are exact, the formula is fixed-shape IEEE arithmetic, so two
    * engines agree exactly. */
  def qualityScore(text: Column): Column =
    lit(0.4) * uniqueRatio(text) +
      lit(0.3) * stopwordRatio(text) +
      lit(0.3) * (meanTokenLen(text) / lit(10.0))

  /** Document fingerprint: md5 of case-and-whitespace-normalized text.
    * (The locality-sensitive fingerprints — MinHash/SimHash — live in
    * graft.functions.Similarity; this is the exact-dup key.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), " +", " "))
}
