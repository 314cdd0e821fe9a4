package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. All pure `Column`
  * builders (codegen'd, no UDFs) so they run inside whole-stage codegen over
  * 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace tokenization (single-space contract shared with the DuckDB
    * oracles; empty tokens from runs of spaces are preserved identically). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: word-or-punct regex matches plus a char/4 term
    * for long words, a standard cheap proxy for subword tokenizers. */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("""\w+|[^\w\s]"""), lit(0))) +
      floor(length(text) / 16).cast("int")

  // Deterministic, engine-portable stopword lists. Shared terms across
  // languages are fine: the same lists drive both Spark and the oracle.
  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "that")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "un", "une", "est", "dans")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht")
  val EsStop: Seq[String] = Seq("el", "los", "las", "y", "es", "por", "con", "para")

  private def hits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** N-gram-heuristic language ID: count stopword hits per language, take the
    * argmax with a fixed tie order (en, fr, de, es); CJK characters short-
    * circuit to `zh`; no hits → `und`. Deterministic and exactly mirrored by
    * the DuckDB oracle SQL. */
  def langId(text: Column): Column = {
    val en = hits(text, EnStop); val fr = hits(text, FrStop)
    val de = hits(text, DeStop); val es = hits(text, EsStop)
    val mx = greatest(en, fr, de, es)
    when(text.rlike("[一-鿿]"), lit("zh"))
      .when(mx === 0, lit("und"))
      .when(en === mx, lit("en"))
      .when(fr === mx, lit("fr"))
      .when(de === mx, lit("de"))
      .otherwise(lit("es"))
  }

  /** Quality features: length, punctuation ratio, stopword ratio, mean token
    * length. Combine downstream into filter thresholds (e.g. Gopher-style
    * rules). */
  def punctRatio(text: Column): Column =
    round((length(text) - length(regexp_replace(text, "[.,;:!?]", ""))) /
      greatest(length(text), lit(1)), 6)

  def stopwordRatio(text: Column): Column =
    round(hits(text, EnStop) / greatest(tokenCount(text), lit(1)).cast("double"), 6)

  def meanTokenLen(text: Column): Column =
    round((length(text) - tokenCount(text) + 1) /
      greatest(tokenCount(text), lit(1)).cast("double"), 6)

  /** Gopher-ish keep/drop quality gate over the features above. */
  def qualityKeep(text: Column, minTokens: Int = 5, maxTokens: Int = 100000,
                  maxPunctRatio: Double = 0.3): Column =
    tokenCount(text).between(minTokens, maxTokens) &&
      punctRatio(text) <= maxPunctRatio

  /** Document fingerprint: md5 over the sorted distinct lowercase token set —
    * an order-insensitive content signature for exact-ish dedup across
    * reorderings. Native single-pass expression
    * (graft.functions.TokenSetFingerprint); matches
    * `md5(array_to_string(list_sort(list_distinct(...))))` in DuckDB
    * bit-for-bit. */
  def fingerprint(text: Column): Column =
    graft.functions.HashExpressions.tokenSetFingerprint(lower(text))

  /** Distinct word n-gram shingles, the input to Jaccard/MinHash dedup.
    * Docs shorter than n tokens yield one whole-doc shingle. Native
    * single-pass expression (graft.functions.WordShingles) — the composed
    * transform/slice version evaluates interpreted lambdas per token. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.HashExpressions.wordShingles(lower(text), n)
}
