package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language-ID heuristic, document fingerprints. All pure
  * column expressions (codegen'd, shuffle-free) — the per-document cost
  * is O(bytes) and the operators scale linearly with a parquet scan.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(trim(text), " "))

  /** BPE-ish subword count: word-piece segments + digit runs + punct
    * marks, the usual pre-tokenizer regex shape. Unicode letter/digit
    * classes like [[punctRatio]] — ASCII classes counted every accented
    * or non-Latin letter as its own "punctuation" segment, so cost/
    * length filters built on this systematically misjudged exactly the
    * non-English documents the langId markers support. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Mean token length (chars per token). */
  def meanTokenLength(text: Column): Column =
    length(regexp_replace(trim(text), lit(" "), lit(""))).cast("double") /
      tokenCount(text).cast("double")

  /** Punctuation character ratio — Unicode letter/digit classes, NOT
    * ASCII: an `[^A-Za-z0-9\s]` class counts every accented or CJK
    * character as "punctuation", so the quality score's punctuation
    * penalty zeroed clean non-English documents — the exact multilingual
    * data the langId markers claim to support. `\p{L}`/`\p{N}` evaluate
    * identically in Java regex (Spark) and RE2 (the DuckDB oracle). */
  def punctRatio(text: Column): Column =
    // empty text has no punctuation — an unguarded 0/0 would score the
    // row NaN (and NaN-poison every product composed on it, e.g. the
    // quality score) instead of the 0.0 the definition implies
    when(length(text) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[^\\p{L}\\p{N}\\s]"), lit(0))).cast("double") /
        length(text).cast("double"))

  /** Ratio of tokens that are in the given stopword set. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(trim(text), " ")
    size(array_intersect(toks, array(stopwords.map(lit): _*))).cast("double") /
      size(toks).cast("double")
    // NB: array_intersect dedups; use filter for multiset semantics
  }

  /** Multiset stopword ratio (counts repeats — the quality-score form). */
  def stopwordRatioMultiset(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(trim(text), " ")
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      size(toks).cast("double")
  }

  /** Composite quality score in [0, 1]: length saturation × type-token
    * diversity × (1 − punctuation excess). Deterministic arithmetic so
    * the oracle can recompute it. */
  def qualityScore(text: Column): Column = {
    val toks = split(trim(text), " ")
    val lenSat = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val diversity = size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * lit(10.0), lit(0.0))
    lenSat * diversity * punctPenalty
  }

  /** Fraction of tokens that repeat an earlier token (the Gopher-style
    * duplicate-word repetition signal; reference curation analogue:
    * corpus-hygiene filters ahead of model fitting). Pure per-row
    * expression — no shuffle at any corpus size. */
  def dupWordFrac(text: Column): Column = {
    val toks = split(trim(text), " ")
    lit(1.0) - size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")
  }

  /** Word bigrams of the text as an array column (helper shared by the
    * repetition stats and their tests). Empty for one-word docs.
    *
    * Built as `zip_with(toks[1:], toks[2:])`, NOT per-index
    * `element_at(toks, i)` lookups: higher-order functions evaluate
    * interpreted (no codegen), where each `toks` reference inside a
    * lambda RE-RUNS the split — the element_at form re-split the text
    * O(len) times per row (measured 100× slower at sf0.1). */
  def wordBigrams(text: Column): Column = {
    val toks = split(trim(text), " ")
    when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of word bigrams taken by the single most frequent bigram
    * (Gopher's top-n-gram repetition signal, n=2). One sorted-run pass:
    * sort the bigrams, then a single `aggregate` fold tracks the current
    * run length and the best run — O(n log n) per row and the bigram
    * array is constructed ONCE (a distinct×filter nest would rebuild the
    * interpreted-HOF input per distinct element; measured minutes vs ms
    * at sf0.1). Shuffle-free at any corpus size. */
  def topBigramFrac(text: Column): Column = {
    val folded = aggregate(
      array_sort(wordBigrams(text)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        lit(0L).as("cnt")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("cnt") + 1).as("cnt"))
      },
      acc => when(acc.getField("cnt") > 0,
        acc.getField("best").cast("double") / acc.getField("cnt").cast("double"))
        .otherwise(lit(0.0)))
    // null text propagates null like every sibling metric (a bare
    // coalesce scored null documents 0.0 — the one metric a
    // "low-repetition" curation filter would have silently passed)
    when(text.isNotNull, coalesce(folded, lit(0.0)))
  }

  /** Language-marker dictionaries for the stopword-voting language ID
    * (tiny, heuristic — the n-gram-frequency approach). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Predicted language: argmax of marker-token hits with deterministic
    * lexicographic tiebreak ('unknown' when nothing matches).
    *
    * Known limitation: markers are matched against WHITESPACE TOKENS, so
    * unsegmented CJK text (no spaces) matches no zh marker and returns
    * 'unknown' — the q32 gate corpus is space-segmented. A production
    * pipeline for unsegmented scripts should route on a character-class
    * prefilter (CJK codepoint ratio) or segment upstream before this
    * stopword vote; substring-counting here would double-count markers
    * inside other languages' words. */
  def langId(text: Column): Column = {
    val toks = split(trim(text), " ")
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("unknown"))
  }
}
