package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting. All are per-row
  * columnar expressions built from codegen'd builtins — no UDFs, no
  * shuffles — so they stream through a 100 TB corpus in one fused
  * whole-stage-codegen pass over the scan.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text counts 0 (split("")
    * yields [""], which must not count as a token).
    */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))
      .cast("int")

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-space symbols — the standard pre-tokenizer shape. A real BPE
    * would need a merges table; this regex count is the scalable
    * stand-in for budget estimation.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("int")

  /** Stopword hits: occurrences of common English function words. */
  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    stopwords
      .map(w => regexp_count(lower(text), lit(s"\\b$w\\b")).cast("int"))
      .reduce(_ + _)

  /** Quality heuristics (length / punctuation / stopword ratios) —
    * the usual pre-training filters (C4-style), each a plain double
    * expression so thresholds compose into pushed-down predicates.
    */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = tokenCount(text)
    df.withColumn("n_chars_m", length(text).cast("int"))
      .withColumn("n_tokens", toks)
      .withColumn(
        "avg_token_len",
        when(toks > 0, (length(regexp_replace(text, "\\s+", "")).cast("double")) / toks)
          .otherwise(lit(0.0))
      )
      .withColumn(
        "punct_ratio",
        when(length(text) > 0,
          regexp_count(text, lit("[\\.,;:!\\?]")).cast("double") / length(text))
          .otherwise(lit(0.0))
      )
      .withColumn(
        "stopword_ratio",
        when(toks > 0, stopwordCount(text).cast("double") / toks).otherwise(lit(0.0))
      )
  }

  /** Marker-word language ID: per-language function-word hit counts,
    * argmax with a deterministic tiebreak (count desc, then language
    * code asc), 'und' when nothing matches. N-gram heuristics in the
    * same spirit as published langid approaches; markers chosen to be
    * disjoint across the five languages.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "with", "this"),
    "de" -> Seq("der", "und", "nicht", "das"),
    "es" -> Seq("el", "que", "los", "una"),
    "fr" -> Seq("le", "les", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在")
  )

  /** Dedup-canonical text: lowercase, strip punctuation/symbols,
    * collapse runs of whitespace, trim — the standard normalization
    * applied before exact/near-dup hashing in pre-training pipelines,
    * so trivially-different copies ("Hello,  World!" vs "hello world")
    * land in the same dup group.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Marker match pattern, shared verbatim with the DuckDB oracle SQL
    * (td05): ASCII words use \b boundaries; CJK markers match as bare
    * literals — Java's \b is Unicode-aware but RE2's is ASCII-only,
    * so a \b around a CJK char would diverge between engines.
    */
  def markerPattern(w: String): String =
    if (w.forall(_ < 128)) s"\\b$w\\b" else w

  def langScore(text: Column, lang: String): Column =
    langMarkers(lang)
      .map(w => regexp_count(lower(text), lit(markerPattern(w))).cast("int"))
      .reduce(_ + _)

  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(text, l).as("score"), lit(l).as("lang")))
    // argmax: sort (score desc, lang asc) == sort struct desc on score,
    // asc on lang — array_sort then take the last of (score, reversed
    // lang) is awkward; instead reduce pairwise with a comparator.
    val best = scored.reduce { (a, b) =>
      when(
        b.getField("score") > a.getField("score") ||
          (b.getField("score") === a.getField("score") &&
            b.getField("lang") < a.getField("lang")),
        b
      ).otherwise(a)
    }
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
