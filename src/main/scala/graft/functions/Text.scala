package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, word-shingling, language-ID heuristic, quality scoring,
  * token counting. All are built-in-expression compositions (codegen'd, no
  * UDFs) and every formula is mirrorable in ANSI-ish SQL for the oracle.
  */
object Text {

  /** Whitespace tokens. `split` on a literal space matches the corpus
    * format (single-space-joined words).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-count proxy: number of matches of a word/number/punct
    * regex — a cheap, deterministic stand-in for a real tokenizer's token
    * count (regexp_count is codegen'd; no external vocab needed).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))

  /** Word n-gram shingles as space-joined strings. Documents shorter than n
    * tokens yield an empty array (guarded — Spark's `sequence` would
    * otherwise count backwards for negative spans).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-language stopword tables for the n-gram language-ID heuristic.
    * Order matters: it is the deterministic tiebreak.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Language-ID: argmax over per-language stopword hit counts; ties (and
    * zero hits everywhere) resolve to the earliest language in
    * [[LangStopwords]] order via a strict-greater fold. Deterministic and
    * SQL-mirrorable; a production version would swap in character-n-gram
    * profiles, same plan shape.
    */
  def langId(text: Column): Column = {
    val w = tokens(text)
    val scores = LangStopwords.map { case (lang, sw) =>
      lang -> size(filter(w, t => t.isin(sw.map(x => x: Any): _*)))
    }
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Quality metrics + a composite score in [0,1]:
    * length sweet-spot, punctuation ratio, stopword ratio, mean word length.
    * Weights are arbitrary but pinned; the score exists to be filtered on.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val w = tokens(text)
    val nTok = size(w).cast("long")
    val nChars = length(text).cast("long")
    val punct = regexp_count(text, lit("[^a-zA-Z0-9\\s]")).cast("double")
    val stop = size(filter(w, t =>
      t.isin("the", "a", "of", "and", "to", "is", "in"))).cast("double")
    val meanLen = round((nChars - (nTok - 1)).cast("double") / nTok, 4)
    val lenScore = when(nTok.between(20, 400), 1.0)
      .when(nTok < 20, nTok.cast("double") / 20)
      .otherwise(lit(400.0) / nTok)
    val punctRatio = round(punct / nChars, 6)
    val stopRatio = round(stop / nTok, 6)
    val score = round(
      lenScore * 0.5
        + when(stopRatio.between(0.05, 0.6), 0.3).otherwise(0.0)
        + when(punctRatio <= 0.1, 0.2).otherwise(0.0), 4)
    Seq(
      "n_tokens" -> nTok,
      "mean_word_len" -> meanLen,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "quality_score" -> score)
  }
}
