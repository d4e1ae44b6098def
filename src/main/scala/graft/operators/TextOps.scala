package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis for training-data pipelines: language ID (stopword
  * n-gram heuristic), quality scoring, token counting, document
  * fingerprinting. All single-projection, codegen'd, shuffle-free — at
  * 100 TB these run at scan speed.
  */
object TextOps {

  /** Deterministic stopword lists per language (tiny n-gram heuristic —
    * a real pipeline would swap in fastText/CLD3 via the same operator
    * shape). Order matters: argmax ties break toward the earlier entry.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das"),
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "los", "de"),
    "fr" -> Seq("le", "la", "les", "et"))

  private def stopwordCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit): _*)))

  /** Language ID: per-language stopword hit counts, argmax with
    * deterministic tie-break, "und" when no stopwords hit at all.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val tokens = split(col("text"), " ")
    val scores = Stopwords.map { case (lang, words) =>
      lang -> stopwordCount(tokens, words)
    }
    val Seq(de, en, es, fr) = scores.map(_._2)
    val best =
      when(de >= en && de >= es && de >= fr, "de")
        .when(en >= es && en >= fr, "en")
        .when(es >= fr, "es")
        .otherwise("fr")
    Tables.documents(s, dir).select(
      col("doc_id"),
      de.as("s_de"), en.as("s_en"), es.as("s_es"), fr.as("s_fr"),
      when(greatest(de, en, es, fr) === 0, "und").otherwise(best)
        .as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: token count, char count, punctuation ratio, stopword
    * ratio, mean token length, and a composite score — the length/punct/
    * stopword-ratio heuristics used to filter web corpora.
    */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    val tokens = split(text, " ")
    val nTok = size(tokens)
    val nChar = length(text)
    val nonAlpha = nChar - length(regexp_replace(text, "[^a-z ]", ""))
    val stops = stopwordCount(tokens,
      Stopwords.flatMap(_._2).distinct)
    val meanTokLen = (nChar - (nTok - 1)) / nTok.cast("double")
    val punctRatio = nonAlpha / nChar.cast("double")
    val stopRatio = stops / nTok.cast("double")
    Tables.documents(s, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nChar.as("n_chars_actual"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(meanTokLen, 4).as("mean_token_len"),
      // composite: long enough, low punctuation, some stopwords
      round(
        when(nTok >= 10, 0.4).otherwise(0.0) +
        when(punctRatio <= 0.1, 0.3).otherwise(0.0) +
        when(stopRatio >= 0.05, 0.3).otherwise(0.0), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens, regex word tokens (a BPE-ish
    * `[a-z]+|[0-9]+` segmentation), and a chars/4 BPE-count estimate.
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(split(text, " ")).as("ws_tokens"),
      size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0)))
        .as("regex_tokens"),
      ceil(length(text) / lit(4.0)).cast("long").as("bpe_est"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: md5 over whitespace-normalized lowercased
    * text plus a 16-bit prefix bucket — the join key for cross-corpus
    * exact matching at scale (digests shuffle, text never does).
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame = {
    val norm = lower(trim(regexp_replace(col("text"), " +", " ")))
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(norm).as("fingerprint"),
      substring(md5(norm), 1, 4).as("bucket"))
      .orderBy(col("doc_id"))
  }
}
