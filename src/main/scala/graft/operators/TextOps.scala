package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis for LLM-training-data pipelines, over the `documents`
  * table. Everything here is pure `functions._` column expressions —
  * no UDFs, fully inside WholeStageCodegen, zero shuffles (per-row
  * scoring embarrassingly parallel at 100 TB).
  *
  * Regex discipline: only ASCII-safe constructs that mean the same
  * thing in Java regex (Spark) and RE2 (DuckDB oracle): `\s \w`,
  * `\p{Punct}` ↔ `[[:punct:]]`.
  */
object TextOps {

  /** Whitespace tokens of the normalized text (empty text → 0 tokens). */
  private def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(c)), "\\s+"))

  private val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** #30 Token counting: whitespace tokens + a BPE-ish segmentation
    * (maximal `\w+` runs and single non-word-non-space chars — the
    * shape of a byte-pair pre-tokenizer's coarse split).
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("long")
          .as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_actual")
      )

  /** #31 Quality scoring: length/punctuation/stopword signals + a
    * composite score — the heuristic pre-filter stage of a training-
    * data pipeline.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    // aliased once: referencing the tokens expression from multiple
    // ratio columns would otherwise re-tokenize per reference
    val t = col("tok")
    val nTok = size(t).cast("double")
    val nChars = length(col("text")).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "\\p{Punct}", ""))).cast("double")
    val stops = array(stopwords.map(lit): _*)
    val nStop = size(filter(t, x => array_contains(stops, x))).cast("double")
    val punctRatio = when(nChars === 0, 0.0).otherwise(nPunct / nChars)
    val stopRatio = when(nTok === 0, 0.0).otherwise(nStop / nTok)
    val avgTokLen = when(nTok === 0, 0.0)
      .otherwise(length(regexp_replace(col("text"), "\\s", "")).cast("double") / nTok)
    Tables
      .documents(spark, dir)
      .withColumn("tok", tokens(col("text")))
      .select(
        col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        round(punctRatio, 4).as("punct_ratio"),
        round(stopRatio, 4).as("stopword_ratio"),
        round(avgTokLen, 4).as("avg_token_len"),
        round(least(lit(1.0), nTok / 100.0) * (lit(1.0) - punctRatio), 4).as("quality_score")
      )
  }

  /** #32 Language ID: stopword-profile heuristic — score each language
    * by how many of its marker words appear; argmax wins, 'und' when
    * nothing matches. Rows-only (the heuristic, not the label, is under
    * test: the synthetic corpus is English-lexicon word salad).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "a", "of", "and", "is", "to"),
      "de" -> Seq("der", "die", "das", "und", "ist", "zu"),
      "fr" -> Seq("le", "la", "les", "et", "est", "de"),
      "es" -> Seq("el", "la", "los", "y", "es", "de"),
      "zh" -> Seq("的", "了", "是", "在", "和", "有")
    )
    val t = col("tok") // aliased once — 5 language scores reference it
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(t, x => array_contains(array(words.map(lit): _*), x))).as("score"),
        lit(lang).as("lang")
      )
    }
    // argmax by (score, lang) — deterministic tiebreak on lang name
    val best = array_max(array(scores: _*))
    Tables
      .documents(spark, dir)
      .withColumn("tok", tokens(col("text")))
      .select(
        col("doc_id"),
        col("lang").as("label_lang"),
        when(best.getField("score") > 0, best.getField("lang")).otherwise("und").as("pred_lang"),
        best.getField("score").cast("long").as("marker_hits")
      )
  }
}
