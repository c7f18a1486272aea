package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation: language ID
 * (stopword-ratio heuristic), quality scoring, token counting
 * (whitespace + a BPE-ish regex), and document fingerprinting.
 * All pure Catalyst expression trees — per-row, codegen'd, shuffle-free
 * until the caller aggregates; they stream at any corpus size.
 */
object TextAnalysis {

  val stopEn = Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")
  private val stopSets = Seq(
    "en" -> stopEn,
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "en", "que"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "en", "que"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "von", "zu", "mit"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** Language ID: argmax over per-language stopword-hit ratios. The argmax
    * rides on Spark's native struct ordering (score first, then tag). */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    val scored = array(stopSets.map { case (lang, words) =>
      struct(Text.hitRatio(toks, words).as("score"), lit(lang).as("lang"))
    }: _*)
    docs.select(
        col("doc_id"),
        array_max(scored).getField("lang").as("pred_lang"),
        round(array_max(scored).getField("score"), 9).as("best_score"))
      .orderBy(col("doc_id"))
  }

  /** Quality metrics: lengths, type/token ratio, punctuation density,
    * stopword ratio, average word length, composite score. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    docs.select(
        col("doc_id"),
        length(col("text")).cast("int").as("n_char"),
        size(regexp_extract_all(col("text"), lit("\\w+"), lit(0))).cast("int").as("n_tokens"),
        size(array_distinct(regexp_extract_all(lower(col("text")), lit("\\w+"), lit(0))))
          .cast("int").as("n_types"),
        size(regexp_extract_all(col("text"), lit("[^\\w\\s]"), lit(0))).cast("int").as("n_punct"),
        toks.as("toks"))
      .select(
        col("doc_id"), col("n_char"), col("n_tokens"), col("n_types"), col("n_punct"),
        round(col("n_types").cast("double") / greatest(col("n_tokens"), lit(1)), 9).as("ttr"),
        round(col("n_punct").cast("double") / greatest(col("n_char"), lit(1)), 9).as("punct_ratio"),
        round(Text.hitRatio(col("toks"), stopEn), 9).as("stop_ratio"),
        round(
          aggregate(transform(col("toks"), t => length(t)), lit(0), (a, x) => a + x)
            .cast("double") / greatest(size(col("toks")), lit(1)), 9).as("avg_word_len"))
      .withColumn("quality_score",
        round(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - col("punct_ratio")), 9))
      .orderBy(col("doc_id"))
  }

  /** Token counts: whitespace tokens vs a BPE-ish regex (word runs or
    * single non-space punctuation — a proxy for subword token pressure). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit(""))).cast("int").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))).cast("int").as("re_tokens"),
        length(col("text")).cast("int").as("n_char"))
      .withColumn("chars_per_token",
        round(col("n_char").cast("double") / greatest(col("re_tokens"), lit(1)), 9))
      .orderBy(col("doc_id"))

  /** Content fingerprint: md5 over the sorted distinct token set — a
    * normalization-stable dedup key (word order / repetition invariant). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        md5(array_join(sort_array(array_distinct(Text.tokens(col("text")))), " ")
          .cast("binary")).as("fingerprint"),
        size(array_distinct(Text.tokens(col("text")))).cast("int").as("n_types"))
      .orderBy(col("doc_id"))
}
