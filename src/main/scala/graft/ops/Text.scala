package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared text primitives for the training-data pipeline operators
 * (tokenization, shingling, language scoring). Everything here is a pure
 * Catalyst expression tree built from `org.apache.spark.sql.functions` —
 * no UDFs, no serialization boundary. NOTE: the higher-order functions
 * (transform/filter/aggregate) evaluate their lambdas INTERPRETED, one
 * expression-tree walk per element — fine for cold paths and oracles,
 * but hot 100 TB scans should use the tight-loop expressions in
 * `graft.functions.TextHashExprs` (TextMetrics, TokenTrigramHashes)
 * instead; `graft.ops.TextAnalysis` does exactly that.
 */
object Text {

  /** Lowercased word tokens: split on non-word runs, drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => t =!= lit(""))

  /** Distinct word-trigram shingles; docs shorter than 3 tokens collapse to
    * a single whole-text shingle. Per-row, no shuffle. */
  def shingles3(toks: Column): Column = array_distinct(
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array(array_join(toks, " "))))

  /** Jaccard similarity of two pre-deduplicated arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Fraction of tokens that appear in `words` (stopword-hit ratio). */
  def hitRatio(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }
}
