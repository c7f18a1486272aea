package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs

/**
 * Benchmark decontamination: flag training documents that share word-trigram
 * shingles with a (small) evaluation/benchmark corpus, so they can be dropped
 * or down-weighted before training. This is the n-gram-overlap check every
 * large-scale pipeline runs against its eval sets; the reference engine has
 * no such operator (it is an extension, like the rest of `graft.ops`).
 *
 * 100 TB shape:
 *  - the eval side is aggregated to a DISTINCT shingle-hash set and
 *    **broadcast** — eval benchmarks are tiny relative to the corpus (at most
 *    millions of n-grams = a few MB of 8-byte hashes), so the corpus never
 *    shuffles for the join;
 *  - the training side is a map-side `explode` of per-row shingle hashes
 *    (one `TokenTrigramHashes` eval per row — the expression feeds the
 *    Generate directly, nothing references it twice) followed by the
 *    broadcast inner join, so only MATCHING (doc, shingle) rows ever reach
 *    the aggregation shuffle: post-join volume is proportional to actual
 *    contamination, not corpus size;
 *  - shingles ride as xxhash64 hashes (8 bytes, tight-loop expression), the
 *    same representation the dedup operators use; a false hit needs an
 *    xxhash64 collision between one doc's trigrams and the eval set
 *    (~2^-64 per pair), which the DuckDB string-shingle oracle would flag.
 */
object Decontamination {

  /** Per-document count of distinct word-trigram shingles shared with
    * `eval`'s text. Returns `(doc_id, n_hit)` for documents with at least
    * `minHits` overlapping shingles, ordered by `doc_id`. Per-doc shingle
    * arrays are already distinct (`TokenTrigramHashes` dedups), so the
    * post-join count is a distinct-overlap count without a `COUNT
    * (DISTINCT)`. */
  def overlapHits(train: DataFrame, eval: DataFrame, idCol: Column,
      textCol: Column, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val spark = train.sparkSession
    val evalGrams = eval
      .select(explode(TextHashExprs.tokenTrigramHashes(spark, textCol)).as("t"))
      .distinct()
    train
      .select(idCol.as("doc_id"),
        explode(TextHashExprs.tokenTrigramHashes(spark, textCol)).as("t"))
      .join(broadcast(evalGrams), "t")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") >= minHits)
      .orderBy(col("doc_id"))
  }

  /** WHERE the contamination sits: maximal token spans of each training
    * document whose word-trigrams all appear in the eval corpus —
    * `(doc_id, span_start, span_end, n_grams)` in 1-based token
    * coordinates, overlapping trigram windows merged (hits at starts
    * {5,6,9} with span width 3 → spans [5,8] and [9,11]). [[overlapHits]]
    * answers "drop this doc?"; this answers "cut exactly these spans" —
    * the surgical alternative when a long document embeds one
    * benchmark passage. Documents (either side) shorter than 3 tokens
    * carry no trigram and emit nothing — span surgery below trigram
    * granularity is not meaningful.
    *
    * 100 TB shape: same broadcast discipline as [[overlapHits]] (the
    * corpus never shuffles for the membership join; positioned grams
    * are a map-side posexplode). Only MATCHING (doc, position) rows
    * reach the merge, whose two stacked windows share one (doc_id)
    * exchange+sort — volume proportional to actual contamination. */
  def contaminatedSpans(train: DataFrame, eval: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the token array materializes behind a Generate-inline barrier
    // BEFORE the gram lambda references it: HOFs run interpreted and a
    // raw `Text.tokens(text)` column would re-execute the regex split
    // at every element_at reference inside the lambda (3 per position —
    // the lambda re-eval pitfall; measured 12 s → ~1 s at sf0.1).
    // CollapseProject cannot inline through a Generate, so `__dsw` is a
    // per-row attribute by the time the trigram transform indexes it.
    def tokenized(df: DataFrame, id: Column): DataFrame = df
      .select(id.as("doc_id"),
        inline(array(struct(Text.tokens(textCol).as("__dsw")))))
    def gramArr(toks: Column): Column =
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i =>
          xxhash64(concat_ws(" ", element_at(toks, i),
            element_at(toks, i + 1), element_at(toks, i + 2)))))
        .otherwise(array().cast("array<bigint>"))
    val evalGrams = tokenized(eval, idCol)
      .select(explode(gramArr(col("__dsw"))).as("t")).distinct()
    val hits = tokenized(train, idCol)
      .select(col("doc_id"), posexplode(gramArr(col("__dsw"))))
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("col").as("t"))
      .join(broadcast(evalGrams), "t")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    // UNORDERED span set (the relational contract — a global sort above
    // this tree re-executes the lineage for range sampling under AQE);
    // sort the small result downstream if a listing is needed.
    hits
      .withColumn("__ds_new",
        when(lag(col("start"), 1).over(w).isNull ||
          col("start") > lag(col("start"), 1).over(w) + 2, 1).otherwise(0))
      .withColumn("__ds_isl", sum(col("__ds_new")).over(w))
      .groupBy(col("doc_id"), col("__ds_isl"))
      .agg(min(col("start")).cast("int").as("span_start"),
        (max(col("start")) + 2).cast("int").as("span_end"),
        count(lit(1)).as("n_grams"))
      .drop("__ds_isl")
  }
}
