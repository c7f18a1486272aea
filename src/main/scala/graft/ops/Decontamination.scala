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

  /** [[overlapHits]] behind a bloom-filter pre-probe — identical output
    * (the filter has NO false negatives, and the exact join removes its
    * false positives), different scale regime: the corpus gram stream is
    * pruned by a codegen'd bloom probe BEFORE any join, so the exact
    * verify join's probe side shrinks from |corpus grams| to
    * `hits + fpp x |corpus grams|`. That is what makes decontamination
    * against eval-gram sets TOO BIG TO BROADCAST feasible: with
    * `broadcastVerify = false` the survivors (contamination-proportional)
    * shuffle to a partitioned eval-gram table instead of every executor
    * holding the full set — the bloom blob (~1.2 bytes/gram at the
    * default sizing) is the only thing that ships everywhere. The blob
    * is built DISTRIBUTED (partial filters OR-merge) and only the one
    * binary value reaches the driver — the IVF-centroid metadata
    * precedent, not a corpus collect. */
  def overlapHitsBloom(train: DataFrame, eval: DataFrame, idCol: Column,
      textCol: Column, minHits: Int = 1,
      expectedEvalGrams: Long = 1L << 20,
      broadcastVerify: Boolean = true): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    require(expectedEvalGrams > 0,
      s"expectedEvalGrams must be > 0, got $expectedEvalGrams")
    val spark = train.sparkSession
    val evalGrams = eval
      .select(explode(TextHashExprs.tokenTrigramHashes(spark, textCol)).as("t"))
      .distinct()
    val bfBytes = evalGrams
      .agg(TextHashExprs.bloomAgg(spark, col("t"), expectedEvalGrams).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val trainGrams = train.select(idCol.as("doc_id"),
      explode(TextHashExprs.tokenTrigramHashes(spark, textCol)).as("t"))
    if (bfBytes == null) {
      // empty eval set: no gram can overlap
      trainGrams.select(col("doc_id"), lit(0L).as("n_hit")).limit(0)
    } else {
      val verify = if (broadcastVerify) broadcast(evalGrams) else evalGrams
      trainGrams
        .filter(TextHashExprs.bloomMightContain(spark, lit(bfBytes), col("t")))
        .join(verify, "t")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hit"))
        .filter(col("n_hit") >= minHits)
        .orderBy(col("doc_id"))
    }
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
    // positioned-gram front half and span-merge back half are the
    // shared `Text.positionedGramHashes` / `Text.mergeSpans` helpers
    // (one definition of the span-semantics contract — r07 review
    // finding: this merge and TextAnalysis.duplicatedSpans' were
    // hand-synchronized copies). UNORDERED span set out (see
    // Text.mergeSpans).
    val evalGrams = Text.positionedGramHashes(eval, idCol, textCol, 3)
      .select(col("gh")).distinct()
    val hits = Text.positionedGramHashes(train, idCol, textCol, 3)
      .join(broadcast(evalGrams), "gh")
    Text.mergeSpans(hits, 3)
  }
}
