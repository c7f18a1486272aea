package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Data Selection via Importance Resampling — the published DSIR recipe
 * (Xie et al. 2023, arXiv:2302.03169): score every raw-corpus document
 * by how much more likely its hashed n-gram features are under a small
 * TARGET corpus's bucket distribution than under the raw corpus's own,
 * then keep the top of the raw pool. This is the standard
 * "make the crawl look like the target domain" selection step between
 * quality filtering and mixing.
 *
 * Features are unigrams + bigrams of the standard word tokenization
 * ([[Text.tokens]]), hashed into `buckets` buckets with the PORTABLE
 * md5 bucket (first 8 md5 hex digits as an int, mod `buckets`) — the
 * [[Sampling.bucketHex]] transport, so any engine (and the x127 DuckDB
 * oracle) reproduces the exact bucket ids. Both distributions are
 * Laplace-smoothed (`+1` per bucket); the per-document score is
 *
 *   log_weight(d) = Σ_b c_d(b) · ln( p_target(b) / p_raw(b) )
 *
 * computed under the repo's transcendental contract (the
 * [[TextAnalysis.bigramSurprisalTokens]] precedent): ONE `ln` per
 * bucket, pinned @7 at its source; products rounded @9 and accumulated
 * in DECIMAL(28,9) so the sum is partition-order independent; final
 * weight rounded @6 IN DECIMAL SPACE, then cast to double (r10: the
 * sf0.1 up-probe caught one row whose exact 9-decimal sum ended in
 * ...500 at digit 7 — a true half-tie that Spark's shortest-repr
 * HALF_UP and DuckDB's scaled-double round resolve differently when
 * the re-round happens on the DOUBLE; rounding the decimal itself is
 * exact on both engines. Unlike the avg_nll family, there is no
 * division after the sum here, so half-ties are systematic, not
 * measure-zero).
 *
 * 100 TB shape: the corpus explodes to hashed-gram rows ONCE (lazy
 * localCheckpoint — the per-doc feature table feeds both the raw
 * distribution aggregate and the scoring join); the bucket log-ratio
 * table is ≤ `buckets` rows and BROADCASTS onto the scoring join; the
 * only corpus-sized shuffles are the (doc, bucket) condense and the
 * final per-doc sum, both partial→final hash aggregates. The target
 * corpus is small by definition (a benchmark/domain sample) and never
 * joins the raw corpus row-to-row.
 */
object Dsir {

  /** Portable md5 gram bucket in [0, buckets). */
  private[ops] def mdBucket(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"), lit(buckets))

  /** Per-document hashed feature counts `(doc_id, bucket, c)` over
    * unigrams + space-joined bigrams of [[Text.tokens]]. */
  def docFeatures(docs: DataFrame, buckets: Int): DataFrame =
    featuresTokens(docs.select(col("doc_id"), Text.tokens(col("text")).as("w")),
      buckets)

  /** [[docFeatures]] over a pre-tokenized `(doc_id, w)` frame. */
  def featuresTokens(toks: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 26),
      s"buckets $buckets outside [2, 2^26]")
    val uni = toks.select(col("doc_id"), explode(col("w")).as("g"))
    val bi = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))"))
        .as("g"))
    uni.unionByName(bi)
      .select(col("doc_id"), mdBucket(col("g"), buckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** DSIR log importance weights for every `raw` document against the
    * `target` corpus: `(doc_id, n_grams, log_weight)`. Documents with
    * zero grams (empty/whitespace text) carry no features and are
    * absent — they have no evidence either way; append them with
    * weight 0 upstream if the pipeline must keep them. An EMPTY target
    * corpus has no distribution to compare against: every weight comes
    * back null (the smoothing totals are null-propagating), which is
    * the honest answer — not zero. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 4096): DataFrame =
    importanceWeightsFeatures(docFeatures(raw, buckets),
      docFeatures(target, buckets), buckets)

  /** [[importanceWeights]] over pre-computed [[docFeatures]] frames —
    * the persisted-feature-table form (the repo's `*Tokens` overload
    * convention): at steady state the raw corpus's `(doc_id, bucket,
    * c)` table is a maintained artifact, and re-weighting against a
    * NEW target (the common loop: one crawl, many target domains)
    * costs one tiny target pass + the scoring join, never a raw-corpus
    * re-tokenize. */
  def importanceWeightsFeatures(rawFeatures: DataFrame,
      targetFeatures: DataFrame, buckets: Int): DataFrame = {
    // per-doc features feed BOTH the raw distribution and the scoring
    // join — one materialization (the x124 two-consumer lesson)
    val fr = rawFeatures.localCheckpoint(eager = false)
    val cr = fr.groupBy(col("bucket")).agg(sum(col("c")).as("cr"))
    val ct = targetFeatures
      .groupBy(col("bucket")).agg(sum(col("c")).as("ct"))
    val totals = cr.agg(sum(col("cr")).as("R"))
      .crossJoin(ct.agg(sum(col("ct")).as("T"))) // two 1-row aggregates
    // buckets never seen in raw cannot appear in a raw document — the
    // ratio table only needs raw-side buckets (target-only mass shows
    // up through T in the smoothing denominators)
    val ratio = cr.join(ct, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), round(log(
        ((col("ct") + 1).cast("double") * (col("R") + buckets).cast("double"))
          / ((col("cr") + 1).cast("double")
            * (col("T") + buckets).cast("double"))), 7).as("lr"))
    fr.join(broadcast(ratio), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        round(sum(round(col("c") * col("lr"), 9).cast(DecimalType(28, 9))), 6)
          .cast("double").as("log_weight"))
  }

  /** Top-`k` raw documents by DSIR weight (ties broken by doc_id) —
    * the deterministic selection head; plans as a distributed top-k
    * (TakeOrderedAndProject), never a global sort. For the paper's
    * gumbel-noised RESAMPLING variant feed `log_weight` to
    * [[Sampling.weightedSample]] as `exp(log_weight)` per-group. */
  def select(raw: DataFrame, target: DataFrame, k: Int,
      buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    importanceWeights(raw, target, buckets)
      .orderBy(col("log_weight").desc, col("doc_id"))
      .limit(k)
  }
}
