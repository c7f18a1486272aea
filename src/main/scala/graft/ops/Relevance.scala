package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Corpus-relevance scoring for training-data curation: BM25 ranking of
 * documents against a fixed term set (Robertson & Walker's Okapi BM25 —
 * the standard quality/topicality retrieval score; reference engines ship
 * it as a first-class text-pipeline primitive).
 *
 * 100 TB shape:
 *  - only (doc, query-term) MATCHING token instances leave the tokenize
 *    row (the term filter runs inside the per-row array before the
 *    explode), so the tf shuffle carries hits, not the corpus token
 *    stream;
 *  - corpus statistics (N, avgdl) are a one-row broadcast aggregate and
 *    per-term document frequencies are a |terms|-row broadcast — the
 *    big side shuffles once, on (doc, term), for the tf count;
 *  - the final top-k plans as TakeOrderedAndProject (per-partition
 *    heaps), never a global sort.
 *
 * Like every corpus-statistics operator here (percentile probe, unigram
 * LM), scoring against corpus-level stats is inherently multi-pass: the
 * stats and df branches re-execute the tokenize scan (lineage-pure by
 * repo convention — survives executor loss with no checkpoint). A 100 TB
 * user whose tokenize dominates persists `docs` (or the token frame)
 * upstream; the operator itself never caches behind the caller's back.
 *
 * Determinism contract (the x27 oracle hash-compares): the idf LOG pins
 * @7 at its source (the r07 transcendental contract — ln is the one op
 * JVM and libm may round differently, and a @9 pin on the downstream
 * product measurably straddled a boundary at sf0.1 scale in the
 * surprisal family), every per-term score is then rounded to 9 digits
 * and accumulated in DECIMAL(28,9), so the doc score is independent of
 * partitioning and summation order in both engines; constants are
 * spelled as the same IEEE ops on both sides (`k1 + 1`, `1 - b` — a
 * pre-folded 2.2 literal differs from 1.2+1 by one ulp); ties in the
 * rounded score break on doc_id.
 */
object Relevance {

  /** Top-k docs by BM25 against `terms`. Emits (doc_id, bm25); docs
    * containing no query term score 0 and are omitted (same as the
    * reference retrieval convention: no posting, no score). */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Tokens(docs.select(col("doc_id"), Text.tokens(col("text")).as("w")),
      terms, k, k1, b)

  /** [[bm25]] over a PRE-TOKENIZED `(doc_id, w: array<string>)` frame
    * ([[Text.tokens]]' shape). The corpus-stats branch and the tf branch
    * both consume this one frame, so a 100 TB caller who persists tokens
    * upstream pays the tokenize exactly once across all the corpus-stats
    * operators (VERDICT r06 next #4). */
  def bm25Tokens(toks: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val termSet = array(terms.map(lit): _*)
    // one-row corpus stats: doc count + average doc length (exact long
    // sum / long count — no fp accumulation-order dependence)
    val stats = toks.agg(
      count(lit(1)).as("n"),
      (sum(size(col("w"))).cast("double") / count(lit(1))).as("avgdl"))
    // per-(doc, term) frequencies: the filter runs BEFORE the explode so
    // non-matching tokens never become rows
    val tf = toks.select(col("doc_id"), size(col("w")).as("dl"),
        explode(filter(col("w"), t => array_contains(termSet, t))).as("token"))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // document frequency per query term: tf rows are distinct (doc, term)
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(docFreq), "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        // the idf LOG pins @7 (r07 transcendental contract): ln is the
        // one op where JVM and libm may differ in the last ulp; with it
        // pinned, the whole score chain is deterministic IEEE
        ((round(log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 7) *
          (col("tf") * lit(k1 + 1.0))) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(round(col("s"), 9).cast(DecimalType(28, 9))).cast("double"), 9)
        .as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
