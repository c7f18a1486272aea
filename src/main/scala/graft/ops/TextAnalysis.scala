package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextHashExprs

/**
 * Text-analysis operators for training-data curation: language ID
 * (stopword-ratio heuristic), quality scoring, token counting
 * (whitespace + a BPE-ish regex), and document fingerprinting.
 *
 * All four ride on ONE tight-loop Catalyst expression
 * (`TextHashExprs.TextMetrics`): a single tokenize pass per row emits
 * every raw metric as a struct, consumed through the `inline` generator
 * so the expression is evaluated exactly once per row — `CollapseProject`
 * would otherwise inline a projected struct into every field access
 * (the r02 finding: languageId's scored array was built twice per row,
 * and the HOF-lambda formulations it replaced were interpreted, not
 * codegen'd). Downstream arithmetic is cheap codegen'd column math.
 * Per-row, shuffle-free until the caller aggregates; streams at any
 * corpus size.
 */
object TextAnalysis {

  val stopEn: Seq[String] = TextHashExprs.stopWords.head._2

  /** (doc_id, <all metric columns>) — one TextMetrics eval per row. The
    * generator is the structural one-eval barrier. */
  private def metrics(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      inline(array(TextHashExprs.textMetrics(docs.sparkSession, col("text")))))

  /** Language ID: argmax over per-language signals — stopword-hit ratio
    * for the \w-tokenizable languages, CJK-char ratio for zh (`\w` is
    * ASCII in Java and RE2 alike, so Chinese text has NO word tokens and
    * its stopword list could never score — the old zh score was dead
    * code, r04 review). Docs with every signal at zero report 'und'
    * rather than winning on the tie-break. The argmax rides on Spark's
    * native struct ordering (score first, then tag); the max struct
    * passes through a second `inline` barrier so the scored array
    * builds ONCE per row (CollapseProject would inline it per field
    * access otherwise). */
  def languageId(docs: DataFrame): DataFrame = {
    val scored = array(TextHashExprs.stopWords.map { case (lang, _) =>
      struct(
        (if (lang == "zh")
          col("n_cjk").cast("double") / greatest(col("n_char"), lit(1)).cast("double")
        else
          col(s"stop_$lang").cast("double") /
            greatest(col("n_toks"), lit(1)).cast("double")).as("score"),
        lit(lang).as("lang"))
    }: _*)
    metrics(docs)
      .select(col("doc_id"), inline(array(struct(array_max(scored).as("best")))))
      .select(
        col("doc_id"),
        when(col("best.score") === 0.0, lit("und"))
          .otherwise(col("best.lang")).as("pred_lang"),
        Portable.r9(col("best.score")).as("best_score"))
      .orderBy(col("doc_id"))
  }

  /** Quality metrics: lengths, type/token ratio, punctuation density,
    * stopword ratio, average word length, composite score. */
  def quality(docs: DataFrame): DataFrame =
    metrics(docs).select(
        col("doc_id"), col("n_char"), col("n_tokens"), col("n_types"), col("n_punct"),
        Portable.r9(col("n_types").cast("double") / greatest(col("n_tokens"), lit(1))).as("ttr"),
        Portable.r9(col("n_punct").cast("double") / greatest(col("n_char"), lit(1))).as("punct_ratio"),
        Portable.r9(col("stop_en").cast("double") /
          greatest(col("n_toks"), lit(1)).cast("double")).as("stop_ratio"),
        Portable.r9(col("tok_len_sum").cast("double") /
          greatest(col("n_toks"), lit(1))).as("avg_word_len"))
      .withColumn("quality_score",
        Portable.r9(least(col("n_tokens").cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - col("punct_ratio"))))
      .orderBy(col("doc_id"))

  /** Token counts: whitespace tokens vs a BPE-ish regex (word runs or
    * single non-space punctuation — a proxy for subword token pressure). */
  def tokenCounts(docs: DataFrame): DataFrame =
    metrics(docs).select(
        col("doc_id"), col("ws_tokens"), col("re_tokens"), col("n_char"))
      .withColumn("chars_per_token",
        Portable.r9(col("n_char").cast("double") / greatest(col("re_tokens"), lit(1))))
      .orderBy(col("doc_id"))

  /** Content fingerprint: md5 over the sorted distinct token set — a
    * normalization-stable dedup key (word order / repetition invariant). */
  def fingerprint(docs: DataFrame): DataFrame =
    metrics(docs).select(col("doc_id"), col("fingerprint"), col("n_types"))
      .orderBy(col("doc_id"))

  /** Repetition / boilerplate signals (Gopher-style filters, Rae et al.
    * 2021 §A1.1): fraction of characters in duplicated lines, most-
    * frequent word 2/3-gram coverage, fraction of 5-gram instances that
    * are duplicates. One `RepetitionMetrics` eval per row through the
    * same `inline` one-eval barrier as the other text ops; ratios are
    * codegen'd column math. Per-row state only — no shuffle, streams at
    * any corpus size; typical filter thresholds: dup_line_frac > 0.3,
    * top_bigram_frac > 0.2, dup_fivegram_frac > 0.15. */
  def repetition(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        inline(array(TextHashExprs.repetitionMetrics(docs.sparkSession, col("text")))))
      .select(
        col("doc_id"), col("n_lines"), col("top_line_count"),
        round(col("dup_line_chars").cast("double") /
          greatest(col("line_chars"), lit(1L)), 9).as("dup_line_frac"),
        round(col("top_bigram_count").cast("double") /
          greatest(col("n_bigrams"), lit(1)), 9).as("top_bigram_frac"),
        round(col("top_trigram_count").cast("double") /
          greatest(col("n_trigrams"), lit(1)), 9).as("top_trigram_frac"),
        round(col("dup_fivegram_count").cast("double") /
          greatest(col("n_fivegrams"), lit(1)), 9).as("dup_fivegram_frac"))
      .orderBy(col("doc_id"))

  /** Corpus vocabulary statistics: the `k` tokens appearing in the most
    * documents, as `(token, df, doc_frac)` ordered by `(df DESC, token)`
    * — the input to data-driven stopword lists, document-frequency
    * quality filters, and tokenizer-training corpus profiling.
    *
    * 100 TB shape: per-doc DISTINCT tokens explode map-side, the
    * document-frequency count is a partial→final hash aggregate (the
    * map-side combine collapses each partition to its vocabulary before
    * the shuffle, so shuffle volume is Σ per-partition vocab, not token
    * instances), and the ordered `limit` plans as TakeOrderedAndProject —
    * per-partition top-k heaps, never a global sort. The corpus-size
    * denominator rides in as a broadcast one-row aggregate. */
  def documentFrequency(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = docs.agg(count(lit(1)).as("n"))
    docs.select(explode(array_distinct(Text.tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("token"), col("df"),
        Portable.r9(col("df").cast("double") / col("n")).as("doc_frac"))
      .orderBy(col("df").desc, col("token"))
      .limit(k)
  }

  /** Cross-document duplicated n-gram audit — the memorization-risk /
    * boilerplate signal over a corpus: for each doc, how much of its
    * (distinct) word-trigram set also appears in at least `minDocs`−1
    * OTHER documents. Docs dominated by cross-doc repeated spans are
    * templated/boilerplate (or duplicated training text that exact
    * dedup missed below the document level). Emits
    * (doc_id, n_grams, dup_grams, dup_frac) ordered by doc_id.
    *
    * 100 TB shape: grams travel as 8-byte xxhash64 values (the same
    * tight-loop trigram kernel the dedup family uses), already
    * DISTINCT per doc, so the document-frequency aggregate and the
    * gram-keyed join back carry per-doc gram VOCABULARY — bounded by
    * text size, never quadratic, with map-side partial aggregation on
    * the df pass. Like `unigramSurprisal`, scoring a corpus against
    * its own statistics is inherently two passes over the gram stream
    * — lineage-pure by repo convention; persist the gram frame
    * upstream if tokenization dominates. */
  def duplicatedNgrams(docs: DataFrame, minDocs: Int = 2): DataFrame =
    duplicatedNgramsGrams(
      docs.select(col("doc_id"),
        explode(TextHashExprs.tokenTrigramHashes(docs.sparkSession, col("text")))
          .as("gh")),
      minDocs)

  /** [[duplicatedNgrams]] over a PRE-COMPUTED gram frame — `(doc_id, gh)`
    * rows with gram hashes DISTINCT per doc (exactly what
    * `TextHashExprs.tokenTrigramHashes` explodes to). Both internal
    * branches (the df aggregate and the join back) consume this one
    * frame, so a 100 TB caller who persists the gram frame pays the
    * tokenize+hash pass exactly once — across this operator AND the
    * dedup family sharing the same kernel (VERDICT r06 next #4). */
  def duplicatedNgramsGrams(grams: DataFrame, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // rows are (doc, gram) with grams distinct per doc, so count(1) per
    // gram IS its document frequency
    val gramDf = grams.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    grams.join(gramDf, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("dup_grams"))
      .withColumn("dup_frac",
        Portable.r9(col("dup_grams").cast("double") / col("n_grams")))
      .orderBy(col("doc_id"))
  }

  /** WHERE the cross-document duplication sits — the span-surgery
    * counterpart of [[duplicatedNgrams]] (which only counts): maximal
    * token spans of each document whose word `n`-grams ALL appear in at
    * least `minDocs` distinct documents of the corpus, emitted as
    * `(doc_id, span_start, span_end, n_grams)` in 1-based token
    * coordinates. This is the exact-substring dedup shape from the
    * "train-data memorization" literature: instead of dropping a whole
    * near-duplicate document, cut precisely the duplicated runs
    * (license boilerplate, templated headers, quoted passages) and keep
    * the rest. Overlapping gram windows merge into one span (hits at
    * starts {5,6,9} with `n = 3` → spans [5,8] and [9,11] — merge
    * requires window OVERLAP, same contract as
    * `Decontamination.contaminatedSpans`). Duplication is CROSS-doc by
    * contract (`minDocs` counts distinct documents): a gram repeated
    * only within one document is `repetition`'s signal, not this one.
    * Docs shorter than `n` tokens carry no gram and emit nothing.
    * Returns an UNORDERED span set (the relational contract — a global
    * sort above this tree re-executes the lineage for range sampling
    * under AQE; sort the small result downstream for a listing).
    *
    * 100 TB shape: grams travel as positioned 8-byte xxhash64 rows; the
    * document-frequency pass aggregates per-doc-DISTINCT gram
    * vocabulary (map-side combine on the 8-byte key), and the join back
    * is a plain equi-join on that key — AQE converts it to broadcast at
    * runtime when the duplicated-gram set is small (the common case:
    * volume proportional to actual duplication), and degrades to a
    * shuffle join, never a cartesian, when a boilerplate-heavy corpus
    * makes it large. Only MATCHING (doc, position) rows reach the
    * span merge, whose two stacked windows share one (doc_id)
    * exchange+sort. Two passes over the gram STREAM are inherent
    * (corpus scored against its own statistics), but the tokenize +
    * gram hashing is not: the positioned gram frame materializes ONCE
    * behind a lazy localCheckpoint (two consumers — the df aggregate
    * and the join back — would each re-tokenize the corpus otherwise;
    * the [[graft.ops.Dedup.minhashLsh]] signature-table precedent,
    * including its lineage-truncation durability trade).
    * [[duplicatedSpansGrams]] still takes a caller-persisted positioned
    * frame when the grams feed further consumers (the x101 cut shape). */
  def duplicatedSpans(docs: DataFrame, n: Int = 5,
      minDocs: Int = 2): DataFrame =
    duplicatedSpansGrams(
      Text.positionedGramHashes(docs, col("doc_id"), col("text"), n)
        .localCheckpoint(eager = false),
      n, minDocs)

  /** [[duplicatedSpans]] over a PRE-COMPUTED positioned gram frame —
    * `(doc_id, start, gh)` rows, `start` 1-based and unique per doc,
    * `gh` the hash of the `n` tokens at `start`. Both internal branches
    * (the df aggregate and the join back) consume this one frame. */
  def duplicatedSpansGrams(grams: DataFrame, n: Int,
      minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val dup = grams.groupBy(col("gh"))
      .agg(count_distinct(col("doc_id")).as("__ds_df"))
      .filter(col("__ds_df") >= minDocs)
      .select(col("gh"))
    Text.mergeSpans(grams.join(dup, "gh"), n)
  }

  /** APPLY a span cut list — [[duplicatedSpans]]' (or
    * `Decontamination.contaminatedSpans`'s) acting counterpart, the
    * surgical alternative to dropping whole documents: remove the
    * tokens covered by each doc's spans and emit
    * `(doc_id, clean_text, n_cut)`, every input document retained
    * (no spans → unchanged text, fully-covered → empty string).
    * `clean_text` is TOKEN-NORMALIZED (lowercased `\W+` tokens
    * rejoined with single spaces — the span coordinates live in that
    * token space, so the rebuild must too); `n_cut` counts removed
    * tokens. NULL/empty text yields an empty clean_text with 0 cut.
    *
    * 100 TB shape: one (doc_id)-keyed shuffle joins the (tiny,
    * contamination-proportional) span list onto the corpus; the
    * rebuild is a pure per-row projection over the materialized token
    * array (the Generate-inline barrier — the lambda re-eval pitfall),
    * order-independent in the collected span list (membership only),
    * so `collect_list`'s nondeterministic ordering cannot leak into
    * results. */
  def cutSpans(docs: DataFrame, spans: DataFrame): DataFrame =
    cutSpansTokens(
      docs.select(col("doc_id"),
        inline(array(struct(Text.tokens(col("text")).as("__cs_w"))))),
      spans)

  /** [[cutSpans]] over a PRE-TOKENIZED frame — `(doc_id, __cs_w:
    * array<string>)` rows. A caller who persists the token table pays
    * the tokenize once across span LOCATION (via
    * [[duplicatedSpansGrams]]) and the cut — x101 pays it per stage
    * (lineage-pure by repo convention). */
  def cutSpansTokens(toked: DataFrame, spans: DataFrame): DataFrame = {
    val sp = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__cs_sp"))
    toked.join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("__cs_w"),
        coalesce(col("__cs_sp"),
          array().cast("array<struct<s:int,e:int>>")).as("__cs_s"))
      .select(col("doc_id"),
        coalesce(size(col("__cs_w")), lit(0)).as("__cs_n"),
        when(coalesce(size(col("__cs_w")), lit(0)) >= 1,
          filter(
            transform(sequence(lit(1), size(col("__cs_w"))), i =>
              struct(i.as("i"), element_at(col("__cs_w"), i).as("t"))),
            st => !exists(col("__cs_s"),
              s => st("i") >= s("s") && st("i") <= s("e"))))
          .otherwise(array().cast("array<struct<i:int,t:string>>"))
          .as("__cs_k"))
      .select(col("doc_id"),
        array_join(transform(col("__cs_k"), st => st("t")), " ")
          .as("clean_text"),
        (col("__cs_n") - size(col("__cs_k"))).cast("bigint").as("n_cut"))
  }

  /** Top-`k` bigram collocations by lift — how much more often two
    * tokens appear ADJACENT than unigram frequencies predict
    * (`(n2/T2) / ((n1_a/T1)·(n1_b/T1))`, i.e. pointwise mutual
    * information without the log). The log is deliberately omitted:
    * `ln` implementations differ in the last ulp across engines, while
    * IEEE multiply/divide are exactly rounded, so the ratio form is
    * bit-for-bit reproducible against a SQL oracle and orders
    * identically. `(lift desc, a, b)` is a total order, making the
    * LIMIT set deterministic.
    *
    * Scale: the unigram and bigram count subtrees appear on several
    * branches (both join sides, both totals), but they are canonically
    * equal, so AQE's shuffle-stage reuse collapses them at runtime —
    * the executed sf0.01 plan carries 2 ReusedQueryStage markers
    * (pinned in CollocationsSpec), bounding the corpus passes at a
    * small constant independent of `k`. Every join/aggregate past
    * those scans is VOCAB-sized, never corpus-sized, the totals are
    * 1-row broadcasts, and the top-k plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort). Bigrams explode from one
    * array transform per row behind the Generate barrier. `t2` sums
    * the UNfiltered bigram counts, so `minCount` prunes candidates
    * without biasing the denominator. */
  // The docs→tokens convenience wrappers of the multi-consumer corpus-
  // stats ops materialize the token frame ONCE behind a lazy
  // localCheckpoint (r11 optimization round): their *Tokens bodies feed
  // two+ independent exchanges (pair counts AND unigram counts; instance
  // stream AND vocabulary), each of which re-ran the tokenize otherwise —
  // the minhashLsh signature-table precedent, with the same
  // lineage-truncation durability trade. Callers who already hold a
  // persisted token table keep using the *Tokens forms directly.
  def collocations(docs: DataFrame, minCount: Long = 5, k: Int = 50): DataFrame =
    collocationsTokens(docs.select(Text.tokens(col("text")).as("w"))
      .localCheckpoint(eager = false), minCount, k)

  /** [[collocations]] over a PRE-TOKENIZED frame — any frame with a
    * `w: array<string>` column ([[Text.tokens]]' output shape). All four
    * count branches (unigrams, bigrams, both totals) consume this one
    * frame, so a caller who persists tokens once pays the tokenize once
    * across every corpus-stats operator (VERDICT r06 next #4). */
  def collocationsTokens(toks: DataFrame, minCount: Long = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount/k must be >= 1")
    val pairRows = toks.select(explode(when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1), i =>
          struct(element_at(col("w"), i).as("a"),
            element_at(col("w"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    liftRank(toks, pairRows, minCount, k)
  }

  /** Shared lift pipeline for [[collocationsTokens]] /
    * [[cooccurrenceTokens]]: unigram counts + totals from `toks`, pair
    * counts + total from the `(a, b)` instance rows, then
    * `(n2/T2)/((n1_a/T1)·(n1_b/T1))` — mirroring the oracles' shape
    * exactly (one definition of the lift contract). `minCount` filters
    * AFTER `T2` sums the unfiltered counts. */
  private def liftRank(toks: DataFrame, pairRows: DataFrame,
      minCount: Long, k: Int): DataFrame = {
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n1"))
    val t1 = uni.agg(sum(col("n1")).as("t1"))
    val pairs = pairRows.groupBy("a", "b").agg(count(lit(1)).as("n2"))
    val t2 = pairs.agg(sum(col("n2")).as("t2"))
    pairs.filter(col("n2") >= minCount)
      .join(uni.select(col("t").as("a"), col("n1").as("__n1a")), "a")
      .join(uni.select(col("t").as("b"), col("n1").as("__n1b")), "b")
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .select(col("a"), col("b"), col("n2"),
        ((col("n2") / col("t2")) /
          ((col("__n1a") / col("t1")) * (col("__n1b") / col("t1")))).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Top-`k` windowed co-occurrence pairs by lift — the skip-gram /
    * embedding-training precompute [[collocations]] (adjacent-only,
    * directional) cannot express: UNORDERED token pairs within a
    * ±`window` token distance, scored by the same log-free PMI ratio
    * (`(n2/T2) / ((n1_a/T1)·(n1_b/T1))` — IEEE multiply/divide are
    * exactly rounded, so the ratio is bit-for-bit cross-engine and
    * orders identically; `(lift desc, a, b)` totals the order). Pairs
    * canonicalize `(least, greatest)` at generation, so (a,b) and
    * (b,a) occurrences pool; same-token pairs ("the … the") are real
    * co-occurrences and kept. `minCount` prunes candidates without
    * biasing `T2` (summed over UNfiltered pair counts, the x40
    * contract).
    *
    * Scale: pair fan-out is `window` structs per token position from
    * one Generate per row — bounded, no self-join; both count
    * aggregates are VOCAB-sized past their scans, totals are 1-row
    * broadcasts, top-k plans as TakeOrderedAndProject. The unigram and
    * pair subtrees scan the tokens twice (lineage-pure by repo
    * convention — [[cooccurrenceTokens]] takes a persisted frame). */
  def cooccurrence(docs: DataFrame, window: Int = 4, minCount: Long = 5,
      k: Int = 50): DataFrame =
    cooccurrenceTokens(docs.select(Text.tokens(col("text")).as("w"))
      .localCheckpoint(eager = false), // see collocations: two consumers
      window, minCount, k)

  /** [[cooccurrence]] over a pre-tokenized `(w: array<string>)` frame. */
  def cooccurrenceTokens(toks: DataFrame, window: Int, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1 && k >= 1, s"minCount/k must be >= 1")
    // inner sequence is always ascending: outer i stops at n-1 (the
    // size>=2 guard makes n-1 >= 1), so i+1 <= least(i+window, n).
    // The lambda emits RAW (w[i], w[j]) structs — canonicalization and
    // the null guard run once per pair in the codegen'd post-explode
    // projection, not 4 element_at walks inside the interpreted HOF.
    val pairArr = flatten(transform(sequence(lit(1), size(col("w")) - 1), i =>
      transform(
        sequence(i + 1, least(i + lit(window), size(col("w")))),
        j => struct(element_at(col("w"), i).as("a"),
          element_at(col("w"), j).as("b")))))
    val pairRows = toks.select(explode(when(size(col("w")) >= 2, pairArr)
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      // a NULL token element pairs with NOTHING: Spark's least/greatest
      // SKIP nulls (the Sampling.decaySample footgun), which would
      // fabricate a same-token pair from (null, t) — drop first
      .filter(col("p.a").isNotNull && col("p.b").isNotNull)
      .select(least(col("p.a"), col("p.b")).as("a"),
        greatest(col("p.a"), col("p.b")).as("b"))
    liftRank(toks, pairRows, minCount, k)
  }

  /** Top-`k` tokens of every group by document frequency — the
    * per-domain vocabulary profile ([[documentFrequency]] partitioned
    * by a group column; "what does each source talk about"). The
    * `(df desc, token)` order is total within a group, so the kept set
    * is deterministic.
    *
    * Scale: the aggregate shuffles (group, token) pairs — per-doc
    * DISTINCT tokens, so a token counts once per document — and the
    * rank filter is the WindowGroupLimit shape ([[Selection
    * .topPerGroup]]): per-group top-k heaps BEFORE the window's
    * exchange, so only ≤ k rows per (task, group) reach the sort. */
  def topTokensPerGroup(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val df = docs
      .select(col(groupCol),
        explode(array_distinct(Text.tokens(col("text")))).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("df"))
    Selection.topPerGroup(df, col(groupCol),
      Seq(col("df").desc, col("token")), k)
  }

  /** Cross-group vocabulary overlap matrix — for every group pair
    * `(group_a < group_b)` the intersection size, union size, and
    * Jaccard of the two groups' DISTINCT token sets: the drift /
    * redundancy audit between sources ("is src7 just src3 under a new
    * domain?") and the input to source-level mixture decisions. Pairs
    * sharing no tokens still appear (n_inter 0), so the matrix is
    * complete: G·(G−1)/2 rows. Null groups are excluded (the pair
    * predicate orders groups, and NULL orders against nothing — the
    * same drop contract as the mixture operators).
    *
    * 100 TB shape: per-doc DISTINCT tokens explode map-side and
    * collapse to the (group, token) VOCABULARY with one
    * partial→final aggregate — shuffle volume is Σ group vocab, never
    * the token instance stream; that vocab frame is the barrier
    * (localCheckpoint) feeding the three consumers (sizes + both
    * self-join sides), so the corpus is tokenized exactly once. The
    * pair counts come from the vocab token self-join: candidate volume
    * is Σ_token m_t² with m_t ≤ G groups containing the token — at
    * most G²·|vocab| for the (small) domain count G, independent of
    * corpus row count. The G-row size table broadcasts onto the
    * G²-row result. */
  def sourceOverlap(docs: DataFrame, groupCol: String): DataFrame = {
    val vocab = docs
      .select(col(groupCol).as("g"),
        explode(array_distinct(Text.tokens(col("text")))).as("token"))
      .distinct()
      .localCheckpoint(eager = false)
    val sizes = vocab.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = vocab.as("a").join(vocab.as("b"),
        col("a.token") === col("b.token") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("ga"), col("b.g").as("gb"))
      .agg(count(lit(1)).as("n_inter"))
    sizes.as("sa").join(sizes.as("sb"), col("sa.g") < col("sb.g"))
      .join(inter,
        col("ga") === col("sa.g") && col("gb") === col("sb.g"), "left")
      .select(col("sa.g").as("group_a"), col("sb.g").as("group_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (col("sa.n") + col("sb.n") - coalesce(col("n_inter"), lit(0L)))
          .as("n_union"),
        round(coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("sa.n") + col("sb.n") - coalesce(col("n_inter"), lit(0L))), 9)
          .as("jaccard"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Unigram-LM surprisal: per-doc mean negative log-likelihood under the
    * corpus's own unigram distribution — the classic cheap "perplexity"
    * quality filter (docs far from the corpus distribution score high).
    * Emits (doc_id, n_toks, avg_nll) for docs with ≥1 token.
    *
    * 100 TB shape: the corpus is reduced to per-doc (token, tf) rows
    * FIRST (one groupBy collapses repeated tokens, so the LM join carries
    * per-doc vocabulary, not the token instance stream), the unigram
    * table derives from those same rows with a map-side-combining
    * aggregate, and the corpus-total denominator broadcasts as one row.
    * The token-keyed LM join is the honest shuffle; at real vocabulary
    * sizes it cannot broadcast. Two passes over the tokenized corpus are
    * inherent to "score the corpus under its own LM" — lineage-pure by
    * repo convention (persist the token frame upstream and use
    * [[unigramSurprisalTokens]] if the tokenize is the dominant cost).
    *
    * Determinism: the per-term LOG pins @7 before the tf multiply (the
    * r07 transcendental contract — ln is the one non-IEEE-exact op and
    * @9-rounding the product measurably straddled a boundary at sf0.1
    * scale in the bigram sibling), then terms accumulate in
    * DECIMAL(28,9) — partition/summation-order independent in both
    * engines (the x28 oracle hash-compares). */
  def unigramSurprisal(docs: DataFrame): DataFrame =
    unigramSurprisalTokens(
      docs.select(col("doc_id"), Text.tokens(col("text")).as("w")))

  /** Per-group KL divergence from the corpus token distribution —
    * `KL(P_g ‖ P_corpus) = Σ_t p_g(t)·ln(p_g(t)/p_c(t))` — the
    * quantified form of "how far has this source drifted from the
    * corpus": the number the [[sourceOverlap]] matrix only hints at,
    * and the drift alarm an ingest pipeline monitors per batch.
    * Emits `(groupCol, n_tokens, kl_unigram)`; null groups drop
    * (the mixture contract). Every group token is corpus vocabulary,
    * so `p_c > 0` always — no smoothing needed.
    *
    * Determinism: the log pins @7 (the one non-IEEE-exact op — JVM vs
    * libm last-ulp variance measured flipping a 9th digit at sf0.1
    * scale before the pin); terms then accumulate in
    * DECIMAL(28,9) (the x28 contract — order-independent, ln's last
    * ulp absorbed); every division is written double/double in the
    * same order on both engines.
    *
    * 100 TB shape: one (group, token) count aggregate bounds every
    * downstream frame at vocabulary size — the corpus totals, group
    * totals, and the token-keyed join all derive from it; token
    * INSTANCES never cross a second shuffle. */
  def sourceDivergence(docs: DataFrame, groupCol: String): DataFrame = {
    val cs = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("g"), col("token")).agg(count(lit(1)).as("cs"))
    val ts = cs.groupBy(col("g")).agg(sum(col("cs")).as("ts"))
    val c = cs.groupBy(col("token")).agg(sum(col("cs")).as("c"))
    val t = c.agg(sum(col("c")).as("t"))
    val pg = col("cs").cast("double") / col("ts").cast("double")
    val pc = col("c").cast("double") / col("t").cast("double")
    cs.join(ts, "g").join(c, "token").crossJoin(broadcast(t))
      .groupBy(col("g").as(groupCol), col("ts").as("n_tokens"))
      .agg(round(sum(round(pg * round(log(pg / pc), 7), 9)
          .cast(DecimalType(28, 9))).cast("double"), 9).as("kl_unigram"))
      .orderBy(col(groupCol))
  }

  /** Per-group token-distribution Shannon entropy — the vocabulary-
    * diversity datasheet stat: `H = ln(n) − (Σ c·ln c)/n` over the
    * group's token counts, with the type count and type/token ratio
    * riding along. Complements [[sourceDivergence]]: KL answers "how
    * far from the corpus mix", this answers "how diverse is the group
    * on its own" — a boilerplate-heavy source shows low H even when
    * its KL is small. NULL groups drop (the mixture contract).
    *
    * Determinism: the r07 transcendental contract — ln@7 at source,
    * term@9 into DECIMAL(28,9) (exact, order-independent), final @6
    * with −0.0 normalized; ttr (exact integer ratio) reports @9.
    *
    * 100 TB shape: map-side combine condenses token INSTANCES to
    * per-partition (group, token) partials, so the first exchange
    * carries Σ partition vocabularies, never the token stream; the
    * per-group reduce is vocabulary-sized. [[tokenEntropyTokens]]
    * takes a persisted token frame (the pay-tokenize-once convention). */
  def tokenEntropy(docs: DataFrame, groupCol: String): DataFrame =
    tokenEntropyTokens(docs.select(col(groupCol),
      Text.tokens(col("text")).as("w")), groupCol)

  /** [[tokenEntropy]] over a pre-tokenized frame `(groupCol, w: array)`. */
  def tokenEntropyTokens(toks: DataFrame, groupCol: String): DataFrame = {
    val cnt = toks.filter(col(groupCol).isNotNull)
      .select(col(groupCol), explode(col("w")).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("c"))
    val cd = col("c").cast("double")
    cnt.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(round(cd * round(log(cd), 7), 9)
          .cast(DecimalType(28, 9))).as("__te_sm"))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        Portable.r9(col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (Portable.r6(round(log(col("n_tokens").cast("double")), 7)
            - col("__te_sm").cast("double") / col("n_tokens").cast("double"))
          + lit(0.0)).as("entropy"))
      .orderBy(col(groupCol))
  }

  /** Mutual information between two categorical columns — the
    * dependence audit for mixture design: `MI(lang; source)` near 0
    * means language mix is homogeneous across sources; large MI means
    * sources specialize, so source-level sampling reshapes the
    * language mix too (and any per-source quality threshold doubles as
    * a hidden language filter). Emits ONE row
    * `(n, h_a, h_b, mi)` — entropies ride along so the caller can
    * normalize (`mi / min(h_a, h_b)`). Rows with a NULL in either
    * column drop (the mixture contract).
    *
    * Determinism: each `ln` pins @7 at source (the r07 transcendental
    * contract), every term rounds @9 then accumulates in
    * DECIMAL(28,9); sum-only finals re-round @9.
    *
    * 100 TB shape: ONE corpus pass — the (a, b) cell-count aggregate —
    * bounds every downstream frame at contingency-table size (|A|·|B|
    * cells); the marginals, totals, and entropy sums all derive from
    * it, and AQE's stage reuse collapses the repeated cell subtree at
    * runtime (the x40 mechanism, spec-pinned). Row instances never
    * cross a second shuffle. */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("nab"))
    val ca = cells.groupBy(col("a")).agg(sum(col("nab")).as("na"))
    val cb = cells.groupBy(col("b")).agg(sum(col("nab")).as("nb"))
    val tot = cells.agg(sum(col("nab")).as("n"))
    val pab = col("nab").cast("double") / col("n").cast("double")
    val pa = col("na").cast("double") / col("n").cast("double")
    val pb = col("nb").cast("double") / col("n").cast("double")
    val mi = cells.join(ca, "a").join(cb, "b").crossJoin(broadcast(tot))
      .agg(round(sum(round(pab * round(log(pab / (pa * pb)), 7), 9)
        .cast(DecimalType(28, 9))).cast("double"), 9).as("mi"))
    val ha = ca.crossJoin(broadcast(tot))
      .agg(round(sum(round(-pa * round(log(pa), 7), 9)
        .cast(DecimalType(28, 9))).cast("double"), 9).as("h_a"))
    val hb = cb.crossJoin(broadcast(tot))
      .agg(round(sum(round(-pb * round(log(pb), 7), 9)
        .cast(DecimalType(28, 9))).cast("double"), 9).as("h_b"))
    tot.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .crossJoin(broadcast(mi))
      .select(col("n"), col("h_a"), col("h_b"), col("mi"))
  }

  /** Bigram-LM surprisal with interpolation smoothing: per-doc mean
    * negative log-likelihood of each token given its predecessor under
    * the corpus's own interpolated bigram model
    * `P(b|a) = λ·c₂(a,b)/c₁(a) + (1−λ)·c₁(b)/T` — the step up from
    * [[unigramSurprisal]] that scores local fluency, not just token
    * rarity (boilerplate with plausible unigrams but scrambled order
    * scores high here). Emits `(doc_id, n_bigrams, avg_nll)` for docs
    * with ≥2 tokens. Convention: both the history and the current
    * token use raw unigram counts `c₁` (no end-of-doc discount) —
    * stated because the oracle restates it identically.
    *
    * 100 TB shape (the x28 pattern, one level up): the corpus collapses
    * to per-doc (a, b, tf) bigram-VOCABULARY rows before any join, the
    * bigram and unigram LM tables derive from those same frames with
    * map-side-combining aggregates, and the corpus total broadcasts as
    * one row. Per-(doc,bigram) surprisal logs pin @7 before the
    * tf multiply, then accumulate in DECIMAL(28,9) —
    * partition/summation-order independent in both engines, with ln's
    * last-ulp variance removed at its source (the r07 transcendental
    * contract: @9-rounding the PRODUCT still straddled one boundary in
    * 250k terms at sf0.1). */
  def bigramSurprisal(docs: DataFrame, lambda: Double = 0.75): DataFrame =
    bigramSurprisalTokens(
      docs.select(col("doc_id"), Text.tokens(col("text")).as("w"))
        .localCheckpoint(eager = false), // see collocations: two consumers
      lambda)

  /** [[bigramSurprisal]] over a PRE-TOKENIZED `(doc_id, w)` frame (the
    * persisted-token-table form, VERDICT r06 next #4's contract). */
  def bigramSurprisalTokens(toks: DataFrame, lambda: Double = 0.75): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    val docBg = toks.filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS a, w[i+1] AS b))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("doc_id"), col("a"), col("b")).agg(count(lit(1)).as("tf"))
    val bgCnt = docBg.groupBy(col("a"), col("b")).agg(sum(col("tf")).as("n2"))
    val uni = toks
      .select(col("doc_id"), explode(col("w")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("total"))
    val p = lit(lambda) * col("n2") / col("c1a") +
      lit(1.0 - lambda) * col("c1b") / col("total").cast("double")
    // Join order kept AS IS, deliberately (r11 optimization round): p
    // is a function of the bigram alone, so attaching c1a/c1b/total to
    // the bigram VOCAB first and joining the doc×bigram table once on
    // (a, b) looks strictly better at scale (the instance table would
    // cross one join exchange instead of three). The restatement was
    // implemented and A/B-measured SLOWER at bench scale (1.3–1.5 s →
    // 2.0–2.2 s): with every count table under the broadcast threshold
    // the instance table crosses NO exchange today, and the reorder
    // instead made the planner broadcast the doc-level aggregate and
    // re-derive it inside the vocab branch. Revisit only with a plan
    // dump showing the three joins actually shuffling the instance
    // table (i.e. vocab above the broadcast threshold).
    docBg
      .join(bgCnt, Seq("a", "b"))
      .join(uni.select(col("token").as("a"), col("c1").as("c1a")), "a")
      .join(uni.select(col("token").as("b"), col("c1").as("c1b")), "b")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        // log pinned @7 for the same reason as unigramSurprisalTokens:
        // p is bit-identical cross-engine (pure IEEE arithmetic in a
        // stated order), ln is not — sf0.1 measured one flipped 9th
        // digit before this pin. Final mean floor-rounded (r10, see
        // portableRound6) so no round() convention survives the chain.
        portableRound6(sum(round(col("tf") * round(log(lit(1.0) / p), 7), 9)
            .cast(DecimalType(28, 9))).cast("double") / sum(col("tf")))
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Deflate compression-ratio quality signal `(doc_id, n_bytes,
    * deflate_ratio)` ordered by doc_id — the CCNet-style
    * repetitiveness proxy: templated/degenerate text compresses far
    * below 1, near-random text sits close to (or, for short inputs,
    * above) 1. Empty docs carry a null ratio. The ratio is
    * deterministic per JVM build but not SQL-restatable (no deflate in
    * DuckDB) — the x85 row is rows-only and x85b pins the
    * self-repetition INVARIANT (text·4 must compress strictly better
    * than text) as a hard oracle.
    *
    * Scale: a pure codegen'd projection — one static Zlib call per row
    * behind a per-thread Deflater, no shuffle, no state. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      TextHashExprs.deflateRatio(spark, col("text")).as("deflate_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Cross-corpus repeated-span (boilerplate) REMOVAL — the acting
    * counterpart of [[duplicatedNgrams]]'s audit: each document's text
    * is partitioned into consecutive `blockTokens`-token blocks (split
    * on the single space, the byte-preserving [[Text.chunkWindows]]
    * contract; the final block may be partial), a block whose text
    * appears in more than `maxDocs` DISTINCT documents is boilerplate,
    * and the cleaned document is the in-order rejoin of its surviving
    * blocks. Emits `(doc_id, clean_text, n_blocks, kept_blocks)`
    * ordered by doc_id; a fully-boilerplate document survives with
    * `clean_text = ''` (never silently dropped — the caller decides).
    * Block identity travels as xxhash64(block) — two DIFFERENT 8-token
    * blocks colliding in 64 bits is the same negligible-odds
    * equivalence the dedup family documents (x02b).
    *
    * 100 TB shape: blocks explode through one `inline` Generate (the
    * one-eval barrier — the transform runs once per row); the
    * document-frequency aggregate shuffles per-doc-DISTINCT 8-byte
    * hashes (map-side combined — Σ partition block-vocabulary, never
    * token instances); the keep-filter is a hash-keyed join of block
    * instances against that vocabulary-sized df table; reassembly is
    * one hash aggregate whose per-GROUP array is bounded by a single
    * document (the [[Text.assemble]] shape — no window, no global
    * sort). The block frame feeds TWO heavy consumers in [[stripTail]]
    * (the df aggregate and the keep join — no shared exchange, so AQE
    * cannot collapse them), so this wrapper materializes it ONCE behind
    * a lazy localCheckpoint (the r11 multi-consumer corpus-stats rule;
    * previously the split+slice+array_join explode ran twice). The
    * `(doc_id, n_blocks)` base stays a lineage-pure light projection of
    * the corpus (size(split) only — no block assembly), preserving the
    * NULL-text contract (a null-text doc keeps its null n_blocks row,
    * which a blocks-frame-derived base would silently drop).
    *
    * Cache-footprint / fault-tolerance caveat (ADVICE r11): unlike the
    * metadata-sized frames this convention usually wraps, the
    * checkpointed block frame here is the fully-exploded CORPUS — the
    * lazy localCheckpoint pins it MEMORY_AND_DISK for the call's
    * lifetime and truncates lineage (an executor lost after
    * materialization fails the job instead of recomputing; the x83
    * trade in [[graft.ops.Sessions]], on the winning side here: the
    * duplicated work is an expensive split+slice+array_join explode,
    * measured 1.61 → 0.94–1.30 s at sf0.1). A 100 TB caller should use
    * [[stripBoilerplateBlocks]] with caller-managed persistence (a
    * durable parquet block frame) instead of this wrapper's
    * executor-storage pin. */
  def stripBoilerplate(docs: DataFrame, blockTokens: Int = 8,
      maxDocs: Int = 1): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive, got $blockTokens")
    val toks = split(col("text"), " ")
    // token counts are far below 2^53, so the double floor-div is exact
    val nb = ((size(toks) + (blockTokens - 1)).cast("double") / blockTokens)
      .cast("int")
    val blocks = docs.select(col("doc_id"),
      inline(transform(sequence(lit(0), nb - 1), i => struct(
        i.cast("int").as("idx"),
        array_join(slice(toks, i * blockTokens + 1, lit(blockTokens)), " ")
          .as("blk")))))
      .localCheckpoint(eager = false)
    stripTail(blocks, docs.select(col("doc_id"), nb.as("n_blocks")), maxDocs)
  }

  /** [[stripBoilerplate]] over a PRE-COMPUTED block frame — `(doc_id,
    * idx, blk)` rows, exactly what the string form explodes to (the
    * persisted-frame convention, VERDICT r06 next #4): a 100 TB caller
    * who persists the block frame pays the tokenize/explode pass once
    * across the df branch, the keep branch, AND the per-doc totals
    * (derived here as max(idx)+1 from the frame itself, so no corpus
    * rescan exists on any branch). */
  def stripBoilerplateBlocks(blocks: DataFrame, maxDocs: Int = 1): DataFrame =
    stripTail(blocks,
      blocks.groupBy(col("doc_id"))
        .agg((max(col("idx")) + 1).cast("int").as("n_blocks")),
      maxDocs)

  private def stripTail(blocks: DataFrame, base: DataFrame,
      maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val hashed = blocks.withColumn("bh", xxhash64(col("blk")))
    // rows are distinct (doc, block-hash) pairs, so count(1) IS the
    // block's document frequency — the duplicatedNgramsGrams pattern
    val blockDf = hashed.select(col("doc_id"), col("bh")).distinct()
      .groupBy(col("bh")).agg(count(lit(1)).as("df"))
    val kept = hashed.join(blockDf, "bh").filter(col("df") <= maxDocs)
    val assembled = kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("idx").as("p"), col("blk").as("t")))),
            s => s.getField("t")),
          " ").as("clean_text"),
        count(lit(1)).cast("int").as("kept_blocks"))
    base
      .join(assembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_blocks"),
        coalesce(col("kept_blocks"), lit(0)).as("kept_blocks"))
      .orderBy(col("doc_id"))
  }

  /** Per-document top-`k` TF-IDF keyword extraction with a LOG-FREE
    * idf: `score = tf · N / df` — the log is deliberately omitted (the
    * [[collocations]] rationale: `ln` differs in the last ulp across
    * engines while IEEE multiply/divide are exactly rounded, so the
    * ratio form is bit-for-bit reproducible and, for a FIXED tf, orders
    * identically; across different tf values the linear-idf ranking is
    * a documented variant, not log-tf-idf). `(score desc, token)` is a
    * total order per doc, making each doc's top-k deterministic. Emits
    * `(doc_id, token, tf, df, score, rank)` ordered by (doc_id, rank).
    *
    * 100 TB shape: ONE token explode feeds both the (doc, token) tf
    * aggregate and — through it — the df aggregate (df counts tf rows
    * per token, so it shuffles the per-doc vocabulary, map-side
    * combined); N broadcasts as a one-row aggregate; the per-doc top-k
    * row_number filter plans as WindowGroupLimit (per-partition heaps
    * BEFORE the window shuffle — spec-pinned). */
  def tfidfKeywords(docs: DataFrame, k: Int = 3): DataFrame =
    tfidfKeywordsTokens(
      docs.select(col("doc_id"), Text.tokens(col("text")).as("w")), k)

  /** [[tfidfKeywords]] over a PRE-TOKENIZED `(doc_id, w: array<string>)`
    * frame (the persisted-token-table form, VERDICT r06 next #4). */
  def tfidfKeywordsTokens(toks: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = toks.select(col("doc_id"), explode(col("w")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    // tf has one row per (doc, token) -> count per token IS its df
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = toks.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        Portable.r9((col("tf") * col("n")).cast("double") / col("df")).as("score"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("doc_id", "token", "tf", "df", "score", "rank")
      .orderBy(col("doc_id"), col("rank"))
  }

  /** [[unigramSurprisal]] over a PRE-TOKENIZED `(doc_id, w: array<string>)`
    * frame. Both the per-doc tf reduction and (through it) the LM table
    * derive from this one frame, so a persisted token frame is scanned —
    * not re-tokenized — on both passes (VERDICT r06 next #4). */
  def unigramSurprisalTokens(toks: DataFrame): DataFrame = {
    val docTf = toks
      .select(col("doc_id"), explode(col("w")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val unigrams = docTf.groupBy(col("token")).agg(sum(col("tf")).as("cnt"))
    val total = unigrams.agg(sum(col("cnt")).as("total"))
    // the LOG itself rounds @7 (r07): ln is the only non-IEEE-exact op
    // in the chain — JVM and libm differ in the last ulp — and rounding
    // the downstream PRODUCT @9 left a measured ~2e-6/term chance of
    // straddling a rounding boundary (one flipped 9th digit per ~250k
    // terms at sf0.1). Pinning the transcendental at @7 makes every
    // later op (int×double, DECIMAL cast, sum, divide) deterministic
    // IEEE on both engines; the mean's precision loss is ≤5e-8.
    docTf.join(unigrams, "token")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_toks"),
        // the final mean divides the (exact) decimal sum by the count,
        // so its value sits anywhere relative to a rounding grid. @6
        // narrowed the disagreement window (r07) but one sf0.001 row
        // still landed a quotient whose shortest repr ends in '5' at
        // digit 7 — Spark's BigDecimal HALF_UP and DuckDB's scaled
        // round disagree exactly there. floor(x·10⁶+0.5)/10⁶ (r10, the
        // hexThreshold precedent) is pure IEEE arithmetic on the
        // bit-identical quotient, so BOTH engines derive the identical
        // double — no round() convention in the chain at all.
        portableRound6(sum(round(col("tf") * round(log(col("total").cast("double") / col("cnt")), 7), 9)
            .cast(DecimalType(28, 9))).cast("double") / sum(col("tf")))
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Engine-portable 6-decimal rounding: `floor(x·10⁶ + 0.5) / 10⁶` —
    * pure IEEE ops every engine computes bit-identically, where
    * `round(x, 6)` pits Spark's shortest-repr HALF_UP against DuckDB's
    * scaled-double rounding on boundary quotients (the
    * `Sampling.hexThresholdCol` floor precedent, applied r10 after the
    * sf0.001 probe measured one flipped last digit). Half-way values
    * round toward +∞ — for the nonnegative quantities this family
    * emits, identical to half-away-from-zero. */
  private def portableRound6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Out-of-vocabulary rate per document — the tokenizer-design /
    * domain-shift metric: with the corpus's own top-`vocabSize` tokens
    * (by INSTANCE count, ties broken by token ascending for a total
    * order) as the vocabulary, what fraction of each doc's token
    * instances fall outside it. High-OOV docs are the ones a
    * fixed-vocab model will fragment into many subword pieces — the
    * rate ranks docs by tokenizer fit and flags vocabulary drift
    * between corpus snapshots. Emits `(doc_id, n_tokens, oov_tokens,
    * oov_rate)` ordered; docs with ZERO tokens (empty/null text) are
    * absent by contract — an OOV rate over nothing is undefined.
    *
    * 100 TB shape: the vocabulary is a distributed top-k
    * (map-side-combined token counts, then TakeOrderedAndProject —
    * never a global sort) and is broadcast for the membership probe,
    * so the token-instance stream joins shuffle-free; the per-doc
    * aggregate is partial→final keyed on doc_id (one partial row per
    * partition×doc). Tokenizing twice (vocab pass + membership pass)
    * is inherent to scoring a corpus against its own statistics —
    * lineage-pure by repo convention; [[oovRateTokens]] takes a
    * persisted token frame to pay tokenize once. */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame =
    oovRateTokens(docs.select(col("doc_id"),
        Text.tokens(col("text")).as("w"))
      .localCheckpoint(eager = false), // see collocations: two consumers
      vocabSize)

  /** [[oovRate]] over a pre-tokenized frame `(doc_id, w: array)`. */
  def oovRateTokens(toks: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val inst = toks.select(col("doc_id"), explode(col("w")).as("token"))
    val vocab = inst.groupBy(col("token"))
      .agg(count(lit(1)).as("__ov_c"))
      .orderBy(col("__ov_c").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("__ov_in"))
    inst.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__ov_in").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        Portable.r9(col("oov_tokens").cast("double") / col("n_tokens")))
      .orderBy(col("doc_id"))
  }

  /** Per-document character-SCRIPT histogram + dominant-script label —
    * the audit [[languageId]]'s token heuristics sit on top of: counts
    * of Latin letters, CJK ideographs (U+4E00–U+9FFF), Cyrillic
    * (U+0400–U+04FF), digits, and whitespace, plus a deterministic
    * dominant-script CASE (`cjk`/`latin`/`cyrillic`/`other`, ties
    * resolved in that order). Mixed-script rows are the classic spam /
    * encoding-damage signal a multilingual curation pass filters on.
    * NULL text drops. Counts are exact integers over explicit
    * codepoint-range classes (engine-portable — no \\p{script}
    * properties, whose tables differ across regex engines; whitespace
    * is the explicit `[ \\t\\n\\r]` class because Java's \\s and RE2's
    * \\s disagree on vertical tab).
    *
    * 100 TB shape: a pure shuffle-free projection (five counting
    * regex passes per row — string-length work, no join, no
    * aggregate); streams at any corpus size. */
  def scriptProfile(docs: DataFrame): DataFrame = {
    val t = col("text")
    def cnt(pattern: String) =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    docs.filter(t.isNotNull)
      .select(col("doc_id"),
        length(t).cast("long").as("n_chars"),
        cnt("[A-Za-z]").as("n_latin"),
        cnt("[\\u4E00-\\u9FFF]").as("n_cjk"),
        cnt("[\\u0400-\\u04FF]").as("n_cyrillic"),
        cnt("[0-9]").as("n_digit"),
        cnt("[ \\t\\n\\r]").as("n_space"))
      .withColumn("script",
        when(col("n_cjk") >= col("n_latin")
          && col("n_cjk") >= col("n_cyrillic") && col("n_cjk") > 0, "cjk")
        .when(col("n_latin") >= col("n_cyrillic") && col("n_latin") > 0, "latin")
        .when(col("n_cyrillic") > 0, "cyrillic")
        .otherwise("other"))
      .orderBy(col("doc_id"))
  }

  /** Per-document Shannon entropy of the character distribution —
    * `(doc_id, n_cp, n_distinct_cp, entropy)` with
    * `H = ln(n) − (Σ c·ln c)/n` over codepoint counts. The gibberish /
    * low-diversity quality gate: encoding damage, single-char padding
    * and keyboard-mash score near 0 while natural text sits in a
    * narrow per-script band — the complement of [[quality]]'s
    * token-level ratios at the finest granularity there is. Empty and
    * NULL texts drop (a zero-length doc has no distribution to score).
    *
    * Determinism contract lives in
    * [[graft.functions.TextHashExprs.CharEntropy]] (ln@7, term@9 with
    * exact BigDecimal accumulation, final @6, −0.0 normalized).
    *
    * 100 TB shape: ONE local [[graft.functions.TextHashExprs.CharEntropy]]
    * eval per row behind the same `inline` one-eval barrier as the
    * other text ops — a pure shuffle-free projection; the per-doc
    * character hash-map lives for one row and never leaves the
    * executor. The naive SQL form (explode chars → two aggregates)
    * would shuffle every CHARACTER INSTANCE in the corpus — at 100 TB
    * that is the corpus itself as shuffle traffic, and it is exactly
    * what this expression avoids. */
  def charEntropy(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"),
        inline(array(TextHashExprs.charEntropy(docs.sparkSession, col("text")))))
      .orderBy(col("doc_id"))

  /** Apply an externally-trained hashed-feature linear text classifier
    * (the fastText / CCNet-quality-filter shape) at corpus scale:
    * `score = round(bias + mean_t weights[h(t) mod |weights|], 6)` over
    * the word tokens of each document — `(doc_id, n_toks, score)`,
    * zero-token documents absent by contract (a mean over no features
    * is undefined; the [[oovRate]] precedent). The feature hash is the
    * portable md5 bucket ([[Sampling.bucketHex]]), so any engine with
    * md5 scores identically — training happens offline; this operator
    * is the APPLY pass.
    *
    * Determinism: each term rounds @9 then accumulates in
    * DECIMAL(28,9) (order-independent); the divided final reports @6
    * (the x28 contract). Weight lookup and the mean are IEEE-exact.
    *
    * 100 TB shape: pure projection → explode → one partial→final
    * aggregate keyed on doc_id; the weight table is a LITERAL array
    * (model parameters are metadata, the IVF-centroid precedent) so
    * there is no join and nothing broadcasts but the plan itself.
    * [[linearScoreTokens]] takes a persisted token frame. */
  def linearScore(docs: DataFrame, weights: Array[Double],
      bias: Double = 0.0, seed: Int = 7): DataFrame =
    linearScoreTokens(docs.select(col("doc_id"),
      Text.tokens(col("text")).as("w")), weights, bias, seed)

  /** [[linearScore]] over a pre-tokenized frame `(doc_id, w: array)`. */
  def linearScoreTokens(toks: DataFrame, weights: Array[Double],
      bias: Double = 0.0, seed: Int = 7): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val d = weights.length
    val bucket = conv(Sampling.bucketHex(col("token"), seed), 16, 10)
      .cast("long") % d
    toks.select(col("doc_id"), explode(col("w")).as("token"))
      .select(col("doc_id"),
        round(element_at(typedLit(weights.toSeq), (bucket + 1).cast("int")), 9)
          .as("term"))
      .groupBy(col("doc_id"))
      // final @6 is FLOOR FORM, not round(): the sum/count quotient's
      // shortest decimal repr can terminate in a 5 at digit 7 (e.g.
      // 0.2534375), where Spark's round (BigDecimal of the shortest
      // repr, HALF_UP) and DuckDB (binary-value round) resolve the
      // apparent tie differently — the x127/x28 class, CAUGHT by the
      // r11 fixture-skew probe on a real row. floor(x·1e6 + 0.5)/1e6
      // is pure IEEE on the identical quotient double, so both engines
      // agree bit-for-bit.
      .agg(count(lit(1)).as("n_toks"),
        (floor((lit(bias) + sum(col("term").cast(DecimalType(28, 9)))
          .cast("double") / count(lit(1))) * lit(1.0e6) + lit(0.5))
          / lit(1.0e6)).as("score"))
      .orderBy(col("doc_id"))
  }

  /** Cross-corpus surprisal — the CCNet-style language-model filter
    * shape: score every `raw` document by its average negative
    * log-likelihood under the TARGET corpus's add-1-smoothed unigram
    * LM (vocabulary = raw ∪ target, so unseen tokens carry defined
    * Laplace mass). Low `avg_nll` = "reads like the target domain";
    * CCNet keeps the low-perplexity head/middle. Complements
    * [[Dsir.importanceWeights]]: DSIR scores p_target/p_raw odds,
    * this scores absolute target fit. Emits
    * `(doc_id, n_toks, avg_nll)`; zero-token docs are absent (the
    * x28 convention — a mean over nothing is undefined).
    *
    * Numerics: the x63 transcendental contract — one `ln` per (doc,
    * token) ratio pinned @7, products @9 into DECIMAL(28,9),
    * final mean @6 — so the score is restatable cross-engine.
    *
    * 100 TB shape: per-doc tf condenses map-side before the join;
    * the target LM table is vocab-sized and joins hash-equi on the
    * token (AQE broadcasts it while it fits); the union-distinct
    * vocabulary count shuffles vocabularies, never token streams. */
  def crossSurprisal(raw: DataFrame, target: DataFrame): DataFrame =
    crossSurprisalTokens(
      raw.select(col("doc_id"), Text.tokens(col("text")).as("w")),
      target.select(col("doc_id"), Text.tokens(col("text")).as("w")))

  /** [[crossSurprisal]] over pre-tokenized `(doc_id, w)` frames. */
  def crossSurprisalTokens(rawToks: DataFrame,
      targetToks: DataFrame): DataFrame = {
    val docTf = rawToks
      .select(col("doc_id"), explode(col("w")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val tgt = targetToks
      .select(explode(col("w")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("ct"))
    val totals = tgt.agg(sum(col("ct")).as("__t"))
      .crossJoin(docTf.select(col("token"))
        .union(tgt.select(col("token"))).distinct()
        .agg(count(lit(1)).as("__v"))) // two 1-row aggregates
    docTf.join(tgt, Seq("token"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_toks"),
        portableRound6(sum(round(col("tf") * round(log(
            (col("__t") + col("__v")).cast("double")
              / (col("ct") + 1).cast("double")), 7), 9)
            .cast(DecimalType(28, 9))).cast("double") / sum(col("tf")))
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** EXACT corpus heavy hitters — every token whose count strictly
    * exceeds n/k (n = total token count) with its exact count,
    * `(token, cnt)` ordered (cnt desc, token) — without the full-
    * vocabulary shuffle [[documentFrequency]] pays. Two passes:
    *
    *  1. a per-partition Misra-Gries summary with k counters
    *     (`mapPartitions` — genuinely imperative per-partition state)
    *     emits each partition's candidate set. Pigeonhole guarantee:
    *     f(x) > n/k forces f_p(x) > n_p/k in at least one partition p,
    *     and MG with k counters retains every item above n_p/k — so
    *     the union of partition candidates is a SUPERSET of the true
    *     heavy hitters (≤ k·partitions rows, shuffled once through a
    *     distinct);
    *  2. the exploded token stream joins the BROADCAST candidate set
    *     and only candidate tokens enter the exact partial→final
    *     count aggregate — the shuffle carries ≤ k·partitions² rows,
    *     never the vocabulary.
    *
    * The threshold test is exact integer arithmetic (`cnt · k > n`,
    * no division), and the final row set is a pure function of the
    * data: the MG candidate SET varies with partitioning, but any
    * superset filtered by the exact threshold yields identical rows.
    * The token stream materializes once behind a lazy localCheckpoint
    * (three consumers: MG pass, total count, scoring join — the
    * [[Dedup.minhashLsh]] signature-table precedent). */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k $k outside [2, 100000]")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(Text.tokens(col("text"))).as("token"))
      .localCheckpoint(eager = false)
    val cand = toks.as[String].mapPartitions { it =>
      // Misra-Gries with k counters: decrement-all fires ≤ n_p/k times
      // and each firing is O(k), so the pass is O(n_p) amortized
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k => counters.update(t, 1L)
          case None =>
            counters.mapValuesInPlace((_, c) => c - 1)
            counters.filterInPlace((_, c) => c > 0)
        }
      }
      counters.keysIterator
    }.toDF("token").distinct()
    val total = toks.agg(count(lit(1)).as("n_tokens"))
    toks.join(broadcast(cand), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n_tokens"))
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Zipf-law fit over the corpus's top-`k` token frequencies — the
    * corpus-health datasheet stat: least-squares slope/intercept of
    * ln(count) against ln(rank), rank 1 = most frequent token (ties
    * break token-ascending — a total order, so the top-k SET and the
    * ranking are deterministic). Natural-language corpora slope near
    * −1 (Zipf 1949); a boilerplate/template flood flattens the head
    * toward 0 and a dedup failure steepens it — the one-number drift
    * alarm a corpus datasheet tracks across snapshots. One row:
    * `(k_used, zipf_slope, zipf_intercept)`.
    *
    * Determinism (the repo's r10 transcendental contract): ln pins @7
    * at source (floor form — the only non-IEEE-exact op here); the
    * four normal-equation sums accumulate floor-form-@9 terms in
    * DECIMAL(38,9) (exact, order-independent); the closed-form
    * slope/intercept divisions run double/double in one written order
    * on both engines, final floor-form @9.
    *
    * 100 TB shape: token instances condense map-side into ONE
    * vocabulary-sized count aggregate; the top-k plans as
    * TakeOrderedAndProject (per-partition heaps, never a global
    * sort); the rank window and the fit run over the k-row frame —
    * the single-partition window is k rows by construction. */
  def zipfFit(docs: DataFrame, k: Int = 200): DataFrame =
    zipfFitTokens(docs.select(Text.tokens(col("text")).as("w")), k)

  /** [[zipfFit]] over a pre-tokenized frame `(w: array<string>)`. */
  def zipfFitTokens(toks: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val counts = toks.select(explode(col("w")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(k)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    def pin7(c: org.apache.spark.sql.Column) =
      floor(c * lit(1.0e7) + lit(0.5)) / lit(1.0e7)
    def t9(c: org.apache.spark.sql.Column) =
      (floor(c * lit(1.0e9) + lit(0.5)) / lit(1.0e9)).cast(DecimalType(38, 9))
    val s = counts
      .withColumn("__zx", pin7(log(row_number().over(win).cast("double"))))
      .withColumn("__zy", pin7(log(col("cnt").cast("double"))))
      .agg(count(lit(1)).as("n"),
        sum(t9(col("__zx"))).as("sx"), sum(t9(col("__zy"))).as("sy"),
        sum(t9(col("__zx") * col("__zx"))).as("sxx"),
        sum(t9(col("__zx") * col("__zy"))).as("sxy"))
      .select(col("n"), col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"),
        col("sxx").cast("double").as("sxxd"),
        col("sxy").cast("double").as("sxyd"))
    val n = col("n").cast("double")
    // nullif: a 0/1-token vocabulary has no line to fit — the
    // denominator is exactly 0 and the quotient would be NaN; the
    // honest-null posture (the temperatureMixture r11 lesson) surfaces
    // the degenerate fit as null slope/intercept instead
    val slope = (n * col("sxyd") - col("sxd") * col("syd")) /
      nullif(n * col("sxxd") - col("sxd") * col("sxd"), lit(0.0))
    s.select(col("n").cast("long").as("k_used"),
      (floor(slope * lit(1.0e9) + lit(0.5)) / lit(1.0e9)).as("zipf_slope"),
      (floor((col("syd") - slope * col("sxd")) / n * lit(1.0e9) + lit(0.5))
        / lit(1.0e9)).as("zipf_intercept"))
  }

  /** Per-document maximum consecutive-identical-token run — the
    * degenerate-repetition gate ("the the the …", LM-generation loops,
    * copy-paste stutter) that [[repetition]]'s duplicate-n-gram
    * FRACTIONS deliberately don't isolate: a single long loop in an
    * otherwise clean document moves the fractions little but is
    * exactly what a training-data filter must drop. Emits
    * `(doc_id, n_tokens, max_run)`; tokenless docs (empty/NULL text)
    * report (0, 0) — a run over nothing is zero, not undefined,
    * because the filter semantics are "no degenerate run found".
    *
    * 100 TB shape: ONE `aggregate` higher-order fold per row over the
    * token array — a shuffle-free projection. The windowed SQL form
    * (explode → lag → run-group sum → two aggregates) ships every
    * TOKEN INSTANCE through a doc-keyed exchange — at corpus scale
    * that is the corpus as shuffle traffic (the charEntropy argument);
    * the fold keeps it row-local. The lambda is interpreted (HOFs
    * don't codegen) but touches each token once. */
  def maxTokenRun(docs: DataFrame): DataFrame = {
    val w = Text.tokens(col("text"))
    val ini = struct(lit(null).cast("string").as("p"),
      lit(0).as("c"), lit(0).as("b"))
    val fold = aggregate(w, ini,
      (st, t) => {
        val c = when(t === st.getField("p"), st.getField("c") + 1)
          .otherwise(lit(1))
        struct(t.as("p"), c.as("c"),
          greatest(st.getField("b"), c).as("b"))
      },
      st => st.getField("b"))
    docs.select(col("doc_id"),
        coalesce(size(w), lit(0)).as("n_tokens"),
        coalesce(fold, lit(0)).as("max_run"))
      .withColumn("n_tokens", when(col("n_tokens") < 0, 0)
        .otherwise(col("n_tokens")))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary coverage curve — for each requested vocab size `k`,
    * the fraction of corpus TOKEN INSTANCES covered by the top-k token
    * TYPES (by instance count, ties token-ascending — a total order,
    * so every prefix set is deterministic). THE number a tokenizer /
    * vocab-size decision reads: "32k types cover 97.1% of running
    * text" — and its drift across snapshots is a cheap distribution
    * alarm. Emits one row per k: `(vocab_k, types_used, covered,
    * total, coverage)`; `types_used` < k when the vocabulary is
    * smaller than k. Exact integer sums; the only division is one
    * exact-input ROUND(,9) per row.
    *
    * 100 TB shape: token instances condense map-side into ONE
    * vocabulary-sized count table (lazy localCheckpoint — every k
    * consumes it; the two-consumer lesson), each k's prefix is a
    * TakeOrderedAndProject top-k (per-partition heaps) into a
    * one-row sum, and the instance total broadcasts. */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1, got $ks")
    val counts = docs
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val total = counts.agg(coalesce(sum(col("cnt")), lit(0L)).as("total"))
    val perK = ks.map { k =>
      counts.orderBy(col("cnt").desc, col("token")).limit(k)
        .agg(lit(k).as("vocab_k"), count(lit(1)).as("types_used"),
          coalesce(sum(col("cnt")), lit(0L)).as("covered"))
    }.reduce(_ unionByName _)
    perK.crossJoin(broadcast(total))
      .withColumn("coverage",
        when(col("total") > 0,
          Portable.r9(col("covered").cast("double") / col("total").cast("double")))
          .otherwise(lit(0.0)))
      .orderBy(col("vocab_k"))
  }

  /** Per-document encoding-anomaly audit — the mojibake / transcoding-
    * damage gate a multilingual crawl runs before any content filter:
    * counts of U+FFFD replacement characters (a decoder already gave
    * up), non-whitespace C0/DEL control characters (binary bleed,
    * terminal garbage), and U+00C2/U+00C3 marks (the signature lead
    * bytes of UTF-8 text re-decoded as Latin-1 — "Ã©" for "é"),
    * plus their pooled per-char rate. Emits `(doc_id, n_chars,
    * n_replacement, n_control, n_mojibake_marks, anomaly_rate)`;
    * NULL text drops (the [[scriptProfile]] contract). The character
    * classes are explicit codepoint escapes, engine-portable (Java
    * regex and RE2 read `\x{..}`/`\xNN` ranges identically; no
    * property classes whose tables drift across engines).
    *
    * 100 TB shape: a pure shuffle-free projection (three counting
    * regex passes per row); streams at any corpus size — the same
    * shape as [[scriptProfile]]. */
  def encodingAnomalies(docs: DataFrame): DataFrame = {
    val t = col("text")
    def cnt(pattern: String) =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    docs.filter(t.isNotNull)
      .select(col("doc_id"),
        length(t).cast("long").as("n_chars"),
        cnt("\\x{FFFD}").as("n_replacement"),
        cnt("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]").as("n_control"),
        cnt("[\\x{C2}\\x{C3}]").as("n_mojibake_marks"))
      .withColumn("anomaly_rate",
        when(col("n_chars") > 0,
          Portable.r9((col("n_replacement") + col("n_control")
            + col("n_mojibake_marks")).cast("double")
            / col("n_chars").cast("double")))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }
}
