package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Positioned word `n`-gram hashes — `(doc_id, start, gh)` rows,
    * `start` 1-based in token coordinates, `gh` the xxhash64 of the
    * `n` space-joined tokens at `start`; docs shorter than `n` emit
    * nothing. The shared front half of every span locator
    * (`Decontamination.contaminatedSpans`,
    * `TextAnalysis.duplicatedSpans`). The token array materializes
    * behind the Generate-inline barrier BEFORE the gram lambda indexes
    * it (the lambda re-eval pitfall — HOFs run interpreted and would
    * re-execute the regex split per element_at reference otherwise;
    * CollapseProject cannot inline through a Generate). */
  def positionedGramHashes(df: DataFrame, idCol: Column, textCol: Column,
      n: Int): DataFrame =
    positionedGramHashesTokens(
      df.select(idCol.as("doc_id"),
        inline(array(struct(tokens(textCol).as("__pg_w"))))),
      "__pg_w", n)

  /** [[positionedGramHashes]] over a PRE-TOKENIZED `(doc_id,
    * <tokenCol>: array<string>)` frame — a caller whose pipeline also
    * consumes the token arrays elsewhere (the x101 locate-then-cut
    * shape) persists the token frame once and derives grams from it,
    * instead of paying a second tokenize inside the locator. */
  def positionedGramHashesTokens(toked: DataFrame, tokenCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val w = col(tokenCol)
    val gramArr = when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        xxhash64(concat_ws(" ",
          (0 until n).map(o => element_at(w, i + o)): _*))))
      .otherwise(array().cast("array<bigint>"))
    toked.select(col("doc_id"), posexplode(gramArr))
      .select(col("doc_id"), (col("pos") + 1).as("start"),
        col("col").as("gh"))
  }

  /** Merge per-doc gram-hit positions into maximal spans —
    * `(doc_id, start)` hit rows in, `(doc_id, span_start, span_end,
    * n_grams)` out. Windows of width `n` merge when they OVERLAP
    * (`start <= prev + n - 1`); the span-semantics contract shared by
    * every locator, defined ONCE here. Both stacked windows share one
    * (doc_id) exchange+sort; the output is an UNORDERED span set (a
    * global sort above a locator tree re-executes lineage for range
    * sampling under AQE — sort the small result downstream). */
  def mergeSpans(hits: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    hits
      .withColumn("__ms_new",
        when(lag(col("start"), 1).over(w).isNull ||
          col("start") > lag(col("start"), 1).over(w) + (n - 1), 1)
          .otherwise(0))
      .withColumn("__ms_isl", sum(col("__ms_new")).over(w))
      .groupBy(col("doc_id"), col("__ms_isl"))
      .agg(min(col("start")).cast("int").as("span_start"),
        (max(col("start")) + (n - 1)).cast("int").as("span_end"),
        count(lit(1)).as("n_grams"))
      .drop("__ms_isl")
  }

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

  /** Number of context-window chunks [[chunkWindows]] yields for `text`:
    * `1 + ceil(max(n_tokens - chunkTokens, 0) / stride)`. Computed
    * arithmetically (no array build) so callers can project it beside the
    * exploded chunks without evaluating the window transform twice. */
  def chunkCount(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(0 <= overlap && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val nt = size(split(text, " "))
    // token counts are far below 2^53, so the double floor-div is exact
    (floor((greatest(nt - chunkTokens, lit(0)) + (stride - 1))
      .cast("double") / stride) + 1).cast("int")
  }

  /** Fixed-size context-window chunking with `overlap` tokens carried
    * between consecutive windows — the layout step that turns documents
    * into training-context rows. Tokens are split on the SINGLE space
    * character (casing and punctuation stay in the chunk, unlike
    * [[tokens]]); a document shorter than `chunkTokens` yields exactly
    * ONE chunk (possibly partial), so no text is ever dropped.
    *
    * Tokenization contract (VERDICT r06 next #6, pinned in ChunkingSpec):
    * consecutive spaces produce EMPTY tokens that count toward
    * `chunk_tokens`. This is deliberate — splitting on `" "` and
    * re-joining with `" "` reproduces the original byte run (each empty
    * token restores one extra space), so concatenating a doc's chunks at
    * `overlap = 0` yields exactly the original text. A `\s+` split would
    * make counts "purer" but silently collapses whitespace — the wrong
    * trade for a layout step whose output IS the training text. Returns an array of structs
    * `(chunk_idx, chunk, chunk_tokens)` — explode with `inline`, which is
    * a Generate barrier, so the per-element transform runs once per row
    * however many downstream expressions touch the result.
    *
    * Scale: a pure projection — no shuffle at any corpus size; fan-out is
    * `~n_tokens / stride` rows per document and chunks stream out of the
    * generator without materializing the corpus anywhere. */
  def chunkWindows(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(0 <= overlap && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val toks = split(text, " ")
    transform(sequence(lit(0), chunkCount(text, chunkTokens, overlap) - 1), i =>
      struct(
        i.as("chunk_idx"),
        array_join(slice(toks, i * stride + 1, lit(chunkTokens)), " ").as("chunk"),
        least(lit(chunkTokens), size(toks) - i * stride).cast("int")
          .as("chunk_tokens")))
  }

  /** Reassemble per-part rows into one text per id, parts joined by
    * `sep` in `posCol` order — the inverse layout step (pages →
    * document, shards → corpus row, chunks back → document). Returns
    * `(idCol, textCol)`; `posCol` must be unique within an id for a
    * deterministic order. Exact inverse of [[chunkWindows]] at
    * `overlap = 0` with `sep = " "`: the empty-token contract above
    * means every chunk boundary restores exactly one space, so the
    * round trip is byte-identical (the x54 oracle row proves it
    * corpus-wide against the identity query).
    *
    * Scale: one hash aggregate keyed on the id; the ordered concat
    * builds per-GROUP arrays bounded by a single document's size (the
    * same bound the chunk fan-out came from), never corpus-sized, and
    * `sort_array` on (pos, part) structs needs no window or global
    * sort. */
  def assemble(parts: DataFrame, idCol: String, posCol: String,
      textCol: String, sep: String = " "): DataFrame =
    parts.groupBy(col(idCol))
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col(posCol).as("p"),
            col(textCol).as("t")))),
          s => s.getField("t")),
        sep).as(textCol))
}
