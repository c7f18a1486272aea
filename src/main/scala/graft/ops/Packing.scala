package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sequence packing for training pipelines: documents are
 * laid out in a reproducible corpus-wide order (the md5 shuffle key, so
 * the layout is stable under repartitioning/retries/appends like the
 * rest of `graft.ops.Sampling`) and conceptually concatenated into
 * fixed token-budget training sequences. Each document receives the
 * sequence id holding its FIRST token, its token offset inside that
 * sequence, and a `straddles` flag (its tail crosses into the next
 * sequence — the materialization step splits or drops those, a policy
 * choice this operator deliberately leaves to the caller).
 *
 * Scale: the corpus-wide EXCLUSIVE prefix sum is computed distributed,
 * never as one global-order window — the md5 key's first two hex chars
 * cut the order into 256 near-uniform contiguous ranges, each bucket
 * cumsum-s locally under the window's own hash exchange, and a
 * 256-row bucket-totals table lifts local sums to global ones
 * (AQE-broadcast back). The same prefix-sum shape as the range
 * percentile mode; every stage is a pure function of the input.
 *
 * Reference scope note: the reference engine exposes no packing API —
 * this is part of the training-data surface the build charter adds.
 */
object Packing {

  /** Adds `seq_id`, `seq_offset`, `straddles` (and the ordering key as
    * `pack_key`) to `df`. `tokens` null/negative values count as 0.
    * `key` should be unique per row (e.g. doc_id); duplicate keys get
    * identical pack_keys and an arbitrary-but-stable relative order. */
  def packSequences(df: DataFrame, key: Column, tokens: Column,
      budget: Long, seed: Int = 42): DataFrame = {
    require(budget >= 1, s"token budget $budget must be positive")
    val keyed = df
      .withColumn("pack_key", Sampling.shuffleKey(key, seed))
      .withColumn("__pack_t", greatest(coalesce(tokens.cast("long"), lit(0L)), lit(0L)))
      // first two hex chars: 256 contiguous ranges of the global key
      // order, near-uniform because the key is an md5 bucket
      .withColumn("__pack_b", substring(col("pack_key"), 1, 2))
      // TWO consumers below (local cumsum window + bucket totals) —
      // without the barrier the whole upstream lineage runs twice,
      // which x140 turned from cheap (a token count) into a full BPE
      // chunking pass (the x124 two-consumer rule, applied r10)
      .localCheckpoint(eager = false)
    // ROWS frame + the raw key as tiebreak: the default RANGE frame
    // hands every pack_key TIE one pooled cumulative sum — overlapping
    // sequence ranges the moment two keys share an 8-hex bucket, which
    // at corpus scale they will (r05 review). Identical (key, tokens)
    // duplicates remain interchangeable — same output multiset.
    val wLocal = Window.partitionBy(col("__pack_b"))
      .orderBy(col("pack_key"), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keyed.withColumn("__pack_cum",
      sum(col("__pack_t")).over(wLocal) - col("__pack_t")) // exclusive
    val totals = keyed.groupBy(col("__pack_b"))
      .agg(sum(col("__pack_t")).as("__pack_bt"))
    // 256 rows — the single-partition window is over the TOTALS table,
    // never the corpus
    val wOff = Window.orderBy(col("__pack_b"))
    val offsets = totals
      .withColumn("__pack_off", sum(col("__pack_bt")).over(wOff) - col("__pack_bt"))
      .select(col("__pack_b"), col("__pack_off"))
    local.join(offsets, "__pack_b") // AQE broadcasts the tiny side
      .withColumn("__pack_start", col("__pack_cum") + col("__pack_off"))
      .withColumn("seq_id", expr(s"__pack_start div $budget"))
      .withColumn("seq_offset", col("__pack_start") % budget)
      .withColumn("straddles", col("seq_offset") + col("__pack_t") > budget)
      .drop("__pack_b", "__pack_t", "__pack_cum", "__pack_off", "__pack_start")
  }

  /** Length-bucketed batch assembly — the padding-efficiency layout for
    * batched inference/training: rows shard deterministically
    * ([[Sampling.shard]]'s portable md5 tree), each shard orders by
    * descending `tokens` (ties by `key`) so consecutive rows have
    * similar lengths, and consecutive runs of `batchSize` form batches.
    * Returns per-batch stats `(shard, batch, n_docs, max_tokens,
    * sum_tokens, padding)` ordered by (shard, batch), where `padding`
    * = n_docs·max_tokens − sum_tokens is the exact token waste a
    * pad-to-longest collator pays — the number this layout minimizes
    * versus random batching. Null/negative `tokens` count as 0.
    *
    * Scale: NO global sort — the length ordering is per-shard (the
    * window's hash exchange on the shard id), so sort scope is
    * corpus/nShards and batches never cross shards; the stats
    * aggregate shuffles one partial row per (partition, shard, batch).
    * Pick nShards ≈ the write parallelism you want downstream. */
  def lengthBatches(df: DataFrame, key: Column, tokens: Column,
      batchSize: Int, nShards: Int = 64, seed: Int = 42): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val sharded = Sampling.shard(df, key, nShards, seed)
      .withColumn("__lb_t",
        greatest(coalesce(tokens.cast("long"), lit(0L)), lit(0L)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__lb_t").desc, key)
    sharded
      .withColumn("__lb_rn", row_number().over(w))
      .withColumn("batch", ((col("__lb_rn") - 1) / batchSize).cast("int"))
      .groupBy(col("shard"), col("batch"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        max(col("__lb_t")).as("max_tokens"),
        sum(col("__lb_t")).as("sum_tokens"))
      .withColumn("padding",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))
      .orderBy(col("shard"), col("batch"))
  }
}
