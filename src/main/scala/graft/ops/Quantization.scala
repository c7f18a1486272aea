package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs

/**
 * Embedding quantization audit for training-data pipelines: symmetric
 * int8 (or any `levels`) per-vector quantization statistics — the scale,
 * the integer code checksum, and the worst reconstruction error. At
 * 100 TB the embedding store is the second-largest artifact after text;
 * 4× shrinking it to int8 is routine, and this operator is the audit
 * that decides whether a corpus can take it (max_abs_err ≤ scale/2 by
 * construction; the distribution of scale tells you which vectors lose
 * precision).
 *
 * Shape: a pure per-row projection — one tight-loop Catalyst expression
 * (`TextHashExprs.QuantStats`, real `doGenCode`, stays inside
 * whole-stage codegen) per vector, no shuffle, streams at any corpus
 * size. The struct result is consumed through the one-eval `inline`
 * barrier (CollapseProject would otherwise re-evaluate the expression
 * once per extracted field — the r02 finding).
 */
object Quantization {

  /** Per-vector quantization stats: (vec_id, scale, q_sum, max_abs_err),
    * ordered by vec_id. `q_sum` is Σ of the integer codes — an exact,
    * order-insensitive checksum of the whole code vector, which is what
    * makes the x29 oracle a hard hash compare rather than a tolerance
    * check. Empty or null-element vectors keep their row with null stats
    * (`inline` of a null struct emits null fields) — the same NULL
    * propagation DuckDB's list_max/list_sum produce, so the oracle stays
    * exact on degenerate inputs too. */
  def int8Stats(embs: DataFrame, idCol: Column = col("vec_id"),
      vecCol: Column = col("embedding"), levels: Int = 127): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    val spark = embs.sparkSession
    embs.select(idCol.as("vec_id"),
        inline(array(TextHashExprs.quantStats(spark, vecCol, levels))))
      .select(col("vec_id"),
        round(col("scale"), 9).as("scale"),
        col("q_sum"),
        round(col("max_abs_err"), 9).as("max_abs_err"))
      .orderBy(col("vec_id"))
  }
}
