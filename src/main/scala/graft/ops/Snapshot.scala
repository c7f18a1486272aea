package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diffing — classify every document of two corpus
 * versions as added / removed / changed / unchanged by id and content
 * fingerprint. This is the audit step of incremental ingest: before
 * re-running dedup/decontamination on a refreshed crawl, know exactly
 * which rows moved (and re-process only those — `Dedup.dedupAgainst`
 * is the companion for the added slice).
 *
 * Scale: one hash equi-join on the 8-byte id — fingerprints are
 * computed per-row BEFORE the join, so the shuffle carries (id, fp)
 * pairs, never document text. No driver-side state at any corpus size.
 */
object Snapshot {

  /** One row per doc_id present in either snapshot:
    * `(id, status ∈ added|removed|changed|unchanged)`. Both inputs must
    * carry `idCol`; `fp` maps a frame to its per-row content
    * fingerprint column (default `xxhash64(text)` — swap in `md5` when
    * an external system must re-derive the same labels).
    *
    * Contract (ADVICE r06): `idCol` must be UNIQUE within each snapshot
    * — duplicate ids row-multiply through the full-outer join. The
    * fingerprint comparison is null-safe: a doc whose fingerprint is
    * NULL on exactly one side (e.g. text changed to/from NULL under the
    * default xxhash64) classifies as 'changed', not 'unchanged'. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      fp: DataFrame => Column = df => xxhash64(df("text"))): DataFrame = {
    val o = oldDf.select(col(idCol).as("__sd_oid"), fp(oldDf).as("__sd_ofp"))
    val n = newDf.select(col(idCol).as("__sd_nid"), fp(newDf).as("__sd_nfp"))
    o.join(n, col("__sd_oid") === col("__sd_nid"), "full_outer")
      .select(
        coalesce(col("__sd_oid"), col("__sd_nid")).as(idCol),
        when(col("__sd_oid").isNull, lit("added"))
          .when(col("__sd_nid").isNull, lit("removed"))
          .when(!(col("__sd_ofp") <=> col("__sd_nfp")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Cross-modality COVERAGE audit `(status, n)` with status ∈
    * {matched, left_only, right_only} — the referential-integrity check
    * a multimodal pipeline runs before training: every document should
    * have its embedding (and vice versa); `left_only` mass is
    * un-embedded text, `right_only` is orphaned vectors. Keys must be
    * unique per side ([[diff]]'s contract — duplicates row-multiply).
    *
    * Scale: one full-outer shuffle join on the (8-byte) keys — payloads
    * never move — and a 3-row aggregate. */
  def coverage(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String): DataFrame = {
    // presence MARKERS, not the key values, drive the classification: a
    // NULL key never joins, so testing the key column would misread a
    // null-keyed right row as left_only (r07 review finding)
    val l = left.select(col(leftKey).as("__cv_l"), lit(true).as("__cv_lm"))
    val r = right.select(col(rightKey).as("__cv_r"), lit(true).as("__cv_rm"))
    l.join(r, col("__cv_l") === col("__cv_r"), "full_outer")
      .select(
        when(col("__cv_lm").isNotNull && col("__cv_rm").isNotNull,
          lit("matched"))
          .when(col("__cv_rm").isNull, lit("left_only"))
          .otherwise(lit("right_only")).as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
  }
}
