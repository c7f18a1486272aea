package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch (gap-based) sessionization: split each key's event stream into
 * sessions wherever the inter-event gap exceeds a threshold, then
 * aggregate per session — the batch twin of
 * `graft.streaming.EventStream.sessionize` (the reference engine has no
 * session primitive either; both are additive pipeline operators).
 *
 * Scale: ONE hash exchange on `key` feeds the boundary window (lag +
 * running sum share the same (key, ts, tiebreak) sort); the session
 * aggregate is partial→final, so its exchange carries one partial row
 * per (key, session) — #sessions, never #events. No corpus-wide window,
 * no single-partition stage.
 */
object Sessions {

  /** Per-session aggregates for `df`: sessions break where the gap
    * between consecutive events of one `key` exceeds `gapSeconds`.
    * `tiebreak` must make (key, ts, tiebreak) a total order so session
    * numbering is deterministic under re-partitioning. Output columns:
    * key, sess_no (0-based per key), session_start, session_end,
    * n_events, total_value (exact DECIMAL accumulation of `value`,
    * cast back to double). Gap comparison is on microseconds — exactly
    * the `ts - lag(ts) > INTERVAL` form at timestamp precision. */
  def sessionize(df: DataFrame, key: String, ts: String, tiebreak: String,
      gapSeconds: Long, value: String): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSession =
      when(unix_micros(col(ts)) - unix_micros(lag(col(ts), 1).over(w)) >
        gapSeconds * 1000000L, 1L).otherwise(0L) // first row: null > x → 0
    df.withColumn("__sess_nb", newSession)
      .withColumn("sess_no", sum(col("__sess_nb")).over(run))
      .groupBy(col(key), col("sess_no"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(value).cast("decimal(18,2)")).cast("double").as("total_value"))
  }

  /** Windowed ingest ANOMALY detection — pipeline monitoring over an
    * event/crawl stream: bucket events into fixed `windowSeconds`
    * windows per group, then flag windows whose count sits more than
    * `minAbsZ` robust z-scores (median/MAD — outlier-proof, unlike
    * mean/σ which the anomalies themselves corrupt) from that group's
    * typical window. Emits `(grp, win, cnt, z_robust)` for flagged
    * windows ordered by (grp, win); `win` = ⌊epoch_µs /
    * (windowSeconds·10⁶)⌋ (exact double floor-div — indexes, not
    * timestamps, so the output is engine-portable). Windows with NO
    * events don't appear and are therefore never flagged — feed a
    * densified axis upstream if silence itself is the anomaly. MAD=0
    * groups yield null z (dropped by the flag filter; the x64
    * contract). NULL ts/group rows are excluded.
    *
    * Scale: the corpus-sized work is ONE partial→final count aggregate
    * keyed on (group, window); the robust stats run on the window-count
    * frame (windows × groups rows, not events) via the adaptive
    * rank-selection percentiles, and broadcast back. */
  def windowAnomalies(events: DataFrame, ts: String, group: String,
      windowSeconds: Long, minAbsZ: Double): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    require(minAbsZ >= 0.0, s"minAbsZ must be >= 0, got $minAbsZ")
    val win = floor(unix_micros(col(ts)).cast("double") /
      (windowSeconds * 1000000.0)).cast("long")
    val counts = events
      .filter(col(ts).isNotNull && col(group).isNotNull)
      .select(col(group).as("grp"), win.as("win"))
      .groupBy(col("grp"), col("win")).agg(count(lit(1)).as("cnt"))
    Percentiles.robustZScore(counts, Seq("grp"), "cnt")
      .filter(abs(col("z_robust")) >= minAbsZ)
      .select(col("grp"), col("win"), col("cnt"), col("z_robust"))
      .orderBy(col("grp"), col("win"))
  }
}
