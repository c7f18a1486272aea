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
}
