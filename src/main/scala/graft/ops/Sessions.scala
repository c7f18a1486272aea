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

  /** Gap sessionization through Spark's NATIVE `session_window`
    * aggregate — the built-in-first spelling of [[sessionize]] (the
    * preference-ladder rule: when a built-in operator exists, use it
    * before custom window plumbing). Break semantics MATCH
    * [[sessionize]]'s `lag > gap` form: the built-in merges windows on
    * INCLUSIVE overlap (`next.start <= prev.end`), so an exactly-gap-
    * late event stays in-session — spec-measured, since the obvious
    * half-open reading of `[ts, ts+gap)` windows says otherwise. The
    * one visible contract difference: `session_end = last event + gap`
    * (the built-in's window end), NOT the last event time.
    *
    * Scale: plans as a single partial→final SessionWindow aggregate
    * over one hash exchange on the key with a per-partition sort —
    * the same exchange count as the custom form, minus its second
    * window pass. */
  def sessionizeNative(df: DataFrame, key: String, ts: String,
      gapSeconds: Long, value: String): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    df.filter(col(ts).isNotNull)
      .groupBy(col(key), session_window(col(ts), s"$gapSeconds seconds").as("__sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(value).cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col(key), col("__sw.start").as("session_start"),
        col("__sw.end").as("session_end"), col("n_events"), col("total_value"))
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
    // NOT materialized, deliberately (r11 optimization round): the count
    // frame feeds ~5 evaluations inside robustZScore (median/MAD probes
    // + rank passes + joins), but a localCheckpoint barrier MEASURED
    // SLOWER at bench scale (x83 1.4–2.0 s → 2.2–2.9 s A/B): the
    // re-evaluated aggregate is a cheap partial→final count while the
    // barrier pays a materialization job plus stats-free LogicalRDD
    // planning on every branch. At much larger event volumes the
    // trade flips — a caller can pass a persisted count frame through
    // robustZScore directly.
    Percentiles.robustZScore(counts, Seq("grp"), "cnt")
      .filter(abs(col("z_robust")) >= minAbsZ)
      .select(col("grp"), col("win"), col("cnt"), col("z_robust"))
      .orderBy(col("grp"), col("win"))
  }

  /** ORDERED-stage session funnel: how many sessions reach stage k of
    * `stages` IN TIME ORDER — stage k counts only when an instance of
    * it occurs at-or-after the first qualified instance of stage k−1
    * within the same session (a purchase BEFORE any view never counts,
    * unlike a bag-of-types funnel). Emits ONE row:
    * `(n_sessions, n_stage1, …, n_stageK)`, each a session count, each
    * ≤ its predecessor by construction. Sessionization is the
    * [[sessionize]] gap cut; ties at equal `ts` resolve by `tiebreak`
    * (the (key, ts, tiebreak) total order both engines share).
    *
    * Scale: ONE hash exchange on `key` serves every window — the
    * session-boundary window partitions by `key`, and the per-session
    * cascade windows partition by (key, session), which
    * hash-on-`key` already clusters (only a sort is added, no second
    * exchange; the x35 mechanism). The session-flag aggregate is
    * partial→final — one partial row per session — and the final
    * reduce is K integers. */
  def funnel(events: DataFrame, key: String, ts: String, tiebreak: String,
      gapSeconds: Long, stages: Seq[String],
      typeCol: String = "event_type"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    require(stages.nonEmpty, "stages must be non-empty")
    val w = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newSession =
      when(unix_micros(col(ts)) - unix_micros(lag(col(ts), 1).over(w)) >
        gapSeconds * 1000000L, 1L).otherwise(0L)
    val sw = Window.partitionBy(col(key), col("__fn_sess"))
      .orderBy(col(ts), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events.withColumn("__fn_nb", newSession)
      .withColumn("__fn_sess", sum(col("__fn_nb")).over(run))
    stages.zipWithIndex.foreach { case (st, i) =>
      val qual =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(s"__fn_cum${i - 1}").isNotNull
      df = df.withColumn(s"__fn_q$i", qual)
      if (i < stages.length - 1)
        df = df.withColumn(s"__fn_cum$i",
          min(when(col(s"__fn_q$i"), col(ts))).over(sw))
    }
    val sessAggs = stages.indices.map(i =>
      max(when(col(s"__fn_q$i"), 1L).otherwise(0L)).as(s"__fn_s$i"))
    val sess = df.groupBy(col(key), col("__fn_sess"))
      .agg(sessAggs.head, sessAggs.tail: _*)
    val finals = stages.indices.map(i =>
      sum(col(s"__fn_s$i")).cast("long").as(s"n_stage${i + 1}"))
    sess.agg(count(lit(1)).as("n_sessions"), finals: _*)
  }

  /** Cohort retention: users bucketed by the DAY of their first event,
    * counted distinct per (cohort_day, day offset) — "of the users who
    * arrived on day X, how many were active k days later". The classic
    * activity-retention matrix, in exact integers (day truncation and
    * day differences only — no transcendentals, no rounding contract
    * needed). Rows with a NULL key or ts drop.
    *
    * Scale: the first-seen aggregate is partial→final on `key` (one
    * exchange, one row per user); the join back to the event stream is
    * a user-keyed equi-join (AQE picks broadcast when the user table
    * fits); the final aggregate's distinct-count shuffle carries
    * (cohort_day, offset, user) triples — bounded by active
    * user-days, never raw events. */
  def cohortRetention(events: DataFrame, key: String, ts: String): DataFrame = {
    val first = events
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .groupBy(col(key))
      .agg(to_date(min(col(ts))).as("__cr_cohort"))
    events
      .filter(col(key).isNotNull && col(ts).isNotNull)
      .join(first, key)
      .groupBy(col("__cr_cohort").as("cohort_day"),
        datediff(to_date(col(ts)), col("__cr_cohort")).as("day_offset"))
      .agg(countDistinct(col(key)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
