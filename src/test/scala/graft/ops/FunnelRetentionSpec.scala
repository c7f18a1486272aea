package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class FunnelRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel is ORDER-sensitive: a purchase before any view never counts") {
    val ev = Seq(
      // user 1, one session: view -> click -> purchase (reaches all 3)
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:01:00"), "click"),
      (1L, 3L, ts("2024-01-01 10:02:00"), "purchase"),
      // user 2: purchase FIRST, then view, then click — reaches stage 2 only
      (2L, 4L, ts("2024-01-01 09:00:00"), "purchase"),
      (2L, 5L, ts("2024-01-01 09:01:00"), "view"),
      (2L, 6L, ts("2024-01-01 09:02:00"), "click"),
      // user 3: click only — reaches nothing (no view)
      (3L, 7L, ts("2024-01-01 08:00:00"), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Sessions.funnel(ev, "user_id", "ts", "event_id",
      gapSeconds = 3600, stages = Seq("view", "click", "purchase")).head()
    assert(r.getLong(0) == 3L, "n_sessions")
    assert(r.getLong(1) == 2L, "n_stage1: users 1 and 2 saw a view")
    assert(r.getLong(2) == 2L, "n_stage2: both clicked after their view")
    assert(r.getLong(3) == 1L, "n_stage3: only user 1 purchased after the click")
  }

  test("the gap cut splits the cascade: stages never chain across sessions") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      // 7h gap -> new session; this click must NOT inherit the view
      (1L, 2L, ts("2024-01-01 17:30:00"), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Sessions.funnel(ev, "user_id", "ts", "event_id",
      gapSeconds = 6 * 3600, stages = Seq("view", "click")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 0L)
  }

  test("ties at equal ts resolve by the tiebreak order") {
    val t = ts("2024-01-01 10:00:00")
    val ev = Seq(
      (1L, 2L, t, "click"), // event_id 2: AFTER the view in (ts, id) order
      (1L, 1L, t, "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Sessions.funnel(ev, "user_id", "ts", "event_id",
      gapSeconds = 3600, stages = Seq("view", "click")).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    // reversed ids: the click sorts BEFORE the view and must not count
    val ev2 = Seq(
      (1L, 1L, t, "click"),
      (1L, 2L, t, "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r2 = Sessions.funnel(ev2, "user_id", "ts", "event_id",
      gapSeconds = 3600, stages = Seq("view", "click")).head()
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 0L)
  }

  test("cohort retention counts distinct users per (cohort day, offset)") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-03 10:00:00"), "click"),  // day 0 and day 2
      (2L, 3L, ts("2024-01-01 23:00:00"), "view"),   // same cohort, day 0 only
      (3L, 4L, ts("2024-01-02 00:30:00"), "view"))   // next cohort
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessions.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L), ("2024-01-02", 0, 1L)))
  }
}
