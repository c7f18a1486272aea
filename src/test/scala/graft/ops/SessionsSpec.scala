package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sessions(rows: Seq[(Long, Long, String, Double)], gapS: Long) =
    Sessions.sessionize(
      rows.map { case (u, e, t, v) => (u, e, ts(t), v) }
        .toDF("user_id", "event_id", "ts", "value"),
      key = "user_id", ts = "ts", tiebreak = "event_id",
      gapSeconds = gapS, value = "value")
      .orderBy("user_id", "sess_no")

  test("gap strictly greater than the threshold starts a new session") {
    val out = sessions(Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (1L, 2L, "2024-01-01 01:00:00", 2.0),   // gap == 1h: SAME session
      (1L, 3L, "2024-01-01 02:00:00.000001", 4.0), // 1h + 1µs: new session
      (2L, 4L, "2024-01-05 00:00:00", 8.0)), gapS = 3600)
      .select("user_id", "sess_no", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 0L, 2L, 3.0), (1L, 1L, 1L, 4.0), (2L, 0L, 1L, 8.0)))
  }

  test("session bounds are the exact min/max event timestamps") {
    val out = sessions(Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (1L, 2L, "2024-01-01 00:30:00", 1.0)), gapS = 3600)
      .select("session_start", "session_end").as[(Timestamp, Timestamp)]
      .collect().toSeq
    assert(out == Seq((ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"))))
  }

  test("session numbering is stable under repartitioning") {
    val base = (0L until 200L).map(i =>
      (i % 5, i, s"2024-01-0${1 + (i % 9).toInt} 0${(i % 10) / 2}:0${i % 6}:00", 1.0))
    val a = sessions(base, gapS = 1800).collect().toSeq
    val b = Sessions.sessionize(
      base.map { case (u, e, t, v) => (u, e, ts(t), v) }
        .toDF("user_id", "event_id", "ts", "value").repartition(7),
      key = "user_id", ts = "ts", tiebreak = "event_id",
      gapSeconds = 1800, value = "value")
      .orderBy("user_id", "sess_no").collect().toSeq
    assert(a == b)
  }

  private def nativeSessions(rows: Seq[(Long, Long, String, Double)], gapS: Long) =
    Sessions.sessionizeNative(
      rows.map { case (u, e, t, v) => (u, e, ts(t), v) }
        .toDF("user_id", "event_id", "ts", "value"),
      key = "user_id", ts = "ts", gapSeconds = gapS, value = "value")
      .orderBy("user_id", "session_start")

  test("native: exactly-gap-late event stays IN-session (inclusive merge)") {
    // session_window merges on next.start <= prev.end — measured here
    // because the half-open [ts, ts+gap) reading predicts a split; the
    // break rule therefore matches the custom `lag > gap` form exactly
    val out = nativeSessions(Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (1L, 2L, "2024-01-01 01:00:00", 2.0),          // == gap: merges
      (1L, 3L, "2024-01-01 02:00:00.000001", 4.0)),  // gap + 1µs: splits
      gapS = 3600)
      .select("n_events").as[Long].collect().toSeq
    assert(out == Seq(2L, 1L))
  }

  test("native: session_end is last event + gap; counts/values match custom away from boundaries") {
    val rows = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (1L, 2L, "2024-01-01 00:30:00", 2.0),
      (1L, 3L, "2024-01-01 03:00:00", 4.0), // 2.5h gap > 1h: new session
      (2L, 4L, "2024-01-02 00:00:00", 8.0))
    val native = nativeSessions(rows, gapS = 3600)
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(native == Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:30:00"), 2L, 3.0),
      (1L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"), 1L, 4.0),
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00"), 1L, 8.0)))
    val custom = sessions(rows, gapS = 3600)
      .select("user_id", "session_start", "n_events", "total_value")
      .as[(Long, Timestamp, Long, Double)].collect().toSeq
    assert(custom == native.map(r => (r._1, r._2, r._4, r._5)))
  }
}
