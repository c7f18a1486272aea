package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.tables.Tables

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark

  /** Stage the fixture events as a streaming-source directory (micro-
    * converted so `ts` is a plain µs timestamp column). */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    Tables.load(spark, TestSessions.sf0001, "events")
      .coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed aggregation with watermark drains and matches batch totals") {
    val q = EventStream.runToMemory(
      EventStream.windowedCounts(EventStream.readEvents(spark, streamDir)),
      "win_counts", OutputMode.Append)
    try {
      // append-mode emits only below-watermark windows; with a bounded
      // input the final windows stay open, so compare against the batch
      // result as an upper bound and require substantial coverage.
      val streamed = spark.sql("SELECT CAST(SUM(n) AS BIGINT) FROM win_counts").head.getLong(0)
      val total = Tables.load(spark, TestSessions.sf0001, "events").count()
      assert(streamed > 0 && streamed <= total)
      val batchWindows = EventStream.windowedCounts(
        Tables.load(spark, TestSessions.sf0001, "events")).count()
      val streamWindows = spark.table("win_counts").count()
      assert(streamWindows <= batchWindows && streamWindows > batchWindows / 2)
    } finally q.stop()
  }

  test("streaming dedup keeps event_id unique") {
    val q = EventStream.runToMemory(
      EventStream.dedupedEvents(EventStream.readEvents(spark, streamDir)), "dedup_ev")
    try {
      val n = spark.sql("SELECT COUNT(*) FROM dedup_ev").head.getLong(0)
      val d = spark.sql("SELECT COUNT(DISTINCT event_id) FROM dedup_ev").head.getLong(0)
      assert(n == d && n > 0)
    } finally q.stop()
  }

  test("sessionization carries per-user state and emits running aggregates") {
    val q = EventStream.runToMemory(
      EventStream.sessionize(spark, EventStream.readEvents(spark, streamDir)), "sessions")
    try {
      val events = Tables.load(spark, TestSessions.sf0001, "events")
      // last emitted running count per user must equal the batch count
      val last = spark.sql(
        """SELECT user_id, MAX(n_events) AS n FROM sessions GROUP BY user_id""")
      last.createOrReplaceTempView("last_sessions")
      events.groupBy("user_id").count().createOrReplaceTempView("batch_counts")
      val mismatches = spark.sql(
        """SELECT COUNT(*) FROM last_sessions l JOIN batch_counts b
          |ON l.user_id = b.user_id WHERE l.n != b.count""".stripMargin).head.getLong(0)
      assert(mismatches == 0)
      assert(spark.table("last_sessions").count() ==
        events.select("user_id").distinct().count())
    } finally q.stop()
  }
}
