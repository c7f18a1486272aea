package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, "2024-01-01 10:00:00"),
    (1L, 11L, "2024-01-01 12:00:00"),
    (2L, 20L, "2024-01-01 09:00:00"))
    .map { case (k, id, t) => (k, id, ts(t)) }.toDF("user_id", "lid", "ts")

  private val right = Seq(
    (1L, 100L, "2024-01-01 09:30:00"),
    (1L, 101L, "2024-01-01 12:00:00"), // equal ts to left lid=11
    (2L, 200L, "2024-01-01 09:30:00")) // AFTER user 2's only left row
    .map { case (k, id, t) => (k, id, ts(t)) }.toDF("user_id", "rid", "ts")

  test("matches the latest right row at-or-before the left ts; none -> null") {
    val out = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts")
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // lid 10 -> rid 100 (09:30 <= 10:00); lid 11 -> rid 101 (equal ts
    // matches, and it beats 100); user 2's purchase is in the future
    assert(out == Map(10L -> Some(100L), 11L -> Some(101L), 20L -> None))
  }

  test("tolerance blanks matches farther back than the window") {
    // lid 10's match is 30 min back, lid 11's is 0 back
    val out = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts",
        tolerance = Some(15L * 60 * 1000000)) // 15 min in micros
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> None, 11L -> Some(101L), 20L -> None))
    // a window wide enough keeps everything the base join matched
    val wide = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts",
        tolerance = Some(3600L * 1000000))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(wide == Map(10L -> Some(100L), 11L -> Some(101L), 20L -> None))
  }

  test("tolerance on a numeric ts column uses the column's own unit") {
    val l = Seq((1L, 10L, 100L), (1L, 11L, 200L)).toDF("k", "lid", "t")
    val r = Seq((1L, 5L, 95L), (1L, 6L, 185L)).toDF("k", "rid", "t")
    val out = AsOf.joinAsOf(l, r, key = "k", ts = "t", tolerance = Some(10L))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // lid 10: lag 5 <= 10 keeps; lid 11: nearest is 185, lag 15 > 10 blanks
    assert(out == Map(10L -> Some(5L), 11L -> None))
  }

  test("tolerance on a high-precision decimal ts stays exact at the boundary") {
    // decimal(30,15) values whose lag straddles the tolerance by ONE
    // unit in the 15th decimal place — a double ulp at magnitude 200 is
    // ~2.8e-14, so the old double round-trip collapses the 1e-15 excess
    // and keeps a match that is genuinely out of tolerance (ADVICE r08).
    // (30,15) keeps the subtraction exact too: result precision 31 fits
    // without Spark's precision-loss scale reduction, unlike (38,18).
    val l = Seq((1L, 10L, "100.000000000000001"),
        (1L, 11L, "200.000000000000001"))
      .toDF("k", "lid", "t")
      .withColumn("t", col("t").cast("decimal(30,15)"))
    // lid 10: lag exactly 10 (kept, inclusive); lid 11: right at 190
    // even gives lag 10.000000000000001 (blanked)
    val r = Seq((1L, 5L, "90.000000000000001"),
        (1L, 6L, "190.000000000000000"))
      .toDF("k", "rid", "t")
      .withColumn("t", col("t").cast("decimal(30,15)"))
    val out = AsOf.joinAsOf(l, r, key = "k", ts = "t", tolerance = Some(10L))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(10L -> Some(5L), 11L -> None))
  }

  test("duplicate right (key, ts) resolves to the largest tiebreak") {
    val dup = Seq(
      (1L, 100L, "2024-01-01 09:00:00"),
      (1L, 105L, "2024-01-01 09:00:00"),
      (1L, 103L, "2024-01-01 09:00:00"))
      .map { case (k, id, t) => (k, id, ts(t)) }.toDF("user_id", "rid", "ts")
    val out = AsOf.joinAsOf(left.filter(col("lid") === 10), dup,
        key = "user_id", ts = "ts", rightTiebreak = Some("rid"))
      .select(col("asof.rid")).as[Long].collect().toSeq
    assert(out == Seq(105L))
  }

  test("every left row and column survives the join unchanged") {
    val out = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts")
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("user_id", "lid", "ts", "asof"))
    assert(out.select("user_id", "lid", "ts").except(left).count() == 0)
  }

  test("result is stable under repartitioning") {
    val a = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts")
      .select(col("lid"), col("asof.rid")).orderBy("lid").collect().toSeq
    val b = AsOf.joinAsOf(left.repartition(5), right.repartition(3),
        key = "user_id", ts = "ts")
      .select(col("lid"), col("asof.rid")).orderBy("lid").collect().toSeq
    assert(a == b)
  }

  test("forward: earliest right at-or-after; equal ts visible; none -> null") {
    val out = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts",
        direction = "forward")
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // lid 10 (10:00) -> next right is 101 (12:00); lid 11 (12:00) ->
    // 101 at the same instant; user 2 (09:00) -> 200 (09:30)
    assert(out == Map(10L -> Some(101L), 11L -> Some(101L), 20L -> Some(200L)))
  }

  test("forward tolerance blanks matches farther ahead than the window") {
    val out = AsOf.joinAsOf(left, right, key = "user_id", ts = "ts",
        direction = "forward", tolerance = Some(45L * 60 * 1000000))
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    // lid 10's next right is 2h ahead (out); 11's is 0 ahead; 20's 30 min
    assert(out == Map(10L -> None, 11L -> Some(101L), 20L -> Some(200L)))
  }

  test("nearest: smaller absolute lag wins; exact tie prefers backward") {
    val l = Seq((1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 13:00:00"))).toDF("user_id", "lid", "ts")
    val r = Seq((1L, 100L, ts("2024-01-01 09:00:00")),
      (1L, 101L, ts("2024-01-01 10:30:00")),   // 30 min after lid 1
      (1L, 102L, ts("2024-01-01 12:00:00")),   // 60 min before lid 2
      (1L, 103L, ts("2024-01-01 14:00:00")))   // 60 min after lid 2: TIE
      .toDF("user_id", "rid", "ts")
    val out = AsOf.joinAsOf(l, r, key = "user_id", ts = "ts",
        direction = "nearest")
      .select(col("lid"), col("asof.rid").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(101L), 2L -> Some(102L))) // tie -> backward
  }

  test("nearest tolerance: an out-of-window nearer side falls back to the other") {
    val l = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "lid", "ts")
    val r = Seq((1L, 100L, ts("2024-01-01 09:50:00")),  // 10 min back
      (1L, 101L, ts("2024-01-01 10:05:00")))            // 5 min ahead (nearer)
      .toDF("user_id", "rid", "ts")
    val nearest = AsOf.joinAsOf(l, r, key = "user_id", ts = "ts",
        direction = "nearest")
      .select(col("asof.rid")).as[Option[Long]].head()
    assert(nearest.contains(101L))
    // 2-min window: both out -> null; 7-min window: only the forward fits
    val none = AsOf.joinAsOf(l, r, key = "user_id", ts = "ts",
        direction = "nearest", tolerance = Some(2L * 60 * 1000000))
      .select(col("asof.rid")).as[Option[Long]].head()
    assert(none.isEmpty)
    val fwdOnly = AsOf.joinAsOf(l, r, key = "user_id", ts = "ts",
        direction = "nearest", tolerance = Some(7L * 60 * 1000000))
      .select(col("asof.rid")).as[Option[Long]].head()
    assert(fwdOnly.contains(101L))
  }

  test("forward tiebreak: largest tiebreak wins among equal-ts rights") {
    val l = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "lid", "ts")
    val r = Seq((1L, 100L, 5L, ts("2024-01-01 11:00:00")),
      (1L, 101L, 9L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "rid", "prio", "ts")
    val out = AsOf.joinAsOf(l, r, key = "user_id", ts = "ts",
        rightTiebreak = Some("prio"), direction = "forward")
      .select(col("asof.rid")).as[Option[Long]].head()
    assert(out.contains(101L))
  }

  test("unknown direction is rejected") {
    intercept[IllegalArgumentException](
      AsOf.joinAsOf(left, right, key = "user_id", ts = "ts",
        direction = "sideways"))
  }
}
