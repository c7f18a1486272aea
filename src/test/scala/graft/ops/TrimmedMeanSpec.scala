package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class TrimmedMeanSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("excludes the tails, averages the interior") {
    // 1..100: p05 = 5.95, p95 = 95.05 -> kept 6..95, mean = 50.5
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "grp", "v")
    val got = Selection.trimmedMean(df, "grp", "v", 0.05, 0.95)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 90L, 50.5)))
  }

  test("an extreme outlier moves the plain mean but not the trimmed mean") {
    val base = (1 to 99).map(i => (i.toLong, "g", i.toDouble))
    val df = (base :+ ((100L, "g", 1.0e9))).toDF("id", "grp", "v")
    val Seq((_, n, tm)) = Selection.trimmedMean(df, "grp", "v", 0.05, 0.95)
      .as[(String, Long, Double)].collect().toSeq
    assert(n == 90L && tm < 100.0, s"n=$n tm=$tm")
  }

  test("NULL values and NULL groups are excluded") {
    val df = Seq(
      (1L, Option("g"), Option(1.0)), (2L, Option("g"), Option(2.0)),
      (3L, Option("g"), Option(3.0)), (4L, Option("g"), None),
      (5L, None: Option[String], Option(9.0)))
      .toDF("id", "grp", "v")
    val got = Selection.trimmedMean(df, "grp", "v", 0.0, 1.0)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", 3L, 2.0)))
  }
}
