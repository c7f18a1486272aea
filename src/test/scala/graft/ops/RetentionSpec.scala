package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("cutoff is the interpolated 1-target percentile; kept counts match") {
    val df = (1 to 10).map(v => ("en", v)).toDF("lang", "score")
    val got = Selection.retentionThreshold(df, "lang", "score", 0.3)
      .as[(String, Double, Long, Long, Double)].collect().toSeq
    // percentile_cont(0.7) of 1..10 = 1 + 0.7 * 9 = 7.3 → kept {8, 9, 10}
    assert(got == Seq(("en", 7.3, 10L, 3L, 0.3)))
  }

  test("per-group calibration: each group gets its own cutoff") {
    val df = ((1 to 10).map(v => ("short", v)) ++
      (1 to 10).map(v => ("long", v * 100))).toDF("lang", "score")
    val got = Selection.retentionThreshold(df, "lang", "score", 0.5)
      .as[(String, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got("short") == 5.5)
    assert(got("long") == 550.0)
  }

  test("ties at the cutoff overshoot the target and the report says so") {
    val df = Seq.fill(8)(("en", 42)).toDF("lang", "score")
    val got = Selection.retentionThreshold(df, "lang", "score", 0.25)
      .as[(String, Double, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("en", 42.0, 8L, 8L, 1.0)))
  }

  test("retentionFilter returns exactly the rows clearing the cutoff") {
    val df = (1 to 10).map(v => ("en", v)).toDF("lang", "score")
    val kept = Selection.retentionFilter(df, "lang", "score", 0.3)
      .select("score").as[Int].collect().toSet
    assert(kept == Set(8, 9, 10))
  }

  test("null scores never clear the cutoff") {
    val df = ((1 to 9).map(v => ("en", Some(v))) :+ (("en", None: Option[Int])))
      .toDF("lang", "score")
    val kept = Selection.retentionFilter(df, "lang", "score", 0.3)
      .select("score").as[Option[Int]].collect().toSet
    assert(!kept.contains(None))
  }

  test("targetRetention outside (0, 1) is rejected") {
    val df = Seq(("en", 1)).toDF("lang", "score")
    intercept[IllegalArgumentException] {
      Selection.retentionThreshold(df, "lang", "score", 0.0)
    }
    intercept[IllegalArgumentException] {
      Selection.retentionThreshold(df, "lang", "score", 1.0)
    }
  }
}
