package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class WinsorizeSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("tails clamp to the group fences, interior values pass through") {
    // group g: 1..100 -> p05 ≈ 5.95, p95 ≈ 95.05 (linear interpolation)
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "grp", "v")
    val got = Selection.winsorize(df, "grp", "v", 0.05, 0.95, "w")
      .select(col("id"), col("w")).as[(Long, Double)].collect().toMap
    assert(got(1L) == 5.95 && got(3L) == 5.95, "low tail must clamp to p05")
    assert(got(100L) == 95.05 && got(97L) == 95.05, "high tail must clamp to p95")
    assert(got(50L) == 50.0 && got(6L) == 6.0, "interior values pass through")
  }

  test("NULL value yields NULL output; NULL group rows drop with the join") {
    val df = Seq(
      (1L, Option("g"), Option(1.0)),
      (2L, Option("g"), Option(2.0)),
      (3L, Option("g"), None),            // null value
      (4L, None: Option[String], Option(9.0)) // null group
    ).toDF("id", "grp", "v")
    val got = Selection.winsorize(df, "grp", "v", 0.0, 1.0, "w")
      .select(col("id"), col("w")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(!got.contains(4L), "null-group row must drop (inner fences join)")
    assert(got(3L).isEmpty, "null value must stay null, not clamp to the low fence")
    assert(got(1L).contains(1.0) && got(2L).contains(2.0))
  }

  test("invalid percentile bounds are rejected") {
    val df = Seq((1L, "g", 1.0)).toDF("id", "grp", "v")
    intercept[IllegalArgumentException] {
      Selection.winsorize(df, "grp", "v", 0.9, 0.1)
    }
  }
}
