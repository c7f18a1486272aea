package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class RankBlendSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("single-signal blend equals the signal's quantile bucket") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val got = Selection.rankBlend(df, Seq("s" -> 7.0), n = 4)
    val viaBuckets = Selection.quantileBuckets(df, "s", n = 4)
      .select(col("id"), col("bucket"))
      .as[(Long, Int)].collect().toMap
    got.select(col("id"), col("blend_b0"), col("blend"))
      .as[(Long, Int, Double)].collect().foreach { case (id, b, blend) =>
        assert(b == viaBuckets(id), s"bucket mismatch for id $id")
        assert(blend == b.toDouble, s"1-signal blend must equal bucket (id $id)")
      }
  }

  test("weighted two-signal blend is the weighted bucket mean; nulls propagate") {
    val df = Seq(
      (1L, Some(1.0), Some(100.0)),   // low s1, high s2
      (2L, Some(2.0), Some(90.0)),
      (3L, Some(3.0), Some(80.0)),
      (4L, Some(4.0), Some(70.0)),
      (5L, None: Option[Double], Some(60.0)), // null s1 -> null blend
      (6L, Some(6.0), None: Option[Double])   // null s2 -> null blend
    ).toDF("id", "s1", "s2")
    val got = Selection.rankBlend(df, Seq("s1" -> 3.0, "s2" -> 1.0), n = 2)
      .select(col("id"), col("blend_b0"), col("blend_b1"), col("blend"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // every non-null blend equals (3*b0 + 1*b1) / 4
    got.values.foreach {
      case (Some(b0: Int), Some(b1: Int), Some(bl: Double)) =>
        assert(bl == (3.0 * b0 + 1.0 * b1) / 4.0)
      case (b0, b1, bl) =>
        assert(bl.isEmpty && (b0.isEmpty || b1.isEmpty),
          s"null signal must null the blend, got ($b0, $b1, $bl)")
    }
    assert(got(5L)._3.isEmpty && got(6L)._3.isEmpty)
  }

  test("invalid arguments are rejected") {
    val df = Seq((1L, 1.0)).toDF("id", "s")
    intercept[IllegalArgumentException] {
      Selection.rankBlend(df, Nil)
    }
    intercept[IllegalArgumentException] {
      Selection.rankBlend(df, Seq("s" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Selection.rankBlend(df, Seq("s" -> 1.0), n = 1)
    }
  }
}
