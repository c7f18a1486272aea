package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class HistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("values bin by floor division; nulls drop; edges are exact") {
    val rows = Seq(Some(-5L), Some(0L), Some(9L), Some(10L), Some(19L),
      Some(25L), None).toDF("v")
    val got = Selection.histogram(rows, col("v"), binWidth = 10.0)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      (-1L, -10.0, 0.0, 1L), // -5 floors into [-10, 0)
      (0L, 0.0, 10.0, 2L),
      (1L, 10.0, 20.0, 2L),
      (2L, 20.0, 30.0, 1L)))
  }

  test("counts total the non-null input size") {
    val rows = (1L to 100L).toDF("v")
    val total = Selection.histogram(rows, col("v"), binWidth = 7.0)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(total == 100L)
  }
}
