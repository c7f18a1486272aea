package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("docs attribute to the FIRST failing stage; the funnel reconciles") {
    val df = Seq(
      (1L, Some(10L)),  // fails min_len (and max would pass)
      (2L, Some(50L)),  // survives
      (3L, Some(999L)), // passes min, fails max
      (4L, None: Option[Long]) // null -> fails FIRST stage that tests it
    ).toDF("id", "len")
    val got = Curation.funnel(df, Seq(
        "min_len" -> (col("len") >= 20),
        "max_len" -> (col("len") <= 100)))
      .as[(Int, String, Long, Long, Long, Option[Double])].collect().toSeq
    // null len fails min_len (NULL predicate drops, like WHERE)
    assert(got == Seq(
      (0, "min_len", 4L, 2L, 2L, Some(0.5)),
      (1, "max_len", 2L, 1L, 1L, Some(0.5))))
  }

  test("zero-drop stages still appear; n_out of the last row is the survivor count") {
    val df = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("id", "len")
    val got = Curation.funnel(df, Seq(
        "all_pass" -> (col("len") >= 0),
        "half" -> (col("len") <= 5)))
      .as[(Int, String, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (0, "all_pass", 10L, 0L, 10L, Some(0.0)),
      (1, "half", 10L, 5L, 5L, Some(0.5))))
  }
}
