package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DimensionStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("per-dimension mean/variance/min/max match hand computation") {
    val emb = Seq(
      (1L, Array(1.0f, 3.0f)),
      (2L, Array(3.0f, 5.0f))).toDF("vec_id", "embedding")
    val got = Similarity.dimensionStats(emb)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    // dim1: mean 2, E[x^2]-mean^2 = 5-4 = 1; dim2: mean 4, 17-16 = 1
    assert(got == Seq(
      (1, 2L, 2.0, 1.0, 1.0, 3.0),
      (2, 2L, 4.0, 1.0, 3.0, 5.0)))
  }

  test("a zero-variance dimension reports exactly 0.0") {
    val emb = Seq((1L, Array(0.5f)), (2L, Array(0.5f)), (3L, Array(0.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimensionStats(emb)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 0.5, 0.0, 0.5, 0.5)))
  }
}
