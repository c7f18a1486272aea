package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class TruncationAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("full-dim row is exactly zero; orthogonal-tail vectors show real deltas") {
    // vec pairs built so dims 1..2 agree and the tail flips the sign:
    // truncated cosine at dim 2 is 1.0 while full cosine is 0.0
    val emb = Seq(
      (1L, Array(1f, 0f, 1f, 0f)),
      (2L, Array(1f, 0f, -1f, 0f)),
      (3L, Array(0f, 1f, 0f, 1f)),
      (4L, Array(0f, 1f, 0f, -1f))).toDF("vec_id", "embedding")
    val got = Similarity.truncationAudit(emb, Seq(2, 4))
      .as[(Int, Long, Double, Double)].collect()
      .map { case (d, n, mean, mx) => d -> ((n, mean, mx)) }.toMap
    // pairs: (1,2), (2,3), (3,4) — full cosines 0, 0, 0; dim-2 cosines
    // 1, 0, 1 -> deltas 1, 0, 1
    assert(got(4) == ((3L, 0.0, 0.0)), "full-dim deltas must be exactly zero")
    assert(got(2)._1 == 3L && got(2)._3 == 1.0)
    assert(math.abs(got(2)._2 - 2.0 / 3.0) < 1e-9)
  }
}
