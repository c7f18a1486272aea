package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DupMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("pairs normalize to source_a <= source_b; diagonal counts in-group dups") {
    // "x": ids 1(a), 2(b), 3(b) -> pairs (a,b)x2 + (b,b)x1
    // "y": ids 4(c), 5(a)      -> pair (a,c)x1
    val docs = Seq(
      (1L, "x", "a"), (2L, "x", "b"), (3L, "x", "b"),
      (4L, "y", "c"), (5L, "y", "a")).toDF("doc_id", "text", "source")
    val got = Dedup.dupPairMatrix(docs, "source")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "b", 1L)))
  }
}
