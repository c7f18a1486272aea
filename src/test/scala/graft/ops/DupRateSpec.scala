package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DupRateSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("non-canonical members charge their own group; canonical is free") {
    // "x" spans groups a (ids 1,2) and b (id 3): canonical 1 -> a pays
    // one dup (id 2), b pays one (id 3). "y" is unique.
    val docs = Seq(
      (1L, "x", "a"), (2L, "x", "a"), (3L, "x", "b"), (4L, "y", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dupRate(docs, "source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 1L, 0.5), ("b", 2L, 1L, 0.5)))
  }

  test("a fully-unique corpus reports zero rates everywhere") {
    val docs = Seq((1L, "p", "a"), (2L, "q", "a"), (3L, "r", "b"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dupRate(docs, "source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 0L, 0.0), ("b", 1L, 0L, 0.0)))
  }
}
