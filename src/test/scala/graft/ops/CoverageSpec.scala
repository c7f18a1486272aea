package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("matched/left_only/right_only partition both key sets") {
    val l = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val r = Seq(3L, 4L, 5L).toDF("vec_id")
    val got = Snapshot.coverage(l, r, "doc_id", "vec_id")
      .as[(String, Long)].collect().toMap
    assert(got == Map("matched" -> 2L, "left_only" -> 2L, "right_only" -> 1L))
  }

  test("fully-matched sides report a single status row") {
    val l = Seq(1L, 2L).toDF("doc_id")
    val got = Snapshot.coverage(l, l.withColumnRenamed("doc_id", "vec_id"),
      "doc_id", "vec_id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("matched", 2L)))
  }
}
