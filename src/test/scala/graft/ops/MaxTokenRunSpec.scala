package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class MaxTokenRunSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def runs(docs: Seq[(Long, String)]) =
    TextAnalysis.maxTokenRun(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("max_run"))).toMap

  test("fold finds the longest run wherever it sits; case folds; no run = 1") {
    val got = runs(Seq(
      (1L, "a b c d"),                 // all distinct -> 1
      (2L, "loop loop loop loop end"), // head run of 4
      (3L, "x y y y y y z z"),         // middle run of 5
      (4L, "a b c c"),                 // tail run of 2
      (5L, "The THE the"),             // tokenizer lowercases -> 3
      (6L, "a, a! a?")))               // punctuation splits, a-run of 3
    assert(got(1L) == ((4, 1)))
    assert(got(2L) == ((5, 4)))
    assert(got(3L) == ((8, 5)))
    assert(got(4L) == ((4, 2)))
    assert(got(5L) == ((3, 3)))
    assert(got(6L) == ((3, 3)))
  }

  test("tokenless docs report (0, 0) and are kept; single token runs 1") {
    val got = runs(Seq(
      (1L, ""), (2L, null.asInstanceOf[String]), (3L, "  \t "), (4L, "solo")))
    assert(got(1L) == ((0, 0)))
    assert(got(2L) == ((0, 0)))
    assert(got(3L) == ((0, 0)))
    assert(got(4L) == ((1, 1)))
  }
}
