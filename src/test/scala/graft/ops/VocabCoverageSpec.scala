package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class VocabCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("coverage is the exact top-k instance share; types_used caps at vocab size") {
    // counts: a=5, b=3, c=1, d=1 (ties c/d break token-ascending)
    val docs = Seq((1L, "a a a a a b b b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, ks = Seq(1, 2, 3, 10))
      .collect().map(r => r.getAs[Int]("vocab_k") ->
        (r.getAs[Long]("types_used"), r.getAs[Long]("covered"),
          r.getAs[Long]("total"), r.getAs[Double]("coverage"))).toMap
    assert(got(1) == ((1L, 5L, 10L, 0.5)))
    assert(got(2) == ((2L, 8L, 10L, 0.8)))
    assert(got(3) == ((3L, 9L, 10L, 0.9))) // tie at cnt 1 -> 'c' enters first
    assert(got(10) == ((4L, 10L, 10L, 1.0))) // vocab smaller than k
  }

  test("empty corpus yields zero rows' worth of coverage, not a 0/0") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, ks = Seq(5)).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("total") == 0L)
    assert(got.head.getAs[Double]("coverage") == 0.0)
  }

  test("rejects empty or non-positive k lists") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.vocabCoverage(docs, Seq.empty))
    intercept[IllegalArgumentException](TextAnalysis.vocabCoverage(docs, Seq(0)))
  }
}
