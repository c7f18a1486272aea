package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class KeywordsSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "cat cat dog"),
    (2L, "dog fish"),
    (3L, "fish fish fish bird")).toDF("doc_id", "text")

  test("log-free tf-idf scores and per-doc ranks match hand computation") {
    val got = TextAnalysis.tfidfKeywords(docs, k = 2)
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    // N = 3; df: cat 1, dog 2, fish 2, bird 1; score = tf*N/df
    assert(got == Seq(
      (1L, "cat", 2L, 1L, 6.0, 1),
      (1L, "dog", 1L, 2L, 1.5, 2),
      (2L, "dog", 1L, 2L, 1.5, 1), // score tie with fish -> token order
      (2L, "fish", 1L, 2L, 1.5, 2),
      (3L, "fish", 3L, 2L, 4.5, 1),
      (3L, "bird", 1L, 1L, 3.0, 2)))
  }

  test("k bounds each doc's keyword count, not the total") {
    val got = TextAnalysis.tfidfKeywords(docs, k = 1)
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, "cat"), (2L, "dog"), (3L, "fish")))
  }

  test("pre-tokenized overload equals the string form") {
    import org.apache.spark.sql.functions._
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("w"))
    val a = TextAnalysis.tfidfKeywords(docs, k = 2).collect().toSeq
    val b = TextAnalysis.tfidfKeywordsTokens(toks, k = 2).collect().toSeq
    assert(a == b)
  }
}
