package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SurprisalSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "")).toDF("doc_id", "text")

  test("avg_nll matches the hand-derived unigram LM; empty docs drop") {
    // corpus: a:2 b:2 c:1, total 5
    // doc1: (2*ln(5/2) + 1*ln(5/2)) / 3 = 0.916290732
    // doc2: (ln(5/2) + ln(5)) / 2     = 1.262864322
    val got = TextAnalysis.unigramSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0.916290732),
      (2L, 2L, 1.262864322)))
  }

  test("a uniform doc over the corpus's most common tokens scores lowest") {
    val d = Seq(
      (1L, "a a a a b"), // mostly the dominant token
      (2L, "z q"),       // rare tokens -> high surprisal
      (3L, "a a a a a a a a")).toDF("doc_id", "text")
    val nll = TextAnalysis.unigramSurprisal(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(3L) < nll(1L) && nll(1L) < nll(2L))
  }
}
