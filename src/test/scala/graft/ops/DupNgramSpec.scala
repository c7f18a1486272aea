package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DupNgramSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // doc 1 and 2 share the span "alpha beta gamma delta" (2 shared
  // trigrams); doc 3 is fully unique; doc 4 is a short (<3 token) doc
  private val docs = Seq(
    (1L, "alpha beta gamma delta one two three"),
    (2L, "zero alpha beta gamma delta nine"),
    (3L, "completely different words everywhere tonight"),
    (4L, "tiny doc")).toDF("doc_id", "text")

  test("shared spans count as duplicated grams; unique docs score 0") {
    val got = TextAnalysis.duplicatedNgrams(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc1: 5 trigrams, 2 shared ("alpha beta gamma", "beta gamma delta")
    // doc2: 4 trigrams, 2 shared; doc3: 3 trigrams 0 shared; doc4: 1 gram
    assert(got == Seq(
      (1L, 5L, 2L, 0.4),
      (2L, 4L, 2L, 0.5),
      (3L, 3L, 0L, 0.0),
      (4L, 1L, 0L, 0.0)))
  }

  test("a repeated span INSIDE one doc does not count without a second doc") {
    val solo = Seq((1L, "a b c x a b c y a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedNgrams(solo)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.head._3 == 0L) // grams are distinct per doc -> df stays 1
  }

  test("minDocs raises the duplication bar") {
    val got = TextAnalysis.duplicatedNgrams(docs, minDocs = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.forall(_._3 == 0L)) // no gram appears in 3 docs
    intercept[IllegalArgumentException](TextAnalysis.duplicatedNgrams(docs, 1))
  }

  test("exact duplicate docs are flagged whole (dup_frac 1.0)") {
    val twins = docs.union(Seq((10L, "alpha beta gamma delta one two three"))
      .toDF("doc_id", "text"))
    val got = TextAnalysis.duplicatedNgrams(twins)
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(1L, 10L))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.forall(r => r._4 == 1.0))
  }
}
