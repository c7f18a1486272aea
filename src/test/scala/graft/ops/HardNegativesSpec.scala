package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class HardNegativesSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def vecs(rows: (Long, Array[Float], Integer)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  test("only different-label neighbors rank; same-label ones never appear") {
    val corpus = vecs(
      (10L, Array(1f, 0f), 1),   // same label as query -> excluded
      (11L, Array(0.9f, 0.1f), 2), // near negative
      (12L, Array(0f, 1f), 2))     // far negative
    val queries = vecs((1L, Array(1f, 0f), 1))
    val got = Similarity.hardNegatives(corpus, queries, k = 2)
      .select("qid", "cid", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 11L, 1), (1L, 12L, 2)))
  }

  test("null labels are excluded from both sides") {
    val corpus = vecs((10L, Array(1f, 0f), null), (11L, Array(1f, 0f), 2))
    val queries = vecs((1L, Array(1f, 0f), 1), (2L, Array(1f, 0f), null))
    val got = Similarity.hardNegatives(corpus, queries, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 11L))) // null corpus row and null query both gone
  }

  test("matches brute-force top-k restricted to label mismatches") {
    val corpus = vecs((10L, Array(1f, 1f), 1), (11L, Array(1f, 2f), 2),
      (12L, Array(2f, 1f), 3), (13L, Array(-1f, 0f), 2))
    val queries = vecs((1L, Array(1f, 0f), 2))
    val brute = Similarity.bruteForceTopK(
        corpus.filter(col("label") =!= 2), queries, k = 2)
      .select("qid", "cid", "sim").as[(Long, Long, Double)].collect().toSeq
    val hard = Similarity.hardNegatives(corpus, queries, k = 2)
      .select("qid", "cid", "sim").as[(Long, Long, Double)].collect().toSeq
    assert(hard == brute)
  }

  test("k must be positive") {
    intercept[IllegalArgumentException](
      Similarity.hardNegatives(vecs(), vecs(), 0))
  }
}
