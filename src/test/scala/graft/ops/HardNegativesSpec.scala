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

  // ---- hardNegativesIvf (VERDICT r06 next #3) ----

  private lazy val emb = graft.tables.Tables
    .load(spark, graft.TestSessions.sf001, "embeddings")

  test("hardNegativesIvf with full probe + full oversample equals brute force") {
    // nprobe = nlist probes every list and oversample covers the whole
    // corpus, so retrieve-then-filter degenerates to EXACTLY the brute
    // label-filtered top-k — the composition plumbing (index probe,
    // label re-join, re-rank) is what's under test.
    val corpus = emb.filter(col("vec_id") >= 5 && col("vec_id") < 105)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.hardNegatives(corpus, queries, k = 5)
      .select("qid", "cid", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val ivf = Similarity.hardNegativesIvf(corpus, queries, k = 5,
        oversample = 20, nlist = 8, nprobe = 8, iters = 2)
      .select("qid", "cid", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(ivf == brute)
  }

  test("hardNegativesIvf recalls most brute hard negatives at nprobe/nlist = 1/2") {
    val corpus = emb.filter(col("vec_id") >= 5)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.hardNegatives(corpus, queries, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.hardNegativesIvf(corpus, queries, k = 5,
        oversample = 4, nlist = 8, nprobe = 4, iters = 2)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(ivf.size == 25) // 5 queries x k=5 — oversample refilled after the filter
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("hardNegativesIvf: planted different-label twin always ranks 1") {
    val queries = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding", "label")
    val planted = queries
      .withColumn("vec_id", col("vec_id") + lit(100000L))
      .withColumn("label", col("label") + lit(100))
    val corpus = emb.select("vec_id", "embedding", "label")
      .filter(col("vec_id") >= 5).unionByName(planted)
    val top1 = Similarity.hardNegativesIvf(corpus, queries, k = 5,
        oversample = 4, nlist = 16, nprobe = 4, iters = 2)
      .filter(col("rank") === 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { q =>
      assert(top1(q) == q + 100000L, s"query $q twin not rank 1")
    }
  }

  test("trainingTriplets: best positive per anchor + ranked negatives") {
    val corpus = vecs(
      (1L, Array(1f, 0f), 1), (2L, Array(1f, 0f), 1), // twin pair, same label
      (3L, Array(0.5f, 0.5f), 2),                     // cos ~0.707 to 1/2
      (4L, Array(0f, 1f), 3))                         // orthogonal
    val got = Similarity.trainingTriplets(corpus, minPositive = 0.95, k = 2)
      .select("anchor", "positive", "negative", "rank")
      .as[(Long, Long, Long, Int)].collect().toSeq
    // only the twin pair clears 0.95 -> anchors 1 and 2; the same-label
    // twin can never double as a negative; negatives rank 3 then 4
    assert(got == Seq((1L, 2L, 3L, 1), (1L, 2L, 4L, 2),
      (2L, 1L, 3L, 1), (2L, 1L, 4L, 2)))
  }

  test("trainingTriplets: a null-label anchor drops entirely (contract)") {
    val corpus = vecs(
      (1L, Array(1f, 0f), null), (2L, Array(1f, 0f), null), // twins, unlabeled
      (3L, Array(1f, 0f), 1), (4L, Array(1f, 0f), 1),       // twins, labeled
      (5L, Array(0f, 1f), 2))
    val got = Similarity.trainingTriplets(corpus, minPositive = 0.95, k = 1)
      .select("anchor").as[Long].collect().toSet
    // "hardest different-label negative" is undefined without a label:
    // anchors 1 and 2 vanish with their positives, labeled twins remain
    assert(got == Set(3L, 4L))
  }

  test("hardNegativesIvf rejects non-positive k and oversample") {
    intercept[IllegalArgumentException](
      Similarity.hardNegativesIvf(vecs(), vecs(), 0))
    intercept[IllegalArgumentException](
      Similarity.hardNegativesIvf(vecs(), vecs(), 1, oversample = 0))
  }
}
