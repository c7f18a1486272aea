package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DocumentFrequencySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran and ran and ran"), // 'ran' repeats: df counts docs, not tokens
    (3L, "the dog sat"),
    (4L, "")).toDF("doc_id", "text")

  test("df counts documents (per-doc distinct), ordered df desc then token") {
    val got = TextAnalysis.documentFrequency(docs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("the", 3L, 0.75), ("cat", 2L, 0.5), ("sat", 2L, 0.5),
      ("and", 1L, 0.25), ("dog", 1L, 0.25), ("ran", 1L, 0.25)))
  }

  test("k truncates after the total-order sort") {
    val got = TextAnalysis.documentFrequency(docs, k = 2)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("the", "cat"))
  }

  test("plan: top-k heaps (TakeOrderedAndProject), no global Sort") {
    val df = TextAnalysis.documentFrequency(docs, k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
  }

  test("sourceDivergence: KL arithmetic; identical distribution scores zero") {
    import org.apache.spark.sql.functions._
    // s1 and s2 have IDENTICAL token distributions -> both equal the
    // corpus mix of themselves... so add s3 skewed to make them nonzero,
    // then check s1 == s2 (same distribution, same KL) and s3 > s1
    val d = Seq(
      (1L, "a a b", "s1"), (2L, "a a b", "s2"),
      (3L, "c c c c", "s3"), (4L, "ignored", null: String))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceDivergence(d, "source")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set("s1", "s2", "s3")) // null group dropped
    assert(got("s1") == got("s2")) // identical distributions, identical KL
    assert(got("s3")._2 > got("s1")._2)
    assert(got.values.forall(_._2 >= 0.0)) // KL is non-negative
    // corpus == group when only one source exists -> KL exactly 0
    val solo = TextAnalysis.sourceDivergence(
      d.filter(col("source") === "s1"), "source")
      .as[(String, Long, Double)].collect().toSeq
    assert(solo == Seq(("s1", 3L, 0.0)))
  }

  test("sourceOverlap: exact set arithmetic over a complete pair matrix") {
    val d = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "beta delta", "s1"),
      (3L, "beta gamma", "s2"),
      (4L, "zeta", "s3"),
      (5L, "ignored", null: String)) // null group drops, documented
      .toDF("doc_id", "text", "source")
    // vocab: s1 {alpha,beta,gamma,delta}, s2 {beta,gamma}, s3 {zeta}
    val got = TextAnalysis.sourceOverlap(d, "source")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("s1", "s2", 2L, 4L, 0.5),
      ("s1", "s3", 0L, 5L, 0.0),   // zero-overlap pair still present
      ("s2", "s3", 0L, 3L, 0.0)))
  }
}
