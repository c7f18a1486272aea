package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // 40 planted twin pairs: enough that a row-keyed 50/50 split straddles
  // some pair with near-certainty for any fixed seed
  private val docs = (1L to 40L).flatMap(i =>
    Seq((i, s"doc body $i"), (i + 1000L, s"doc body $i")))
    .toDF("doc_id", "text")
  private val splits = Seq("train" -> 0.5, "test" -> 0.5)

  test("group-keyed splits have zero off-diagonal leakage by construction") {
    val pairs = Dedup.exactPairs(docs)
    val got = Sampling
      .splitLeakage(pairs, Sampling.groupSplit(docs, col("text"), splits))
      .as[(String, String, Long)].collect().toSeq
    assert(got.forall { case (a, b, _) => a == b }, s"leaked: $got")
    assert(got.map(_._3).sum == 40L) // every pair lands on the diagonal
  }

  test("row-keyed splits leak on twin corpora; totals still cover all pairs") {
    val pairs = Dedup.exactPairs(docs)
    val got = Sampling
      .splitLeakage(pairs,
        Sampling.deterministicSplit(docs, col("doc_id"), splits))
      .as[(String, String, Long)].collect().toSeq
    assert(got.map(_._3).sum == 40L)
    val offDiagonal = got.collect { case (a, b, n) if a != b => n }.sum
    assert(offDiagonal > 0, s"expected leakage under row keying: $got")
  }
}
