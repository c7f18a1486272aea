package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class OovRateSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("rate counts instances outside the top-k vocab; empty docs are absent") {
    // corpus counts: aa x4, bb x3, cc x1, dd x1 -> vocab(2) = {aa, bb}
    val docs = Seq(
      (1L, "aa aa bb cc"),      // 4 tokens, 1 oov (cc)
      (2L, "aa bb bb dd aa"),   // 5 tokens, 1 oov (dd)
      (3L, ""),                 // zero tokens -> absent
      (4L, null: String)        // null text -> absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 0.25), (2L, 5L, 1L, 0.2)))
  }

  test("vocab boundary tie breaks by token ascending (deterministic)") {
    // both 'xx' and 'yy' occur twice; vocab(1 + 'aa') must take 'xx'
    val docs = Seq((1L, "aa aa aa xx yy"), (2L, "xx yy")).toDF("doc_id", "text")
    val by = TextAnalysis.oovRate(docs, vocabSize = 2) // vocab = {aa, xx}
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(by(1L) == ((5L, 1L, 0.2)))  // yy is oov
    assert(by(2L) == ((2L, 1L, 0.5)))  // xx in, yy out
  }

  test("pre-tokenized overload matches the string form") {
    val docs = Seq((1L, "aa bb cc aa"), (2L, "bb cc dd")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("w"))
    val a = TextAnalysis.oovRate(docs, 2).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.oovRateTokens(toks, 2).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
