package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class LinearScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val weights = Array.tabulate(64)(i => (i * 37 % 64) / 64.0 - 0.5)

  /** Independent reimplementation of the scoring contract: JDK md5 of
    * 'k' + token + ':seed', first 8 hex chars as a 32-bit value, mod
    * |weights|; term@9, decimal-sum mean, final @6. */
  private def expectedScore(text: String, bias: Double, seed: Int): (Long, Double) = {
    val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val md = MessageDigest.getInstance("MD5")
    val terms = toks.map { t =>
      val hex = md.digest(s"k$t:$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val b = (java.lang.Long.parseLong(hex, 16) % weights.length).toInt
      BigDecimal(weights(b)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val mean = (terms.sum.toDouble / toks.length) + 0.0
    (toks.length.toLong,
      BigDecimal(bias + mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("linearScore matches an independent md5/weight reimplementation") {
    val rows = Seq(
      1L -> "The quick brown Fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs",
      3L -> "one")
    val got = TextAnalysis.linearScore(rows.toDF("doc_id", "text"),
        weights, bias = 0.25)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    rows.foreach { case (id, text) =>
      val (n, s) = expectedScore(text, 0.25, 7)
      assert(got(id) == ((n, s)), s"doc $id")
    }
  }

  test("zero-token and null-text documents are absent by contract") {
    val df = Seq((1L, "real words here"), (2L, "!!! ??? ..."), (3L, null))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.linearScore(df, weights)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("pre-tokenized overload equals the string form") {
    val df = Seq(1L -> "alpha beta gamma alpha", 2L -> "delta epsilon")
      .toDF("doc_id", "text")
    val viaString = TextAnalysis.linearScore(df, weights, bias = 0.1)
      .collect().toSeq
    val viaToks = TextAnalysis.linearScoreTokens(
        df.select(col("doc_id"), Text.tokens(col("text")).as("w")),
        weights, bias = 0.1)
      .collect().toSeq
    assert(viaString == viaToks)
  }

  test("plan: no join anywhere — model parameters ride as literals") {
    val df = Seq(1L -> "some text to score").toDF("doc_id", "text")
    val out = TextAnalysis.linearScore(df, weights)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"weight lookup must not join:\n$plan")
  }
}
