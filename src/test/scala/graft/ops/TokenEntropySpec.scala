package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSessions

class TokenEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("uniform vocabulary hits ln(k); a single repeated token hits exactly 0.0") {
    val df = Seq(
      ("a", "w1 w2 w3 w4"),        // 4 tokens, each once -> ln 4
      ("b", "dup dup dup dup dup") // one type -> 0
    ).toDF("source", "text")
    val got = TextAnalysis.tokenEntropy(df, "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a")._1 == 4L && got("a")._2 == 4L && got("a")._3 == 1.0)
    assert(math.abs(got("a")._4 - math.log(4.0)) < 1e-6)
    val (n, d, ttr, h) = got("b")
    assert(n == 5L && d == 1L && ttr == 0.2 && h == 0.0)
    assert(java.lang.Double.doubleToLongBits(h) == 0L, "-0.0 must normalize")
  }

  test("NULL groups and NULL texts drop; skew lowers entropy below uniform") {
    val df = Seq(
      ("a", "x x x x x x y z"),   // skewed
      ("u", "p q r s t u v w"),   // uniform, same n
      (null.asInstanceOf[String], "x y"),
      ("a", null.asInstanceOf[String])
    ).toDF("source", "text")
    val got = TextAnalysis.tokenEntropy(df, "source")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got.keySet == Set("a", "u"))
    assert(got("a") < got("u"))
  }

  test("the pre-tokenized overload equals the string form") {
    val df = Seq(("a", "one two two three"), ("b", "alpha beta alpha"))
      .toDF("source", "text")
    val toks = df.select(col("source"), Text.tokens(col("text")).as("w"))
    val viaString = TextAnalysis.tokenEntropy(df, "source").collect().toSeq
    val viaTokens = TextAnalysis.tokenEntropyTokens(toks, "source").collect().toSeq
    assert(viaString == viaTokens)
  }
}
