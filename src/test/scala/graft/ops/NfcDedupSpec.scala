package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.functions.TextHashExprs

class NfcDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val composed = "caf\u00e9 cr\u00e8me"
  private val decomposed = "cafe\u0301 cre\u0300me"

  test("nfc_normalize maps decomposed to composed; ASCII is identity") {
    val got = Seq(decomposed, composed, "plain ascii", null)
      .toDF("t")
      .select(TextHashExprs.nfcNormalize(spark, col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq(composed, composed, "plain ascii", null))
  }

  test("exactNfc merges canonically-equal variants, keeps NULLs and distinct text apart") {
    val df = Seq(
      1L -> composed,
      2L -> decomposed,        // merges with 1
      3L -> "different text",
      4L -> (null: String),
      5L -> (null: String),    // null never merges with null
      6L -> "",
      7L -> "")                // empty is a real value: merges
      .toDF("doc_id", "text")
    val got = Dedup.exactNfc(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 2L))
  }

  test("the NFC expression stays inside whole-stage codegen") {
    // a non-foldable input (range) so constant folding can't pre-evaluate
    val out = spark.range(3).select(TextHashExprs.nfcNormalize(spark,
      concat(lit(decomposed + " "), col("id").cast("string"))).as("n"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc_normalize"),
      s"expected the projection inside a WSCG stage (the * marker):\n$plan")
    val got = out.as[String].collect().toSeq
    assert(got == (0 until 3).map(i => s"$composed $i"))
  }
}
