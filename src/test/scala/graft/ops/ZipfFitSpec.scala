package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class ZipfFitSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("an exact power law fits with slope -1 and intercept ln(A)") {
    // counts 120/r at ranks 1..5 lie EXACTLY on ln(c) = ln(120) - ln(r),
    // so the least-squares fit must return slope -1 / intercept ln(120)
    // up to the @7 ln pin and @9 term rounding (≲ 1e-6)
    val words =
      Seq.fill(120)("aa") ++ Seq.fill(60)("bb") ++ Seq.fill(40)("cc") ++
      Seq.fill(30)("dd") ++ Seq.fill(24)("ee")
    val got = TextAnalysis.zipfFitTokens(
      Seq(words).toDF("w"), k = 5).head()
    assert(got.getAs[Long]("k_used") == 5L)
    assert(math.abs(got.getAs[Double]("zipf_slope") - (-1.0)) < 1e-5,
      s"slope: $got")
    assert(math.abs(got.getAs[Double]("zipf_intercept") - math.log(120.0)) < 1e-5,
      s"intercept: $got")
  }

  test("k caps the fit set; a smaller vocabulary uses every token") {
    val docs = Seq((1L, "x x x y y z")).toDF("doc_id", "text")
    assert(TextAnalysis.zipfFit(docs, k = 2).head().getAs[Long]("k_used") == 2L)
    assert(TextAnalysis.zipfFit(docs, k = 50).head().getAs[Long]("k_used") == 3L)
  }

  test("a 1-token vocabulary has no line to fit: null slope, not NaN") {
    // denominator n·Sxx − Sx² is exactly 0 at one point — the nullif
    // guard (the temperatureMixture r11 lesson) surfaces the degenerate
    // fit as null instead of NaN arithmetic
    val got = TextAnalysis.zipfFit(
      Seq((1L, "same same same")).toDF("doc_id", "text"), k = 5).head()
    assert(got.getAs[Long]("k_used") == 1L)
    assert(got.isNullAt(got.fieldIndex("zipf_slope")))
    assert(got.isNullAt(got.fieldIndex("zipf_intercept")))
  }

  test("rejects k < 2 (a line needs two points)") {
    intercept[IllegalArgumentException](
      TextAnalysis.zipfFit(Seq((1L, "a b")).toDF("doc_id", "text"), k = 1))
  }
}
