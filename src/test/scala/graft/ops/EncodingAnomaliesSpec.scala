package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class EncodingAnomaliesSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def rows(docs: Seq[(Long, String)]) =
    TextAnalysis.encodingAnomalies(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_replacement"),
          r.getAs[Long]("n_control"), r.getAs[Long]("n_mojibake_marks"),
          r.getAs[Double]("anomaly_rate"))).toMap

  test("each counter fires on exactly its class; clean text scores 0") {
    val got = rows(Seq(
      (1L, "clean ascii text"),
      (2L, "bad \uFFFD twice \uFFFD"),
      (3L, "bell \u0007 and \u0001\u007F controls"),
      (4L, "moja \u00C3\u00A9 and \u00C2\u00B7 marks")))
    assert(got(1L) == ((16L, 0L, 0L, 0L, 0.0)))
    // "bad _ twice _" = 13 chars, 2 replacement chars
    assert(got(2L) == ((13L, 2L, 0L, 0L, 0.153846154)))
    // BEL + SOH + DEL = 3 controls
    assert(got(3L)._3 == 3L && got(3L)._2 == 0L)
    // only the C2/C3 lead marks count, not the trailing A9/B7
    assert(got(4L)._4 == 2L && got(4L)._3 == 0L)
  }

  test("tab/newline/CR are whitespace, not control anomalies") {
    val got = rows(Seq((1L, "a\tb\nc\rd")))
    assert(got(1L)._3 == 0L)
  }

  test("NULL text drops; empty text scores rate 0.0 without dividing by zero") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.encodingAnomalies(df).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("doc_id") == 2L)
    assert(got.head.getAs[Long]("n_chars") == 0L)
    assert(got.head.getAs[Double]("anomaly_rate") == 0.0)
  }
}
