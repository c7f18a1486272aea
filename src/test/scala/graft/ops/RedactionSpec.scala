package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class RedactionSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def redact(rows: (Long, String)*) =
    Redaction.redactPii(rows.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("emails and phones are counted and replaced, all occurrences") {
    val got = redact(
      1L -> "mail a.b+c@sub.example.org or x_1%y@d.co today",
      2L -> "call +1-555-0123 or 44-555-9876",
      3L -> "both: u@example.com and +1-555-0000")
    assert(got(1L) == ((2L, 0L, "mail <EMAIL> or <EMAIL> today")))
    assert(got(2L) == ((0L, 2L, "call <PHONE> or <PHONE>")))
    assert(got(3L) == ((1L, 1L, "both: <EMAIL> and <PHONE>")))
  }

  test("clean rows pass through byte-identical with zero counts") {
    val text = "no pii here, just words and 123 numbers"
    assert(redact(1L -> text)(1L) == ((0L, 0L, text)))
  }

  test("redaction is idempotent") {
    val once = redact(1L -> "u@example.com +1-555-0000")(1L)._3
    assert(redact(1L -> once)(1L) == ((0L, 0L, once)))
  }

  test("plan: pure projection, no exchange") {
    val df = Redaction.redactPii(Seq((1L, "t")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
