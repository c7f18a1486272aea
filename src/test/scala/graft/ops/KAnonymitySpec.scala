package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class KAnonymitySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val rows = Seq(
    ("en", "web"), ("en", "web"), ("en", "web"),   // group of 3
    ("en", "books"),                               // singleton
    ("de", "web"), ("de", "web"),                  // group of 2
    (null, "web"), (null, "web"))                  // null lang groups
    .toDF("lang", "source")

  test("groups below k are reported with exact sizes; k-sized ones pass") {
    val got = Redaction.kAnonymityAudit(rows, Seq("lang", "source"), k = 3)
      .as[(String, String, Long)].collect().toSeq
    // nulls first, then de, en; (en, web) has 3 >= k and is absent
    assert(got == Seq((null, "web", 2L), ("de", "web", 2L),
      ("en", "books", 1L)))
  }

  test("an empty result is the pass condition; parameters validate") {
    // dropping the singleton-source row makes every source >= 2 rows
    val ok = Redaction.kAnonymityAudit(
      rows.filter($"source" =!= "books"), Seq("source"), k = 2)
    assert(ok.collect().isEmpty)
    val one = Redaction.kAnonymityAudit(rows, Seq("source"), k = 2)
      .as[(String, Long)].collect().toSeq
    assert(one == Seq(("books", 1L)))
    intercept[IllegalArgumentException](
      Redaction.kAnonymityAudit(rows, Nil, 3))
    intercept[IllegalArgumentException](
      Redaction.kAnonymityAudit(rows, Seq("lang"), 1))
  }
}
