package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class RelevanceSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "x y x"),
    (2L, "x z"),
    (3L, "z z"), // no query term -> no row
    (4L, "")).toDF("doc_id", "text")

  test("bm25 matches the hand-derived Okapi scores, ordered score desc") {
    // N counts ALL docs (4 — the empty doc participates in N and avgdl)
    val got = Relevance.bm25(docs, terms = Seq("x"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // hand-derived with N=4, avgdl=7/4, df=2 (same IEEE ops as the impl):
    // idf = ln(1 + (4-2+0.5)/2.5) = ln(2), pinned @7 at source
    val idf = BigDecimal(math.log(1.0 + (4L - 2L + 0.5) / (2L + 0.5)))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    def s(tf: Long, dl: Int): Double = {
      val raw = (idf * (tf * (1.2 + 1))) /
        (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / (7.0 / 4)))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toSeq == Seq((1L, s(2, 3)), (2L, s(1, 2))))
    assert(got(0)._2 > got(1)._2) // tf=2 outranks tf=1 here
  }

  test("docs without any query term are omitted; k truncates") {
    val got = Relevance.bm25(docs, Seq("x"), k = 1).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L)
  }

  test("plan: top-k heaps + broadcast stats, single big-side shuffle family") {
    val df = Relevance.bm25(docs, Seq("x", "y"), k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"expected broadcast stats/df:\n$plan")
  }

  test("empty terms / bad k are rejected") {
    intercept[IllegalArgumentException](Relevance.bm25(docs, Seq.empty, 5))
    intercept[IllegalArgumentException](Relevance.bm25(docs, Seq("x"), 0))
  }
}
