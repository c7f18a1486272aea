package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CooccurrenceSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("pairs pool unordered within the window; counts are exact") {
    // "b a" (dist 1) and "a ... b" (dist 2) both pool into (a, b)
    val d = Seq((1L, "b a x a y b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.cooccurrence(d, window = 2, minCount = 1, k = 100)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (a,b) pairs within +-2: doc1 "b a"(1), "a x a"? pairs of a&b only:
    // b-a(d1), a-a(d2), a-y? ... enumerate doc1 positions b1 a2 x3 a4 y5 b6:
    // within 2: (b1,a2),(b1,x3),(a2,x3),(a2,a4),(x3,a4),(x3,y5),(a4,y5),
    // (a4,b6),(y5,b6); doc2: (a,b)
    assert(got(("a", "b")) == 3L) // (b1,a2), (a4,b6), doc2 (a,b)
    assert(got(("a", "a")) == 1L) // (a2,a4) — same-token pair kept
    assert(got(("a", "x")) == 2L)
  }

  test("window=1 count equals the adjacent-bigram count, pooled") {
    val d = Seq((1L, "new york loves new york")).toDF("doc_id", "text")
    val co = TextAnalysis.cooccurrence(d, window = 1, minCount = 1, k = 10)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(co(("new", "york")) == 2L)
    assert(co(("loves", "york")) == 1L)
    assert(co(("loves", "new")) == 1L)
  }

  test("minCount prunes pairs without changing survivors' lift") {
    val d = Seq.tabulate(6)(i => (i.toLong, "p q filler" + i))
      .toDF("doc_id", "text")
    val all = TextAnalysis.cooccurrence(d, 2, minCount = 1, k = 100)
      .as[(String, String, Long, Double)].collect().toSeq
    val pruned = TextAnalysis.cooccurrence(d, 2, minCount = 6, k = 100)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(pruned.map(r => (r._1, r._2)) == Seq(("p", "q")))
    val pq = all.find(r => (r._1, r._2) == ("p", "q")).get
    assert(pruned.head == pq) // identical n2 AND lift (T2 unfiltered)
  }

  test("null token elements pair with nothing") {
    val toks = Seq(Seq("foo", null, "bar")).toDF("w")
    val got = TextAnalysis.cooccurrenceTokens(toks, window = 2, minCount = 1,
        k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // only (bar, foo) at distance 2 survives; the (null, t) pairs drop
    // instead of collapsing to fabricated same-token pairs
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(("bar", "foo", 1L)))
  }

  test("parameter validation and short docs") {
    val solo = Seq((1L, "one")).toDF("doc_id", "text")
    assert(TextAnalysis.cooccurrence(solo, 4, 1, 10).collect().isEmpty)
    intercept[IllegalArgumentException](
      TextAnalysis.cooccurrence(solo, 0, 1, 10))
  }
}
