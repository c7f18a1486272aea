package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // corpus: "a b a b a b" + "c c c c"
  // unigrams: a=3 b=3 c=4, T1=10; bigrams: (a,b)=3 (b,a)=2 (c,c)=3, T2=8
  private val docs = Seq((1L, "a b a b a b"), (2L, "c c c c"))
    .toDF("doc_id", "text")

  private def lift(n2: Long, t2: Long, n1a: Long, n1b: Long, t1: Long) =
    (n2.toDouble / t2) / ((n1a.toDouble / t1) * (n1b.toDouble / t1))

  test("counts, lifts, and the (lift desc, a, b) order are exact") {
    val got = TextAnalysis.collocations(docs, minCount = 1, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 3L, lift(3, 8, 3, 3, 10)),
      ("b", "a", 2L, lift(2, 8, 3, 3, 10)),
      ("c", "c", 3L, lift(3, 8, 4, 4, 10))))
  }

  test("minCount prunes candidates but not the t2 denominator") {
    val got = TextAnalysis.collocations(docs, minCount = 3, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // (b,a) drops out, but surviving lifts still divide by T2 = 8
    assert(got.map(r => (r._1, r._2)) == Seq(("a", "b"), ("c", "c")))
    assert(got.head._4 == lift(3, 8, 3, 3, 10))
  }

  test("AQE reuses the repeated count stages at runtime (bounded corpus passes)") {
    val df = TextAnalysis.collocations(
      graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      minCount = 2, k = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(p).size
    assert(reused >= 2, s"expected >=2 reused stages, got $reused in:\n$p")
  }

  test("punctuation and case fold into the same tokens; 1-token docs are inert") {
    val d = Seq((1L, "New York! new york?"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(d, minCount = 2, k = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)).contains(("new", "york", 2L)))
  }
}
