package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CompressionSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("repetitive text ratios below varied text; empty text is null") {
    val docs = Seq(
      (1L, "spam " * 50),
      (2L, "the quick brown fox jumps over the lazy dog while zebras quarrel"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs)
      .as[(Long, Long, Option[Double])].collect().toSeq
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L).get < byId(2L).get)
    assert(byId(3L).isEmpty)
    assert(got.find(_._1 == 1L).get._2 == 250L)
  }

  test("the ratio is stable across partitionings (per-thread Deflater reset)") {
    val docs = (1L to 50L).map(i => (i, s"doc body $i " * (i % 7 + 1).toInt))
      .toDF("doc_id", "text")
    val a = TextAnalysis.compressionRatio(docs).collect().toSeq
    val b = TextAnalysis.compressionRatio(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("self-repetition always compresses strictly better") {
    val texts = Seq("a", "xy", "one two three", "z " * 40)
    texts.zipWithIndex.foreach { case (t, i) =>
      val one = graft.functions.Zlib.ratio(t.getBytes("UTF-8"))
      val four = graft.functions.Zlib.ratio((t * 4).getBytes("UTF-8"))
      assert(four < one, s"text #$i: $four !< $one")
    }
  }
}
