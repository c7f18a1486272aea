package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text, text.length.toLong)

  // every stage has a designated victim:
  //  - 2 duplicates 1 (exact dedup keeps min id 1)
  //  - 3 shares the eval trigram "alpha beta gamma" (decontaminated)
  //  - 4 is too short, 5 too long (length filter)
  //  - 1 and 6 survive to the split stage
  private val docs = Seq(
    doc(1L, "one two three four five six seven eight nine ten"),
    doc(2L, "one two three four five six seven eight nine ten"),
    doc(3L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    doc(4L, "tiny"),
    doc(5L, "x " * 300 + "end"),
    doc(6L, "completely unrelated wording that overlaps nothing at all here"))
    .toDF("doc_id", "text", "n_chars")

  private val eval = Seq(doc(100L, "alpha beta gamma"))
    .toDF("doc_id", "text", "n_chars")

  private def run(min: Long = 10, max: Long = 100) =
    Curation.curate(docs, eval, min, max,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 13)

  test("each stage removes exactly its victim; survivors carry splits") {
    val got = run().select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(got.keySet == Set(1L, 6L))
    // split equals deterministicSplit's own assignment for the same key
    val expected = Sampling.deterministicSplit(
        docs.filter(col("doc_id").isin(1L, 6L)), col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 13)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got == expected)
  }

  test("dedup keeps the smallest id of an identical-text pair") {
    assert(!run().select("doc_id").as[Long].collect().contains(2L))
  }

  test("minHits above the overlap count spares the contaminated doc") {
    // doc 3 shares many trigrams with the eval text; a huge minHits
    // threshold lets it through (then only the length window applies)
    val got = Curation.curate(docs, eval, 10, 100,
        Seq("a" -> 0.5, "b" -> 0.5), minHits = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 6L))
  }

  test("an empty length window is rejected") {
    intercept[IllegalArgumentException](run(min = 100, max = 10))
  }
}
