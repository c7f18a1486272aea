package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DuplicatedSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // docs 1 and 2 share the 4-token run "alpha beta gamma delta"; with
  // n = 3 that is trigram starts {1,2} in doc 1 and {2,3} in doc 2
  private val docs = Seq(
    (1L, "alpha beta gamma delta one two three"),
    (2L, "zero alpha beta gamma delta nine ten eleven"),
    (3L, "completely different words everywhere tonight"),
    (4L, "tiny doc")).toDF("doc_id", "text")

  private def spans(df: org.apache.spark.sql.DataFrame, n: Int = 3,
      minDocs: Int = 2): Seq[(Long, Int, Int, Long)] =
    TextAnalysis.duplicatedSpans(df, n, minDocs)
      .orderBy(col("doc_id"), col("span_start"))
      .as[(Long, Int, Int, Long)].collect().toSeq

  test("a shared run merges overlapping gram windows into one span") {
    // doc 1: starts {1,2} merge -> [1, 4]; doc 2: starts {2,3} -> [2, 5]
    assert(spans(docs) == Seq((1L, 1, 4, 2L), (2L, 2, 5, 2L)))
  }

  test("non-overlapping hits stay separate spans") {
    // "p q r" (start 1) and "x y z" (start 5) both duplicated; the gap
    // token breaks overlap, so two spans per doc, not one
    val d = Seq(
      (1L, "p q r gap x y z"),
      (2L, "p q r other stuff x y z")).toDF("doc_id", "text")
    assert(spans(d).filter(_._1 == 1L) == Seq((1L, 1, 3, 1L), (1L, 5, 7, 1L)))
  }

  test("within-doc repetition alone is not duplication") {
    val solo = Seq((1L, "a b c x a b c y a b c")).toDF("doc_id", "text")
    assert(spans(solo).isEmpty) // df counts DISTINCT docs
  }

  test("docs shorter than n emit nothing; minDocs raises the bar") {
    assert(spans(docs).forall(s => s._1 != 4L))
    assert(spans(docs, minDocs = 3).isEmpty)
    intercept[IllegalArgumentException](
      TextAnalysis.duplicatedSpans(docs, n = 1))
    intercept[IllegalArgumentException](
      TextAnalysis.duplicatedSpans(docs, minDocs = 1))
  }

  test("exact duplicate docs flag their full token range") {
    val twins = Seq(
      (1L, "alpha beta gamma delta one two three"),
      (2L, "alpha beta gamma delta one two three")).toDF("doc_id", "text")
    // 7 tokens, n=3 -> starts 1..5 merge into [1, 7] covering everything
    assert(spans(twins) == Seq((1L, 1, 7, 5L), (2L, 1, 7, 5L)))
  }

  test("cutSpans removes exactly the flagged tokens and keeps the rest") {
    val d = Seq(
      (1L, "intro alpha beta gamma outro one"),
      (2L, "alpha beta gamma tail words here")).toDF("doc_id", "text")
    // n=3, minDocs=2: shared run "alpha beta gamma" -> doc1 [2,4], doc2 [1,3]
    val got = TextAnalysis.cutSpans(d, TextAnalysis.duplicatedSpans(d, 3))
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "intro outro one", 3L),
      (2L, "tail words here", 3L)))
  }

  test("cutSpans: no spans leaves token-normalized text; full coverage empties") {
    val d = Seq((1L, "Unique! Words only."), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val noSpans = TextAnalysis.duplicatedSpans(d, 3)
    val got = TextAnalysis.cutSpans(d, noSpans)
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "unique words only", 0L), (2L, "", 0L)))
    val twins = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val cut = TextAnalysis.cutSpans(twins, TextAnalysis.duplicatedSpans(twins, 3))
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    assert(cut == Seq((1L, "", 3L), (2L, "", 3L)))
  }

  test("cutSpansTokens overload equals the string form") {
    val d = Seq(
      (1L, "intro alpha beta gamma outro one"),
      (2L, "alpha beta gamma tail words here")).toDF("doc_id", "text")
    val spansDf = TextAnalysis.duplicatedSpans(d, 3)
    val toked = d.select(col("doc_id"),
      inline(array(struct(Text.tokens(col("text")).as("__cs_w")))))
    val viaTokens = TextAnalysis.cutSpansTokens(toked, spansDf)
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    val viaString = TextAnalysis.cutSpans(d, spansDf)
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    assert(viaTokens == viaString)
  }

  test("grams overload equals the string form") {
    val n = 3
    val toked = docs.select(col("doc_id"),
      inline(array(struct(Text.tokens(col("text")).as("__dsp")))))
    val gramArr = when(size(col("__dsp")) >= n,
      transform(sequence(lit(1), size(col("__dsp")) - (n - 1)), i =>
        xxhash64(concat_ws(" ", element_at(col("__dsp"), i),
          element_at(col("__dsp"), i + 1), element_at(col("__dsp"), i + 2)))))
      .otherwise(array().cast("array<bigint>"))
    val grams = toked.select(col("doc_id"), posexplode(gramArr))
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("col").as("gh"))
    val viaGrams = TextAnalysis.duplicatedSpansGrams(grams, n)
      .orderBy(col("doc_id"), col("span_start"))
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(viaGrams == spans(docs))
  }
}
