package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // block "a b" appears in docs 1, 2 and 5 (cross-doc boilerplate);
  // doc 3 has a partial final block; doc 4 repeats a block INSIDE one
  // doc (df stays 1 — must survive); doc 5 is fully boilerplate
  private val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "a b x y"),
    (3L, "z z z"),
    (4L, "q q q q"),
    (5L, "a b")).toDF("doc_id", "text")

  test("cross-doc blocks strip; in-doc repeats and partial blocks survive") {
    val got = TextAnalysis.stripBoilerplate(docs, blockTokens = 2, maxDocs = 1)
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(got == Seq(
      (1L, "c d e f", 3, 2),
      (2L, "x y", 2, 1),
      (3L, "z z z", 2, 2), // partial final block rejoins byte-exactly
      (4L, "q q q q", 2, 2), // same-doc repeat: df = distinct docs = 1
      (5L, "", 1, 0))) // fully boilerplate -> kept with empty text
  }

  test("maxDocs raises the bar: df <= maxDocs blocks survive") {
    val got = TextAnalysis.stripBoilerplate(docs, blockTokens = 2, maxDocs = 3)
      .as[(Long, String, Int, Int)].collect().toSeq
    // "a b" has df = 3 <= 3 -> nothing strips anywhere
    assert(got.map(_._2) == Seq("a b c d e f", "a b x y", "z z z", "q q q q", "a b"))
  }

  test("stripping then reassembly preserves in-document block order") {
    val longDoc = Seq((1L, "k1 k2 m m k3 k4 m m k5"), (2L, "m m")).toDF("doc_id", "text")
    val got = TextAnalysis.stripBoilerplate(longDoc, blockTokens = 2, maxDocs = 1)
      .as[(Long, String, Int, Int)].collect().toSeq
    // doc1 blocks: "k1 k2" | "m m" | "k3 k4" | "m m" | "k5"; both "m m"
    // copies strip (df=2 via doc2), the rest rejoin in order
    assert(got.head == ((1L, "k1 k2 k3 k4 k5", 5, 3)))
  }

  test("pre-computed-blocks overload equals the string form") {
    import org.apache.spark.sql.functions._
    val toks = split(col("text"), " ")
    val nb = ((size(toks) + 1).cast("double") / 2).cast("int")
    val blocks = docs.select(col("doc_id"),
      inline(transform(sequence(lit(0), nb - 1), i => struct(
        i.cast("int").as("idx"),
        array_join(slice(toks, i * 2 + 1, lit(2)), " ").as("blk")))))
    val a = TextAnalysis.stripBoilerplate(docs, blockTokens = 2).collect().toSeq
    val b = TextAnalysis.stripBoilerplateBlocks(blocks).collect().toSeq
    assert(a == b)
  }

  test("parameter guards reject degenerate inputs") {
    intercept[IllegalArgumentException](
      TextAnalysis.stripBoilerplate(docs, blockTokens = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.stripBoilerplate(docs, blockTokens = 8, maxDocs = 0))
  }
}
