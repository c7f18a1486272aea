package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def chunksOf(text: String, c: Int, o: Int): Seq[(Int, String, Int)] =
    Seq(text).toDF("text")
      .select(inline(Text.chunkWindows(col("text"), c, o)))
      .as[(Int, String, Int)].collect().toSeq.sortBy(_._1)

  test("short document yields exactly one (partial) chunk") {
    assert(chunksOf("a b c", 64, 16) == Seq((0, "a b c", 3)))
    assert(chunksOf("", 64, 16) == Seq((0, "", 1))) // "" splits to [""]
  }

  test("windows advance by stride and keep `overlap` tokens of context") {
    val text = (1 to 10).map("t" + _).mkString(" ") // 10 tokens
    val got = chunksOf(text, 4, 1)                  // stride 3 -> starts 0,3,6
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4),
      (1, "t4 t5 t6 t7", 4),
      (2, "t7 t8 t9 t10", 4)))
  }

  test("every token is covered; consecutive chunks share exactly `overlap`") {
    val toks = (1 to 57).map("w" + _)
    val got = chunksOf(toks.mkString(" "), 8, 3) // stride 5
    val covered = got.flatMap(_._2.split(" "))
    assert(covered.distinct == toks) // order-preserving full coverage
    got.sliding(2).foreach {
      case Seq((_, a, _), (_, b, _)) =>
        assert(a.split(" ").takeRight(3).sameElements(b.split(" ").take(3)))
      case _ => ()
    }
    // last chunk is the only ragged one
    assert(got.init.forall(_._3 == 8) && got.last._3 == 57 - (got.size - 1) * 5)
  }

  test("chunkCount matches the materialized chunk count") {
    val df = Seq.tabulate(40)(n => Seq.fill(n + 1)("x").mkString(" ")).toDF("text")
    val bad = df.select(
        Text.chunkCount(col("text"), 7, 2).as("n"),
        size(Text.chunkWindows(col("text"), 7, 2)).as("m"))
      .filter(col("n") =!= col("m")).count()
    assert(bad == 0L)
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException](Text.chunkWindows(col("t"), 0, 0))
    intercept[IllegalArgumentException](Text.chunkWindows(col("t"), 8, 8))
    // chunkCount enforces the same contract (ADVICE r06): overlap >=
    // chunkTokens would otherwise build a divide-by-zero expression
    intercept[IllegalArgumentException](Text.chunkCount(col("t"), 0, 0))
    intercept[IllegalArgumentException](Text.chunkCount(col("t"), 8, 8))
  }

  test("whitespace contract: consecutive spaces count as empty tokens and round-trip") {
    // VERDICT r06 next #6 — the single-space split is pinned behavior:
    // "a  b" tokenizes to ["a", "", "b"] (3 tokens), and re-joining the
    // overlap=0 chunks reproduces the original bytes exactly.
    val doc = "alpha  beta gamma   delta"
    val got = chunksOf(doc, 3, 0)
    assert(got.map(_._3).sum == 7) // 4 words + 3 extra-space empties
    assert(got.map(_._2).mkString(" ") == doc) // byte-exact round trip
    val n = Seq(doc).toDF("text")
      .select(Text.chunkCount(col("text"), 3, 0)).as[Int].head()
    assert(n == got.size)
  }

  test("assemble orders parts by position, whatever the input order") {
    val parts = Seq((7L, 2, "gamma"), (7L, 0, "alpha"), (7L, 1, "beta"),
      (8L, 0, "solo")).toDF("doc_id", "pos", "part")
    val got = Text.assemble(parts, "doc_id", "pos", "part", " ")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(7L -> "alpha beta gamma", 8L -> "solo"))
  }

  test("assemble inverts chunkWindows at overlap 0, byte-exactly") {
    val docs = Seq(
      (1L, "alpha  beta gamma   delta epsilon"), // double/triple spaces
      (2L, "one two three four five six seven eight nine"),
      (3L, ""))
      .toDF("doc_id", "text")
    val chunks = docs.select(col("doc_id"),
      inline(Text.chunkWindows(col("text"), 3, 0)))
    val got = Text.assemble(chunks, "doc_id", "chunk_idx", "chunk")
      .as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    assert(got == orig)
  }
}
