package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("typo twins pair with the exact edit count; unrelated docs do not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilom"), // 1 substitution
      (3L, "alpha beta gamma delta epsiXXX"), // 3 edits from docs 1 AND 2
      (4L, "totally different words here now")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 1)))
    val wider = Dedup.editDistancePairs(docs, maxEdits = 4)
      .as[(Long, Long, Int)].collect().toSeq
    assert(wider.contains((1L, 3L, 3)) && wider.contains((2L, 3L, 3)))
  }

  test("the length window prunes pairs that cannot be within maxEdits") {
    // shares trigrams via a common prefix but is 20 chars longer
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five plus twenty chars")).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(docs, maxEdits = 2).count() == 0)
  }

  test("null texts never pair") {
    val docs = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(docs, maxEdits = 2).count() == 0)
  }
}
