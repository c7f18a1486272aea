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

  test("cross-table fuzzy join matches within maxEdits on short keys") {
    val ref = Seq(
      (1L, "jonathan smith"), (2L, "maria garcia"), (3L, "wei chen"))
      .toDF("id", "name")
    val feed = Seq(
      (10L, "jonathon smith"),  // 1 sub of ref 1
      (11L, "maria garcias"),   // 1 insert of ref 2
      (12L, "w chen"),          // 2 edits from ref 3 -> out at maxEdits=1
      (13L, null: String))      // never pairs
      .toDF("id", "name")
    val got = Dedup.editDistanceJoin(ref, feed, "id", "name", maxEdits = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)))
    val wider = Dedup.editDistanceJoin(ref, feed, "id", "name", maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(wider.contains((3L, 12L, 2)))
  }

  test("fuzzy join blocks sub-3-char keys on the whole-text gram") {
    val ref = Seq((1L, "ab"), (2L, "xy")).toDF("id", "name")
    val feed = Seq((10L, "ab")).toDF("id", "name")
    // "ab" vs "xy" is 2 edits but they share NO gram — the documented
    // short-string miss; the exact copy must still match
    val got = Dedup.editDistanceJoin(ref, feed, "id", "name", maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 0)))
  }
}
