package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("diff classifies added, removed, changed, and unchanged rows") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Snapshot.diff(oldSnap, newSnap, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added")))
  }

  test("a custom fingerprint changes what counts as 'changed'") {
    val oldSnap = Seq((1L, "same LENGTH")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "SAME length")).toDF("doc_id", "text")
    // default content hash: changed
    assert(Snapshot.diff(oldSnap, newSnap, "doc_id")
      .as[(Long, String)].head()._2 == "changed")
    // length fingerprint: unchanged
    assert(Snapshot.diff(oldSnap, newSnap, "doc_id",
        fp = df => org.apache.spark.sql.functions.length(df("text")))
      .as[(Long, String)].head()._2 == "unchanged")
  }

  test("a fingerprint going to/from NULL classifies as changed (ADVICE r06)") {
    val oldSnap = Seq((1L, "real text"), (2L, null: String), (3L, null: String))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, null: String), (2L, "now real"), (3L, null: String))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(oldSnap, newSnap, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // null-safe compare: null vs value is 'changed' both ways; null vs
    // null is 'unchanged' (same absent content)
    assert(got == Seq((1L, "changed"), (2L, "changed"), (3L, "unchanged")))
  }
}
