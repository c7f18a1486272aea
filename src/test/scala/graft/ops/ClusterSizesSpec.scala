package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class ClusterSizesSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("chained pairs merge into one cluster; histogram counts clusters") {
    // {1,2,3} via a chain (multi-hop propagation) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterSizes(pairs).as[(Int, Long)].collect().toSeq
    assert(got == Seq((2, 1L), (3, 1L)))
  }

  test("null texts never pair (SQL equality semantics)") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "z"))
      .toDF("doc_id", "text")
    assert(Dedup.exactPairs(docs).count() == 0)
  }

  test("exactPairs mines all same-text pairs, a < b") {
    val docs = Seq(
      (1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"), (6L, "z"))
      .toDF("doc_id", "text")
    val pairs = Dedup.exactPairs(docs).as[(Long, Long)].collect().toSeq.sorted
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    val hist = Dedup.clusterSizes(Dedup.exactPairs(docs))
      .as[(Int, Long)].collect().toSeq
    assert(hist == Seq((2, 1L), (3, 1L)))
  }
}
