package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class LengthBatchesSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("batches cut descending-length runs and report exact padding") {
    // one shard so the batching is fully determined by lengths
    val rows = Seq((1L, 10L), (2L, 9L), (3L, 8L), (4L, 3L), (5L, 2L))
      .toDF("id", "len")
    val got = Packing.lengthBatches(rows, col("id"), col("len"),
        batchSize = 3, nShards = 1)
      .as[(Int, Int, Int, Long, Long, Long)].collect().toSeq
    // batch 0: lens 10,9,8 -> max 10, sum 27, padding 3
    // batch 1: lens 3,2    -> max 3, sum 5, padding 1
    assert(got == Seq((0, 0, 3, 10L, 27L, 3L), (0, 1, 2, 3L, 5L, 1L)))
  }

  test("length-sorted batching never pads worse than id-ordered batching") {
    val rows = (1L to 64L).map(i => (i, (i * 37 % 100) + 1)).toDF("id", "len")
    val sorted = Packing.lengthBatches(rows, col("id"), col("len"),
        batchSize = 8, nShards = 1)
      .agg(org.apache.spark.sql.functions.sum("padding")).as[Long].head()
    // baseline: same batches but in id order
    val byId = rows.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).grouped(8)
      .map(g => g.map(_._2).max * g.size - g.map(_._2).sum).sum
    assert(sorted <= byId)
  }

  test("null and negative lengths count as zero tokens") {
    val rows = Seq((1L, Some(5L)), (2L, None), (3L, Some(-4L)))
      .toDF("id", "len")
    val got = Packing.lengthBatches(rows, col("id"), col("len"),
        batchSize = 3, nShards = 1)
      .as[(Int, Int, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0, 0, 3, 5L, 5L, 10L)))
  }
}
