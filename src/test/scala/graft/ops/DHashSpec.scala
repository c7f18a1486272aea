package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class DHashSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def docsFrame(ids: Long*) = ids.toSeq.toDF("doc_id")

  test("identical payloads hash identically; distinct textures differ") {
    val media = Multimodal.texturedImageTable(docsFrame(1L, 2L, 3L))
    val h = Multimodal.imageDHash(media)
      .as[(Long, Long)].collect().toMap
    assert(h.size == 3)
    assert(h.values.toSet.size == 3, h.toString) // textures discriminate
    // a byte-identical copy must hash to exactly the same value
    val copies = Multimodal.texturedImageTable(docsFrame(1L))
      .withColumn("doc_id", lit(9L))
    val h9 = Multimodal.imageDHash(copies).as[(Long, Long)].collect().head._2
    assert(h9 == h(1L))
  }

  test("dhashNearDups surfaces exactly the planted twins at hamming 0") {
    val base = Multimodal.texturedImageTable(docsFrame(1L, 2L, 3L, 4L))
    val twins = Multimodal.texturedImageTable(docsFrame(2L, 4L))
      .withColumn("doc_id", col("doc_id") + lit(100L))
    val got = Multimodal.dhashNearDups(base.unionByName(twins), maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((2L, 102L, 0), (4L, 104L, 0)))
  }

  test("non-image rows never reach the hash") {
    val docs = (1L to 9L).toSeq.toDF("doc_id")
      .withColumn("text", concat(lit("t"), col("doc_id")))
    val mixed = Multimodal.mediaTable(docs) // image/audio/video by id % 3
    val hashed = Multimodal.imageDHash(mixed).as[(Long, Long)].collect()
    assert(hashed.map(_._1).forall(_ % 3 == 0))
  }
}
