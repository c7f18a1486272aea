package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class ExactKSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val rows = (1L to 20L).map(i => (i, if (i <= 12) "a" else "b"))
    .toDF("id", "grp")

  test("each stratum yields exactly k rows (or all, if smaller)") {
    val got = Sampling.sampleExactK(rows, col("grp"), col("id"), k = 5)
    val byGrp = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp == Map("a" -> 5L, "b" -> 5L))
    val small = Sampling.sampleExactK(rows, col("grp"), col("id"), k = 10)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(small == Map("a" -> 10L, "b" -> 8L)) // stratum b has only 8
  }

  test("the selection is deterministic across runs and partitionings") {
    val a = Sampling.sampleExactK(rows, col("grp"), col("id"), k = 5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.sampleExactK(rows.repartition(7), col("grp"), col("id"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("a different seed selects a different set") {
    val a = Sampling.sampleExactK(rows, col("grp"), col("id"), k = 5, seed = 1)
      .select("id").as[Long].collect().toSet
    val b = Sampling.sampleExactK(rows, col("grp"), col("id"), k = 5, seed = 2)
      .select("id").as[Long].collect().toSet
    assert(a != b)
  }
}
