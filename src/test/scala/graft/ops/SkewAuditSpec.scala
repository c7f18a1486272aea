package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SkewAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val rows = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++
    Seq.fill(2)("c") ++ Seq("d")).toDF("k")

  test("top-k keys with share and skew-vs-mean, count ties by key") {
    val got = JoinStrategies.skewAudit(rows, col("k"), k = 3)
      .as[(String, Long, Double, Double)].collect().toSeq
    // total 9, n_keys 4, mean 2.25
    assert(got == Seq(
      ("a", 4L, 0.444444444, 1.777777778),
      ("b", 2L, 0.222222222, 0.888888889), // tie with c -> key order
      ("c", 2L, 0.222222222, 0.888888889)))
  }

  test("k larger than the key space returns every key") {
    assert(JoinStrategies.skewAudit(rows, col("k"), k = 100).count() == 4)
  }
}
