package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class MixturePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private val rows = Seq(
    ("a", 900L), ("a", 100L), ("b", 250L), ("c", 250L), (null, 500L))
    .toDF("src", "w")

  test("alpha=1 shares are proportional to token mass; nulls excluded") {
    val got = Sampling.mixturePlan(rows, col("src"), col("w"), budget = 750.0)
      .as[(String, Long, Double, Double, Double, Int)].collect().toSeq
    // totals: a 1000, b 250, c 250 (null dropped) -> z = 1500
    assert(got == Seq(
      ("a", 1000L, 0.666666667, 500.0, 0.5, 1),
      ("b", 250L, 0.166666667, 125.0, 0.5, 1),
      ("c", 250L, 0.166666667, 125.0, 0.5, 1)))
  }

  test("an all-zero-weight corpus reports null shares, not NaN-coerced zeros") {
    val z = Seq(("a", 0L), ("b", 0L)).toDF("src", "w")
    val got = Sampling.mixturePlan(z, col("src"), col("w"), budget = 100.0)
      .select("share").collect().map(r => r.isNullAt(0))
    assert(got.length == 2 && got.forall(identity))
  }

  test("a rate above 1 reports the epoch count a repeat needs") {
    // alpha=0.5 makes the small domains over-allocated relative to mass:
    // a realizes its target in one pass, b/c need two epochs
    val got = Sampling.mixturePlan(rows, col("src"), col("w"),
        budget = 2000.0, alpha = 0.5)
      .as[(String, Long, Double, Double, Double, Int)].collect()
      .map(r => r._1 -> (r._5, r._6)).toMap
    assert(math.abs(got("a")._1 - 1.0) < 1e-6 && got("a")._2 == 1)
    assert(math.abs(got("b")._1 - 2.0) < 1e-6 && got("b")._2 == 2)
  }

  test("alpha < 1 flattens the mixture toward small domains") {
    val got = Sampling.mixturePlan(rows, col("src"), col("w"),
        budget = 750.0, alpha = 0.5)
      .as[(String, Long, Double, Double, Double, Int)].collect()
      .map(r => r._1 -> r._3).toMap
    // sqrt weighting: a's share drops below 2/3, b/c rise above 1/6
    assert(got("a") < 0.666666667 && got("b") > 0.166666667)
    assert(math.abs(got.values.sum - 1.0) < 1e-8)
  }
}
