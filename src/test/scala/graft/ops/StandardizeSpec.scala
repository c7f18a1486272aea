package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class StandardizeSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("standardized values match hand computation per dimension") {
    // dim1: mean 2, var 1 -> (1-2)/sqrt(1+eps), (3-2)/sqrt(1+eps)
    val emb = Seq(
      (1L, Array(1.0f, 3.0f)),
      (2L, Array(3.0f, 5.0f))).toDF("vec_id", "embedding")
    val got = Similarity.standardize(emb)
      .as[(Long, Seq[Double])].collect().toMap
    val e = math.sqrt(1.0 + 1e-9)
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == Seq(r9(-1.0 / e), r9(-1.0 / e)))
    assert(got(2L) == Seq(r9(1.0 / e), r9(1.0 / e)))
  }

  test("the codegen kernel is bit-identical to the HOF round/transform form") {
    import org.apache.spark.sql.functions._
    val emb = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 31 + j * 17) % 97) / 9.7f - 4.9f)))
      .toDF("vec_id", "embedding")
    val stats = Similarity.dimensionStats(emb)
      .select(col("dim"), col("mean"), col("variance")).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val means = array(stats.map(s => lit(s._2)).toIndexedSeq: _*)
    val vars_ = array(stats.map(s => lit(s._3)).toIndexedSeq: _*)
    val hof = emb.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        round(
          (round(x.cast("double"), 9) - element_at(means, i + 1)) /
            sqrt(element_at(vars_, i + 1) + lit(1e-9)),
          9)).as("std_embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    val kernel = Similarity.standardize(emb)
      .as[(Long, Seq[Double])].collect().toMap
    assert(kernel == hof)
  }

  test("standardized corpus has ~zero mean and ~unit variance per dim") {
    val emb = Seq.tabulate(50)(i => (i.toLong, Array((i * 0.1f) - 2.5f, i * 1.0f)))
      .toDF("vec_id", "embedding")
    val std = Similarity.standardize(emb)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("std_embedding").as("embedding"))
    val stats = Similarity.dimensionStats(std.select(
        std("vec_id"), std("embedding").cast("array<float>").as("embedding")))
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    stats.foreach { case (_, _, mean, variance, _, _) =>
      assert(math.abs(mean) < 1e-4, s"mean $mean")
      assert(math.abs(variance - 1.0) < 1e-3, s"variance $variance")
    }
  }
}
