package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CovarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // hand-checkable 2-dim vectors: x1 = {1,2,3}, x2 = {2,4,6} (exactly
  // 2·x1), means (2, 4), population var(x1) = 2/3, cov = 4/3, var(x2) = 8/3
  private val vecs = Seq(
    (1L, Array(1f, 2f)),
    (2L, Array(2f, 4f)),
    (3L, Array(3f, 6f))).toDF("vec_id", "embedding")

  private def cov(df: org.apache.spark.sql.DataFrame, dims: Int) =
    Similarity.covariance(df, dims)
      .as[(Int, Int, Double)].collect().toSeq

  test("known 2x2 covariance, upper triangle, (i,j)-ordered") {
    val got = cov(vecs, 2)
    assert(got.map(t => (t._1, t._2)) == Seq((1, 1), (1, 2), (2, 2)))
    val byPair = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(byPair((1, 1)) - 2.0 / 3) < 1e-9)
    assert(math.abs(byPair((1, 2)) - 4.0 / 3) < 1e-9)
    assert(math.abs(byPair((2, 2)) - 8.0 / 3) < 1e-9)
  }

  test("diagonal matches dimensionStats variance") {
    val emb = Seq(
      (1L, Array(0.25f, -1.5f, 3f)),
      (2L, Array(1.75f, 0.5f, -2f)),
      (3L, Array(-0.5f, 2.25f, 0f)),
      (4L, Array(0.125f, -0.75f, 1f))).toDF("vec_id", "embedding")
    val diag = cov(emb, 3).filter(t => t._1 == t._2)
      .map(t => t._1 -> t._3).toMap
    val vars = Similarity.dimensionStats(emb)
      .select(col("dim"), col("variance"))
      .as[(Int, Double)].collect().toMap
    assert(diag.keySet == Set(1, 2, 3))
    diag.foreach { case (d, v) => assert(v == vars(d)) }
  }

  test("null and short embeddings are excluded, not mixed in") {
    val ragged = vecs.union(Seq(
      (10L, Array(9f)),           // shorter than dims
      (11L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    assert(cov(ragged, 2) == cov(vecs, 2))
    intercept[IllegalArgumentException](Similarity.covariance(vecs, 0))
  }

  test("one corpus scan, no join: means re-attach via diagonal windows") {
    // r11 optimization round: the corpus-dominant aggregate is the slim
    // fitMoments (no per-pair ride-along mean/square sums); the means
    // re-attach from the diagonal rows by windows over the d²/2-row
    // aggregate OUTPUT. Still one aggregate subtree — pin (a) exactly
    // one parquet scan and (b) no join of any kind (the r07 ruling: a
    // second corpus branch for the means broke AQE stage reuse).
    for (df <- Seq(
        Similarity.covariance(
          graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
          dims = 8),
        Similarity.correlation(
          graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
          dims = 8))) {
      df.collect()
      // AdaptiveSparkPlan.toString appends "== Initial Plan ==" — count
      // only the final executed section
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val scans = "FileScan parquet".r.findAllIn(p).size
      assert(scans == 1, s"expected exactly 1 scan, got $scans in:\n$p")
      assert(!p.contains("Join"), s"expected no join in:\n$p")
    }
  }

  test("correlation: exact-linear pair reads 1.0, diagonal reads 1.0") {
    val got = Similarity.correlation(vecs, 2)
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got((1, 1)) == 1.0 && got((2, 2)) == 1.0)
    assert(got((1, 2)) == 1.0) // x2 = 2*x1 exactly
    val anti = Seq(
      (1L, Array(1f, -2f)), (2L, Array(2f, -4f)), (3L, Array(3f, -6f)))
      .toDF("vec_id", "embedding")
    val g2 = Similarity.correlation(anti, 2)
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(g2((1, 2)) == -1.0)
  }

  test("correlation: a zero-variance dimension yields NULL, not NaN") {
    val const = Seq(
      (1L, Array(5f, 1f)), (2L, Array(5f, 2f)), (3L, Array(5f, 3f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.correlation(const, 2).collect()
    val cell = rows.find(r => r.getInt(0) == 1 && r.getInt(1) == 2).get
    assert(cell.isNullAt(2))
    assert(rows.find(r => r.getInt(0) == 1 && r.getInt(1) == 1).get.isNullAt(2))
  }

  test("a dims prefix equals the leading block of the full matrix") {
    val emb = Seq(
      (1L, Array(1f, 2f, 5f)),
      (2L, Array(0f, 1f, -3f)),
      (3L, Array(2f, 0f, 4f))).toDF("vec_id", "embedding")
    val lead = cov(emb, 3).filter(t => t._1 <= 2 && t._2 <= 2)
    assert(cov(emb, 2) == lead)
  }
}
