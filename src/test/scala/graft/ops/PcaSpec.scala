package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("jacobiEigen recovers a known 2x2 spectrum") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/sqrt2) and 1
    val (vals, vecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12)
    assert(math.abs(sorted(1) - 1.0) < 1e-12)
    val c = vals.indexWhere(v => math.abs(v - 3.0) < 1e-12)
    val ratio = vecs(0)(c) / vecs(1)(c)
    assert(math.abs(ratio - 1.0) < 1e-12) // (1,1) direction
  }

  // points exactly on the line x2 = 2*x1: ALL variance lies along
  // (1,2)/sqrt5, the second eigenvalue is 0
  private val line = Seq(
    (1L, Array(1f, 2f)), (2L, Array(2f, 4f)), (3L, Array(3f, 6f)),
    (4L, Array(-1f, -2f))).toDF("vec_id", "embedding")

  test("a rank-1 cloud puts all variance on component 1") {
    val m = Similarity.pcaModel(line, dims = 2, k = 2)
    assert(m.eigenvalues(0) > 1e-6 && math.abs(m.eigenvalues(1)) < 1e-9)
    val v = m.components(0)
    assert(math.abs(v(1) / v(0) - 2.0) < 1e-9) // direction (1, 2)
    assert(v(1) > 0) // sign convention: largest-|weight| entry positive
    // second components of the projection are all (numerically) 0
    val proj = Similarity.pcaProject(line, 2, 2)
      .select(element_at(col("components"), 2)).as[Double].collect()
    assert(proj.forall(p => math.abs(p) < 1e-8))
  }

  test("components are orthonormal and eigenvalues descend") {
    val emb = graft.tables.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val m = Similarity.pcaModel(emb, dims = 8, k = 4)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    for (a <- 0 until 4; b <- a until 4) {
      val dot = (0 until 8).map(i => m.components(a)(i) * m.components(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-10)
      else assert(math.abs(dot) < 1e-10)
    }
  }

  test("eigenvalue total equals total variance (trace)") {
    val emb = graft.tables.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val m = Similarity.pcaModel(emb, dims = 8, k = 8)
    val trace = Similarity.covariance(emb, 8)
      .filter(col("i") === col("j"))
      .agg(sum(col("cov"))).as[Double].collect().head
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-6)
  }

  test("identical vectors project identically; model is run-to-run stable") {
    val emb = graft.tables.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val twin = emb.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val proj = Similarity.pcaProject(emb.unionByName(twin), 16, 4)
    val byId = proj.filter(col("vec_id") < 3 || col("vec_id") >= 100000L)
      .as[(Long, Seq[Double])].collect().toMap
    (0L until 3L).foreach { id =>
      assert(byId(id) == byId(id + 100000L))
    }
    val m1 = Similarity.pcaModel(emb, 8, 2)
    val m2 = Similarity.pcaModel(emb.repartition(7), 8, 2)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](Similarity.pcaModel(line, 2, 0))
    intercept[IllegalArgumentException](Similarity.pcaModel(line, 2, 3))
  }
}
