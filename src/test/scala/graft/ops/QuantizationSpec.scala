package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("int8 stats match the hand-derived quantization of [1.0, -0.5, 0.0]") {
    val embs = Seq((1L, Seq(1.0f, -0.5f, 0.0f))).toDF("vec_id", "embedding")
    val got = Quantization.int8Stats(embs).collect()
    assert(got.length == 1)
    val r = got(0)
    // scale = 1/127; q = [127, floor(-63.5+0.5) = -63, 0]; qsum = 64;
    // worst err = |-0.5 - (-63/127)| = 0.5/127
    assert(r.getDouble(1) == 0.007874016)
    assert(r.getLong(2) == 64L)
    assert(r.getDouble(3) == 0.003937008)
  }

  test("all-zero vector: scale 0, all-zero codes, zero error") {
    val embs = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantization.int8Stats(embs).collect()(0)
    assert(r.getDouble(1) == 0.0 && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
  }

  test("empty and null-element vectors keep their row with null stats") {
    val embs = Seq(
      (1L, Seq.empty[java.lang.Float]),
      (2L, Seq[java.lang.Float](1.0f, null)),
      (3L, Seq[java.lang.Float](-2.5f, 2.5f, 0.1f))).toDF("vec_id", "embedding")
    val got = Quantization.int8Stats(embs).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // 1 (empty) and 2 (null element) carry null stats — the same NULL
    // propagation DuckDB's list_max/list_sum produce, so the oracle
    // comparison stays exact even if such vectors appear
    assert(got.take(2).forall(r => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
    assert(!got(2).isNullAt(1))
  }

  test("reconstruction error is bounded by scale/2 on random vectors") {
    val rnd = new scala.util.Random(7)
    val embs = (1L to 50L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 4f))).toDF("vec_id", "embedding")
    val bad = Quantization.int8Stats(embs)
      .where(col("max_abs_err") > col("scale") / 2 + 1e-12).count()
    assert(bad == 0)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("whole-stage codegen keeps the kernel in the fused stage") {
    val embs = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val df = Quantization.int8Stats(embs)
    df.collect() // forces codegen compilation — a doGenCode bug fails here
    val plan = df.queryExecution.executedPlan.toString
    // AQE renders fused stages as "*(n)" markers; the Generate carrying
    // quant_stats must sit inside one (inline is codegen-supported)
    assert(plan.contains("*(1) Generate inline(array(quant_stats"),
      s"expected the kernel inside a WSCG span:\n$plan")
  }
}
