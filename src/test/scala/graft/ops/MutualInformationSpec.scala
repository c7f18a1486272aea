package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class MutualInformationSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def mi(df: org.apache.spark.sql.DataFrame): (Long, Double, Double, Double) =
    TextAnalysis.mutualInformation(df, "a", "b")
      .as[(Long, Double, Double, Double)].collect().head

  test("independent columns have exactly zero MI") {
    // every (a, b) cell has the same count -> p_ab = p_a * p_b exactly,
    // ln(1) = 0 pins to 0, so the decimal sum is exactly 0.0
    val rows = for (a <- Seq("x", "y"); b <- Seq("u", "v", "w"); _ <- 1 to 4)
      yield (a, b)
    val got = mi(rows.toDF("a", "b"))
    assert(got._1 == 24L && got._4 == 0.0)
    assert(math.abs(got._2 - math.log(2)) < 1e-6) // H(a) = ln 2
    assert(math.abs(got._3 - math.log(3)) < 1e-6) // H(b) = ln 3
  }

  test("a bijective dependence makes MI equal both entropies") {
    val rows = Seq.fill(3)(("x", "u")) ++ Seq.fill(5)(("y", "v")) ++
      Seq.fill(2)(("z", "w"))
    val got = mi(rows.toDF("a", "b"))
    assert(got._4 == got._2 && got._4 == got._3)
    assert(got._4 > 0.9) // entropy of (0.3, 0.5, 0.2) = 1.0297
  }

  test("rows with a NULL in either column drop") {
    val base = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"))
    val noisy = base ++ Seq((null, "u"), ("x", null), (null, null))
    assert(mi(noisy.toDF("a", "b")) == mi(base.toDF("a", "b")))
  }

  test("the cell aggregate executes once: AQE reuses its stage") {
    val df = TextAnalysis.mutualInformation(
      graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "lang", "source")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = "ReusedQueryStage|ReusedExchange".r.findAllIn(p).size
    assert(reused >= 3, s"expected >=3 reused stages, got $reused in:\n$p")
  }
}
