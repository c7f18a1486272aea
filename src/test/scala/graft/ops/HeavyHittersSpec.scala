package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int): Seq[(String, Long)] =
    TextAnalysis.heavyHitters(rows.toDF("doc_id", "text"), k)
      .as[(String, Long)].collect().toSeq

  test("exactly the tokens with count strictly above n/k, exact counts") {
    // n = 10: a×5, b×3, c×1, d×1; k=3 → threshold 10/3: a (15>10), b (9<10)... strict
    val got = run(Seq((1L, "a a a b b"), (2L, "a a b c d")), 3)
    assert(got == Seq(("a", 5L))) // 5*3=15 > 10; b: 3*3=9 < 10
  }

  test("threshold is strict: cnt*k == n is excluded") {
    // n = 4: a×2, b×2; k=2 → 2*2 == 4, nobody passes
    assert(run(Seq((1L, "a b a b")), 2).isEmpty)
  }

  test("result is partition-independent (repartitioned inputs agree)") {
    val rows = (1L to 200L).map { i =>
      (i, if (i % 10 == 0) "hot hot hot hot" else s"w${i % 37} cold")
    }
    val df = rows.toDF("doc_id", "text")
    val a = TextAnalysis.heavyHitters(df, 8)
      .as[(String, Long)].collect().toSeq
    val b = TextAnalysis.heavyHitters(df.repartition(13), 8)
      .as[(String, Long)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1).contains("hot"))
  }

  test("matches the brute-force group-by on a skewed corpus") {
    val rows = (1L to 100L).map(i => (i, s"t${i % 5} t${i % 17} filler${i}"))
    val df = rows.toDF("doc_id", "text")
    val k = 12
    val brute = df
      .select(org.apache.spark.sql.functions.explode(
        Text.tokens(org.apache.spark.sql.functions.col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect()
    val n = brute.map(_._2).sum
    val expect = brute.filter { case (_, c) => c * k > n }
      .sortBy { case (t, c) => (-c, t) }.toSeq
    assert(run(rows, k) == expect)
  }

  test("ordering is (cnt desc, token asc)") {
    // n = 10, k = 4: 3·4 = 12 > 10 admits a/m/z; q (1·4) does not
    val got = run(Seq((1L, "z z z a a a m m m q")), 4)
    assert(got == Seq(("a", 3L), ("m", 3L), ("z", 3L)))
  }
}
