package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // independent restatement of the CharEntropy contract (ln@7, term@9
  // exact-decimal accumulation, final @6, −0.0 normalized)
  private def expected(s: String): (Long, Long, Double) = {
    def r(x: Double, sc: Int) = java.math.BigDecimal.valueOf(x)
      .setScale(sc, java.math.RoundingMode.HALF_UP).doubleValue()
    val cps = s.codePoints().toArray
    val counts = cps.groupBy(identity).map { case (_, v) => v.length.toLong }
    val sm = counts.foldLeft(java.math.BigDecimal.ZERO) { (acc, c) =>
      acc.add(java.math.BigDecimal.valueOf(r(c.toDouble * r(math.log(c.toDouble), 7), 9)))
    }
    val n = cps.length.toLong
    (n, counts.size.toLong,
      r(r(math.log(n.toDouble), 7) - sm.doubleValue() / n.toDouble, 6) + 0.0)
  }

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] =
    TextAnalysis.charEntropy(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("uniform distribution hits ln(k); a single repeated char hits exactly 0.0") {
    val got = run(Seq(1L -> "abcd", 2L -> "aaaaaaa"))
    assert(got(1L) == ((4L, 4L, expected("abcd")._3)))
    // uniform over 4 chars: H = ln 4 (each count 1, ln 1 = 0)
    assert(math.abs(got(1L)._3 - math.log(4.0)) < 1e-6)
    val (n2, d2, h2) = got(2L)
    assert(n2 == 7L && d2 == 1L && h2 == 0.0)
    // −0.0 must be normalized away: the sign bit is part of the hash
    assert(java.lang.Double.doubleToLongBits(h2) == 0L)
  }

  test("matches the independent restatement, including non-ASCII codepoints") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "你好世界 你好", // CJK codepoints count like any other
      3L -> "aabb于ccdd!!  ??",
      4L -> "x")
    val got = run(texts)
    texts.foreach { case (id, s) =>
      assert(got(id) == expected(s), s"doc $id")
    }
  }

  test("low-diversity text scores below natural text; null and empty drop") {
    val got = run(Seq(1L -> "aaaaabaaaabaaab", 2L -> "a sentence of words",
      3L -> "", 4L -> null.asInstanceOf[String]))
    assert(got(1L)._3 < got(2L)._3)
    assert(!got.contains(3L) && !got.contains(4L))
  }

  test("entropy is evaluated exactly once per row (Generate barrier)") {
    val p = TextAnalysis.charEntropy(Seq(1L -> "abc").toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert("char_entropy".r.findAllIn(p).length == 1, s"plan:\n$p")
  }
}
