package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.TestSessions

class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("a quoted-whole doc pairs at containment 1.0 even when Jaccard is low") {
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val long = short + " one two three four five six seven eight nine ten" +
      " eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val df = Seq(1L -> short, 2L -> long, 3L -> "unrelated words entirely here")
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, minContainment = 0.9, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
    // and the same pair is BELOW the standard Jaccard dedup operating point
    val jac = Dedup.minhashLsh(df.filter(col("doc_id") < 3), minJaccard = 0.7)
    assert(jac.count() == 0L, "pair should be invisible to Jaccard dedup")
  }

  test("pairs sharing only corpus-common grams (df > maxDf) never qualify") {
    // ten docs all share the same leading trigram run; each has a unique
    // tail, so the ONLY overlap is the common boilerplate (df = 10 > 5)
    val rows = (1 to 10).map { i =>
      (i.toLong, s"common head trigram run here tail$i word$i extra$i more$i")
    }
    val got = Dedup.containmentPairs(rows.toDF("doc_id", "text"),
      minContainment = 0.1, maxDf = 5)
    assert(got.count() == 0L)
  }

  test("threshold contract holds (pair set is unordered); invalid params raise") {
    val df = Seq(
      1L -> "p q r s t u v",
      2L -> "p q r s t u v w x y z aa bb cc") // contains doc 1
    .toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(df, minContainment = 0.9, maxDf = 5).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L)
    assertThrows[IllegalArgumentException] {
      Dedup.containmentPairs(df, minContainment = 0.0)
    }
    assertThrows[IllegalArgumentException] {
      Dedup.containmentPairs(df, maxDf = 1)
    }
  }
}
