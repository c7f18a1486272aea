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

  test("candidate mining shuffles the rare postings once, never a self-join") {
    // r12 optimization round: candidates come from per-gram pair
    // expansion over the df-capped doc sets — the rare postings stream
    // crosses exactly ONE gram-keyed shuffle (the collect aggregate,
    // which reuses the df-filter join's clustering); the old form paid
    // one per self-join side. Structural pin (the ADVICE r11 lesson:
    // one-line Exchange strings don't print payloads, so walk the tree).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val self = p match {
        case e: ShuffleExchangeLike => Seq(e)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case other => other.children
      }
      self ++ kids.flatMap(walk)
    }
    val df = Seq(
      1L -> "p q r s t u v",
      2L -> "p q r s t u v w x y z aa bb cc",
      3L -> "unrelated words entirely here today").toDF("doc_id", "text")
    val exs = walk(Dedup.containmentPairs(df).queryExecution.executedPlan)
    val gramKeyed = exs.filter(
      _.outputPartitioning.toString.contains("gram"))
    val desc = gramKeyed.map(e =>
      (e.outputPartitioning.toString, e.output.map(_.name)))
    // exactly TWO gram-keyed shuffles: the partial-aggregated df count
    // (vocab-sized rows) and the rare-postings collect aggregate; the
    // old self-join form paid one per join side PLUS the df aggregate
    assert(gramKeyed.length == 2,
      s"expected exactly 2 gram-keyed shuffles (df count + rare collect), got $desc")
    // and neither ever carries the per-doc gram ARRAY payload
    assert(!gramKeyed.exists(_.output.exists(_.name == "sh")),
      s"gram-array payload crosses a gram-keyed exchange: $desc")
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
