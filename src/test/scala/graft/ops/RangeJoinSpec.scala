package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def points(vs: Long*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
  private def intervals(vs: (Long, Long)*) =
    vs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")

  private def run(ps: org.apache.spark.sql.DataFrame,
      is: org.apache.spark.sql.DataFrame, w: Long) =
    JoinStrategies.rangeJoin(ps, is, col("p"), col("s"), col("e"), w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("matches the brute-force predicate join exactly, for several bin widths") {
    val ps = points((0L until 500L).map(i => i * 7 % 400): _*)
    val is = intervals((0L until 60L).map(i => (i * 13 % 350, i * 13 % 350 + i % 40)): _*)
    val brute = ps.crossJoin(is)
      .where(col("s") <= col("p") && col("p") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 5L, 32L, 1000L)) {
      assert(run(ps, is, w) == brute, s"binWidth=$w")
    }
  }

  test("closed-open semantics: start inclusive, end exclusive; empty intervals drop") {
    val ps = points(10L, 20L)
    val is = intervals((10L, 20L), (20L, 20L), (21L, 5L))
    assert(run(ps, is, 8L) == Set((0L, 0L))) // p=10 in [10,20); p=20 not
  }

  test("null endpoints and null points drop") {
    val ps = Seq((0L, Some(10L)), (1L, None)).toDF("pid", "p")
    val is = Seq((0L, Some(5L), Some(15L)), (1L, None, Some(15L)),
      (2L, Some(5L), None)).toDF("iid", "s", "e")
    assert(run(ps, is, 4L) == Set((0L, 0L)))
  }

  test("intervalOverlapJoin matches brute force; pairs emit exactly once") {
    val ls = (0L until 80L).map(i => (i, i * 11 % 300, i * 11 % 300 + 5 + i % 60))
      .toDF("lid", "ls", "le")
    val rs = (0L until 70L).map(i => (i, i * 17 % 280, i * 17 % 280 + 3 + i % 90))
      .toDF("rid", "rs", "re")
    val brute = ls.crossJoin(rs)
      .where(col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").as[(Long, Long)].collect()
    for (w <- Seq(1L, 7L, 64L, 500L)) {
      val got = JoinStrategies.intervalOverlapJoin(ls, rs,
          col("ls"), col("le"), col("rs"), col("re"), w)
        .select("lid", "rid").as[(Long, Long)].collect()
      // exact multiset equality: no lost pairs AND no duplicate emission
      assert(got.sorted.toSeq == brute.sorted.toSeq, s"binWidth=$w")
    }
  }

  test("intervalOverlapJoin: strict overlap — touching intervals do not match") {
    val ls = Seq((0L, 0L, 10L)).toDF("lid", "ls", "le")
    val rs = Seq((0L, 10L, 20L), (1L, 9L, 20L), (2L, 10L, 10L))
      .toDF("rid", "rs", "re")
    val got = JoinStrategies.intervalOverlapJoin(ls, rs,
        col("ls"), col("le"), col("rs"), col("re"), 4L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L))) // [0,10) vs [10,20) touch only; empty drops
  }

  test("plan: a shuffled equi-join on the bin key, never a nested loop") {
    val ps = points((0L until 100L): _*)
    val is = intervals((0L, 50L), (40L, 90L))
    val df = JoinStrategies.rangeJoin(ps, is, col("p"), col("s"), col("e"), 16L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join on bins:\n$plan")
  }
}
