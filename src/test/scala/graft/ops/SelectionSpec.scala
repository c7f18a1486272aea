package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // (id, score, w): selection order is score desc then id asc
  private val rows = Seq(
    (1L, 5.0, 10L), (2L, 9.0, 20L), (3L, 9.0, 30L), (4L, 1.0, 40L),
    (5L, 7.0, 25L)).toDF("id", "score", "w")

  private def take(budget: Long, buckets: Int = 4) =
    Selection.budgetSelect(rows, col("score"), col("id"), col("w"),
        budget, buckets)
      .select(col("id"), col("cum_weight")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq

  test("selection follows (score desc, id) with exact running weights") {
    // order: 2 (20), 3 (50), 5 (75), 1 (85), 4 (125)
    assert(take(75) == Seq((2L, 20L), (3L, 50L), (5L, 75L)))
    assert(take(84) == Seq((2L, 20L), (3L, 50L), (5L, 75L)))
    assert(take(85) == Seq((1L, 85L), (2L, 20L), (3L, 50L), (5L, 75L)))
  }

  test("iqrOutliers flags exactly the rows outside the Tukey fences") {
    // group g: 1..11 -> q1 = 3.5, q3 = 8.5, IQR = 5, fences [-4, 16];
    // planted outliers 100 and -50 are the only rows flagged
    val vals = ((1 to 11).map(_.toDouble) ++ Seq(100.0, -50.0))
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "src", "v")
    val got = Selection.iqrOutliers(df, "src", "v")
      .select("id", "v").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(100.0, -50.0))
  }

  test("iqrOutliers with k=0 flags everything outside [q1, q3] itself") {
    val df = (1 to 8).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "src", "v")
    // q1 = 2.75, q3 = 6.25 -> outside: 1, 2, 7, 8
    val got = Selection.iqrOutliers(df, "src", "v", k = 0.0)
      .select("v").as[Double].collect().sorted.toSeq
    assert(got == Seq(1.0, 2.0, 7.0, 8.0))
  }

  test("a budget below the first weight selects nothing; a huge one selects all") {
    assert(take(19).isEmpty)
    assert(take(1000000).map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("result is invariant to bucket count and repartitioning") {
    val base = take(85, buckets = 1)
    assert(take(85, buckets = 2) == base)
    assert(take(85, buckets = 4) == base)
    val shuffled = Selection.budgetSelect(rows.repartition(7), col("score"),
        col("id"), col("w"), 85, 4)
      .select(col("id"), col("cum_weight")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(shuffled == base)
  }

  test("null scores order last; null weights count zero") {
    val withNulls = Seq(
      (1L, Some(5.0), Some(10L)), (2L, None, Some(1L)),
      (3L, Some(4.0), None)).toDF("id", "score", "w")
    def sel(b: Long) = Selection.budgetSelect(withNulls, col("score"),
        col("id"), col("w"), b, 2)
      .select(col("id"), col("cum_weight")).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    // order: 1 (10), 3 (10: null w = 0), 2 (11: null score last)
    assert(sel(10) == Seq((1L, 10L), (3L, 10L)))
    assert(sel(11) == Seq((1L, 10L), (2L, 11L), (3L, 10L)))
  }

  test("the corpus never passes through a single-partition window") {
    val df = Selection.budgetSelect(rows, col("score"), col("id"), col("w"),
      85, 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only empty-partition window is over the tiny totals table;
    // the corpus window is hash-partitioned by bucket
    assert(p.contains("Window"), s"plan:\n$p")
    assert("Exchange hashpartitioning\\(__bs_b".r.findAllIn(p).nonEmpty,
      s"bucketed corpus window missing:\n$p")
  }

  test("bad arguments are rejected") {
    intercept[IllegalArgumentException](
      Selection.budgetSelect(rows, col("score"), col("id"), col("w"), 0))
    intercept[IllegalArgumentException](
      Selection.budgetSelect(rows, col("score"), col("id"), col("w"), 10, 0))
  }

  test("quantileBuckets: value cuts at exact percentile_cont boundaries") {
    // 1..8: quartile boundaries 2.75 / 4.5 / 6.25 -> buckets 1,1,2,2,3,3,4,4
    val df = (1L to 8L).map(v => (v, v)).toDF("id", "v")
    val got = Selection.quantileBuckets(df, "v", n = 4)
      .select("id", "bucket").as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("quantileBuckets: ties share a bucket, nulls get a null bucket") {
    val df = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, 5L), (3L, 5L),
      (4L, 5L), (5L, 100L), (6L, null)).toDF("id", "v")
    val got = Selection.quantileBuckets(df, "v", n = 2)
      .select("id", "bucket").as[(Long, Option[Int])]
      .collect().sortBy(_._1).toSeq
    // median of (5,5,5,5,100) is 5 -> all ties land in bucket 1 together
    assert(got == Seq(1L -> Some(1), 2L -> Some(1), 3L -> Some(1),
      4L -> Some(1), 5L -> Some(2), 6L -> None))
  }

  test("quantileBuckets: assignment is a broadcast, never a corpus sort") {
    val df = (1L to 100L).map(v => (v, v * 3 % 97)).toDF("id", "v")
    val out = Selection.quantileBuckets(df, "v", n = 8)
    val plan = out.queryExecution.executedPlan.toString
    // the 1-row boundary frame broadcasts (its own subtree may sort/
    // window — it is n-1 numbers); the CORPUS side must sit directly
    // under the join with no exchange/sort/window — assignment is a
    // pure projection of the scan
    assert("BroadcastNestedLoopJoin[^\\n]*\\n\\s*:- LocalTableScan".r
      .findFirstIn(plan).isDefined, plan)
    // buckets are near-equal for distinct values
    val sizes = out.groupBy("bucket").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (1 to 8).toSet)
    sizes.values.foreach(c => assert(math.abs(c - 12.5) <= 1.5, sizes.toString))
  }

  test("quantileBuckets rejects bad bucket counts") {
    intercept[IllegalArgumentException](
      Selection.quantileBuckets(rows, "score", 1))
    intercept[IllegalArgumentException](
      Selection.quantileBuckets(rows, "score", 2000))
  }

  test("topPerGroup keeps exactly the n best per group with ranks 1..n") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5), ("a", 2L, 9), ("a", 3L, 9), ("a", 4L, 1),
        ("b", 5L, 2)).toDF("g", "id", "s")
    val out = Selection.topPerGroup(df, col("g"),
        Seq(col("s").desc, col("id")), n = 2)
      .select("g", "id", "rk").as[(String, Long, Int)]
      .collect().toSet
    // ties on s=9 break by id: 2 before 3; id=4 (worst) is dropped
    assert(out == Set(("a", 2L, 1), ("a", 3L, 2), ("b", 5L, 1)))
    intercept[IllegalArgumentException](
      Selection.topPerGroup(df, col("g"), Seq(col("s")), 0))
  }
}
