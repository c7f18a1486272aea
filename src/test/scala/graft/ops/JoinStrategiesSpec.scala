package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.tables.Tables

/** Plan-level proof of the 100 TB join levers: bucketed joins drop the
  * Exchange entirely; salted joins spread hot keys without changing the
  * join result. */
class JoinStrategiesSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  test("bucketed join runs without a shuffle exchange") {
    val li = Tables.load(spark, TestSessions.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSessions.sf0001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    JoinStrategies.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    JoinStrategies.writeBucketed(o, "b_orders", "l_orderkey", 8)
    // disable auto-broadcast: at real scale neither fact side broadcasts,
    // and the point is the shuffle-free sort-merge over bucket files
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = JoinStrategies.bucketedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should be exchange-free:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == li.join(o, "l_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("writeBucketedOnce writes once, reuses on re-call, rebuilds on input change") {
    val li = Tables.load(spark, TestSessions.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    JoinStrategies.writeBucketedOnce(li, "b_once", "l_orderkey", 4)
    val loc = new java.io.File(new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, "b_once").toUri.getPath)
    def stamps() = loc.listFiles().map(f => f.getName -> f.lastModified).toMap
    val s1 = stamps()
    assert(s1.keys.exists(_ == "_graft_fingerprint"))
    // identical input: part files untouched — the bench-closure contract
    JoinStrategies.writeBucketedOnce(li, "b_once", "l_orderkey", 4)
    assert(stamps() == s1, "second call rewrote an up-to-date bucketed table")
    // changed plan (projection differs) -> fingerprint miss -> rebuild
    JoinStrategies.writeBucketedOnce(
      li.filter(col("l_quantity") > 10), "b_once", "l_orderkey", 4)
    assert(stamps() != s1, "changed input did not rebuild")
    // dropped table with a stale marker dir -> catalog check forces rebuild
    spark.sql("DROP TABLE b_once")
    JoinStrategies.writeBucketedOnce(li, "b_once", "l_orderkey", 4)
    assert(spark.table("b_once").count() == li.count())
    spark.sql("DROP TABLE IF EXISTS b_once")
  }

  test("salted join equals the plain join result") {
    val li = Tables.load(spark, TestSessions.sf0001, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.load(spark, TestSessions.sf0001, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val salted = JoinStrategies.saltedJoin(li, o, "k", salt = 4)
    val plain = li.join(o, "k")
    assert(salted.count() == plain.count())
    val a = salted.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    val b = plain.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(a == b)
  }

  test("salted join result is stable under repartitioning (retry shape)") {
    // rand(seed) streams are a function of the partition index, so a
    // repartition re-deals every row's salt — the documented stand-in
    // for a task retry. The JOIN result must not move: salt only routes
    // rows, never filters them (VERDICT r05 nit, doc + spec).
    val li = Tables.load(spark, TestSessions.sf0001, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.load(spark, TestSessions.sf0001, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(o, "k")
    val expectedCnt = plain.count()
    val expectedSum =
      plain.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
    for (parts <- Seq(3, 13)) {
      val salted = JoinStrategies.saltedJoin(li.repartition(parts), o, "k", salt = 4)
      assert(salted.count() == expectedCnt, s"count moved at $parts partitions")
      val s = salted.agg(sum(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0)
      assert(s == expectedSum, s"sum moved at $parts partitions")
    }
  }
}
