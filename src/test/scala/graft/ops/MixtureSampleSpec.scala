package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class MixtureSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // 3 domains x 40 rows, weight 10 each => per-domain total 400
  private val df = (0 until 120).map { i =>
    (i.toLong, s"dom${i % 3}", 10L)
  }.toDF("id", "dom", "w")

  test("keep_rate is min(1, share*budget/total) per domain; clamp keeps all") {
    // budget 400: dom0 rate = 0.5*400/400 = 0.5; dom1 = 2.0 -> clamped 1.0
    val got = Sampling.mixtureSample(df, col("dom"), col("w"),
      targets = Map("dom0" -> 0.5, "dom1" -> 2.0), budget = 400.0,
      key = col("id"), seed = 1)
    val rates = got.select(col("dom"), col("keep_rate")).distinct()
      .as[(String, Double)].collect().toMap
    assert(rates == Map("dom0" -> 0.5, "dom1" -> 1.0))
    // the clamped domain keeps every row
    assert(got.filter(col("dom") === "dom1").count() == 40)
    // dom2 absent from targets -> dropped entirely
    assert(got.filter(col("dom") === "dom2").count() == 0)
  }

  test("kept set is a hash bucket: stable under repartitioning and a superset relation across budgets") {
    def keys(budget: Double, d: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureSample(d, col("dom"), col("w"),
        targets = Map("dom0" -> 1.0), budget = budget, key = col("id"), seed = 1)
        .select("id").as[Long].collect().toSet
    val small = keys(100.0, df)
    val large = keys(300.0, df)
    assert(small.subsetOf(large)) // raising the budget only ADDS rows
    assert(keys(100.0, df.repartition(13)) == small)
  }

  test("null domains are dropped; keep matches the portable md5 formula") {
    val withNull = df.withColumn("dom",
      when(col("id") === 0L, lit(null: String)).otherwise(col("dom")))
    val got = Sampling.mixtureSample(withNull, col("dom"), col("w"),
      targets = Map("dom0" -> 0.5), budget = 400.0, key = col("id"), seed = 1)
    assert(got.filter(col("id") === 0L).count() == 0)
    // cross-check membership against the documented md5 formula
    val expect = df.filter(col("dom") === "dom0" && col("id") =!= 0L)
      .filter(substring(md5(concat(lit("k"), col("id").cast("string"), lit(":1"))), 1, 8)
        < lit(f"${(0.5 * 4294967296.0).round}%08x"))
      .select("id").as[Long].collect().toSet
    assert(got.select("id").as[Long].collect().toSet == expect)
  }

  test("bad arguments are rejected") {
    intercept[IllegalArgumentException](Sampling.mixtureSample(df, col("dom"),
      col("w"), Map.empty, 10.0, col("id")))
    intercept[IllegalArgumentException](Sampling.mixtureSample(df, col("dom"),
      col("w"), Map("dom0" -> 0.0), 10.0, col("id")))
    intercept[IllegalArgumentException](Sampling.mixtureSample(df, col("dom"),
      col("w"), Map("dom0" -> 0.5), 0.0, col("id")))
  }

  test("plan: broadcast rates, no corpus shuffle on the main pass") {
    val got = Sampling.mixtureSample(df, col("dom"), col("w"),
      targets = Map("dom0" -> 0.5), budget = 400.0, key = col("id"), seed = 1)
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected the rates table broadcast:\n$plan")
  }
}
