package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  // independent reimplementation of the A-Res key for cross-checking
  private def sampKey(id: Long, w: Double, seed: Int = 42): Double = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"k$id:$seed".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.take(8)
    val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
    val ln7 = BigDecimal(math.log(u))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    BigDecimal(-ln7 / w).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0
  }

  private val rows = (1L to 50L).map(i => (i, (i % 7 + 1).toDouble))
  private val df = rows.toDF("doc_id", "w")

  test("selection and keys match an independent reimplementation") {
    val got = Sampling.weightedSample(df, col("doc_id"), col("w"), k = 10)
      .select(col("doc_id"), col("samp_key"))
      .as[(Long, Double)].collect().toSeq
    val want = rows.map { case (id, w) => (id, sampKey(id, w)) }
      .sortBy { case (id, k) => (k, id) }.take(10)
    assert(got == want)
  }

  test("null and non-positive weights are excluded; k > n keeps the rest") {
    val noisy = df.union(Seq(
      (100L, 0.0), (101L, -2.0),
      (102L, null.asInstanceOf[java.lang.Double].asInstanceOf[Double]))
      .toDF("doc_id", "w"))
      .withColumn("w", when(col("doc_id") === 102L, lit(null)).otherwise(col("w")))
    val got = Sampling.weightedSample(noisy, col("doc_id"), col("w"), k = 1000)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == (1L to 50L).toSet)
  }

  test("NaN weights are excluded (NaN orders above every double)") {
    val nan = df.withColumn("w",
      when(col("doc_id") === 5L, lit(Double.NaN)).otherwise(col("w")))
    val got = Sampling.weightedSample(nan, col("doc_id"), col("w"), k = 1000)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(!got.contains(5L) && got.size == 49)
  }

  test("selection is partitioning-proof") {
    val a = Sampling.weightedSample(df, col("doc_id"), col("w"), k = 10)
      .select(col("doc_id")).as[Long].collect().toSeq
    val b = Sampling.weightedSample(df.repartition(13), col("doc_id"),
        col("w"), k = 10)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(a == b)
  }

  test("dedupWeightedSample: cluster sizes are exact; dup-free equals unit weights") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "unique a"), (5L, null.asInstanceOf[String]),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Sampling.dedupWeightedSample(docs, k = 100)
      .select(col("doc_id"), col("cluster_size"))
      .as[(Long, Long)].collect().toMap
    // null-text docs are clusters of 1 (never duplicates of each other)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 1L,
      5L -> 1L, 6L -> 1L))
    val unique = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val soft = Sampling.dedupWeightedSample(unique, k = 3)
      .select(col("doc_id"), col("samp_key")).as[(Long, Double)].collect().toSeq
    val hard = Sampling.weightedSample(unique.withColumn("w", lit(1.0)),
        col("doc_id"), col("w"), k = 3)
      .select(col("doc_id"), col("samp_key")).as[(Long, Double)].collect().toSeq
    assert(soft == hard)
  }

  test("weightedSamplePerGroup: exactly min(k, group size) per stratum, " +
      "keys equal the global draw") {
    val grouped = rows.map { case (id, w) => (id, w, if (id <= 25) "a" else "b") }
      .toDF("doc_id", "w", "g")
    val got = Sampling.weightedSamplePerGroup(grouped, col("g"),
        col("doc_id"), col("w"), k = 7)
      .select(col("g"), col("doc_id"), col("samp_key"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got.count(_._1 == "a") == 7 && got.count(_._1 == "b") == 7)
    // within each group the winners are the k smallest A-Res keys
    val want = rows.map { case (id, w) => (id, sampKey(id, w)) }
    Seq("a" -> (1L to 25L), "b" -> (26L to 50L)).foreach { case (g, ids) =>
      val top = want.filter(t => ids.contains(t._1))
        .sortBy { case (id, k) => (k, id) }.take(7).map(_._1).toSet
      assert(got.filter(_._1 == g).map(_._2).toSet == top)
    }
    // a group smaller than k returns whole
    val tiny = Seq((1L, 2.0, "solo")).toDF("doc_id", "w", "g")
    assert(Sampling.weightedSamplePerGroup(tiny, col("g"), col("doc_id"),
      col("w"), k = 5).count() == 1)
  }

  test("an overwhelming weight is always drawn") {
    val skew = df.withColumn("w",
      when(col("doc_id") === 7L, lit(1e9)).otherwise(col("w")))
    val got = Sampling.weightedSample(skew, col("doc_id"), col("w"), k = 5)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got.contains(7L))
    intercept[IllegalArgumentException](
      Sampling.weightedSample(df, col("doc_id"), col("w"), 0))
  }
}
