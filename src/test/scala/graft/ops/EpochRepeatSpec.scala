package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class EpochRepeatSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  /** Independent restatement of the fractional-epoch draw. */
  private def keeps(key: Long, epoch: Long, frac: Double, seed: Int): Boolean = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"k$key#$epoch:$seed".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val thr = math.min((frac * 4294967296.0).round, 4294967295L)
    hex < f"$thr%08x"
  }

  private def rows(n: Int) = (1L to n.toLong).map(i => (i, s"doc $i"))
    .toDF("id", "payload")

  test("integer rate repeats exactly rate times, no fractional epoch") {
    val out = Sampling.epochRepeat(rows(20).withColumn("rate", lit(2.0)),
      col("id"), col("rate"))
    val byId = out.groupBy("id").agg(collect_set("epoch").as("es"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(byId.size == 20)
    byId.values.foreach(es => assert(es.sorted == Seq(1L, 2L)))
  }

  test("fractional rate: full epochs always, last epoch by the (key, epoch) draw") {
    val out = Sampling.epochRepeat(rows(200).withColumn("rate", lit(2.5)),
        col("id"), col("rate"), seed = 11)
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    (1L to 200L).foreach { id =>
      assert(out.contains(id -> 1L) && out.contains(id -> 2L), s"id $id")
      assert(out.contains(id -> 3L) == keeps(id, 3L, 0.5, 11), s"id $id epoch 3")
    }
    // the fractional epoch must actually select a nontrivial subset
    val n3 = out.count(_._2 == 3L)
    assert(n3 > 50 && n3 < 150, s"epoch-3 count $n3")
  }

  test("rate below 1 degenerates to deterministic sampling") {
    val out = Sampling.epochRepeat(rows(100).withColumn("rate", lit(0.3)),
        col("id"), col("rate"), seed = 5)
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    (1L to 100L).foreach { id =>
      assert(out.contains(id -> 1L) == keeps(id, 1L, 0.3, 5), s"id $id")
    }
  }

  test("null and non-positive rates drop") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(0.0)), (4L, Some(-1.5)))
      .toDF("id", "rate")
    val ids = Sampling.epochRepeat(df, col("id"), col("rate"))
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("output is invariant under repartitioning") {
    val base = rows(150).withColumn("rate", lit(1.7))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.epochRepeat(df, col("id"), col("rate"))
        .select("id", "epoch").as[(Long, Long)].collect().toSet
    assert(run(base) == run(base.repartition(13)))
  }
}
