package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions

class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, 100L + i % 7)).toDF("doc_id", "bytes")

  test("shard count is ceil(total bytes / target)") {
    val df = corpus(100) // total = 100*100 + Σ(i%7) ≈ 10300
    val total = df.agg(sum("bytes")).as[Long].head()
    val n = Curation.shardAssign(df, col("doc_id"), col("bytes"), 1000L)
      .select("num_shards").distinct().as[Long].collect().toSeq
    assert(n == Seq(math.ceil(total / 1000.0).toLong))
  }

  test("assignment is a pure function of the key: re-runs reproduce it") {
    val df = corpus(200)
    val a = Curation.shardAssign(df, col("doc_id"), col("bytes"), 2000L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    val b = Curation.shardAssign(corpus(200), col("doc_id"), col("bytes"), 2000L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSet.forall(s => s >= 0))
  }

  test("manifest reconciles: docs and bytes total the input; ids dense") {
    val df = corpus(500)
    val sharded = Curation.shardAssign(df, col("doc_id"), col("bytes"), 5000L)
    val man = Curation.shardManifest(sharded, col("bytes"), 5000L)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(man.map(_._3).sum == 500L)
    assert(man.map(_._4).sum == df.agg(sum("bytes")).as[Long].head())
    val n = man.head._2
    assert(man.map(_._1).toSet.subsetOf((0L until n).toSet))
  }

  test("md5 buckets spread evenly (no shard twice the target)") {
    val df = corpus(2000)
    val sharded = Curation.shardAssign(df, col("doc_id"), col("bytes"), 10000L)
    val fills = Curation.shardManifest(sharded, col("bytes"), 10000L)
      .select("fill_ratio").as[Double].collect()
    assert(fills.forall(f => f > 0.3 && f < 2.0),
      s"uneven shards: ${fills.mkString(",")}")
  }

  test("tiny corpus still gets one shard") {
    val df = corpus(1)
    val man = Curation.shardManifest(
      Curation.shardAssign(df, col("doc_id"), col("bytes"), 1000000L),
      col("bytes"), 1000000L).as[(Long, Long, Long, Long, Double)].collect()
    assert(man.toSeq.map(r => (r._1, r._2, r._3)) == Seq((0L, 1L, 1L)))
  }
}
