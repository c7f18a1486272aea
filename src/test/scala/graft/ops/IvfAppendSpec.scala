package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSessions
import graft.tables.Tables

/** Incremental IVF maintenance (Similarity.ivfAppend): assignment against
  * the existing centroid artifact, per-cell drift, and the scale contract
  * that appending triggers no driver round-trip. */
class IvfAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSessions.spark

  private def emb = Tables.load(spark, TestSessions.sf001, "embeddings")
    .select("vec_id", "embedding")

  private lazy val idx = Similarity.buildIvfIndex(emb, nlist = 8, iters = 2)

  test("appending the original corpus reports exactly zero drift") {
    val drift = Similarity.ivfAppend(idx, emb)._2.collect()
    assert(drift.nonEmpty && drift.length <= 8)
    drift.foreach { r =>
      assert(r.getAs[Long]("count_delta") == 0L, s"$r")
      assert(r.getAs[Double]("mean_shift") == 0.0, s"$r")
      assert(r.getAs[Long]("base_count") == r.getAs[Long]("new_count"))
    }
  }

  test("a vector appended twice lands in the same cell") {
    val one = emb.filter(col("vec_id") === 7)
    val twins = one.withColumn("vec_id", lit(900001L))
      .unionByName(one.withColumn("vec_id", lit(900002L)))
    val drift = Similarity.ivfAppend(idx, twins)._2
      .filter(col("new_count") > 0).collect()
    assert(drift.length == 1, s"two copies split across cells: ${drift.toSeq}")
    assert(drift.head.getAs[Long]("new_count") == 2L)
  }

  test("appended index carries base + batch assignments; counts reconcile") {
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val half = Similarity.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0),
      nlist = 8, iters = 2)
    val (appended, drift) = Similarity.ivfAppend(half, batch)
    assert(appended.index.count() == emb.count())
    val d = drift.collect()
    assert(d.map(_.getAs[Long]("base_count")).sum == emb.count() / 2 + emb.count() % 2)
    assert(d.map(_.getAs[Long]("new_count")).sum == emb.count() / 2)
    // drift columns are total functions of the two counts
    d.foreach(r => assert(r.getAs[Long]("count_delta")
      == r.getAs[Long]("new_count") - r.getAs[Long]("base_count")))
  }

  test("retrain policy: self-append says no, a concentrated shifted batch says yes") {
    // appending the original corpus: both statistics exactly 0.0 (the
    // x122b invariant), so the verdict is false at ANY positive threshold
    val selfDrift = Similarity.ivfAppend(idx, emb)._2
    val v = Similarity.retrainVerdict(selfDrift).collect().head
    assert(v.getAs[Double]("max_mean_shift") == 0.0)
    assert(v.getAs[Double]("max_share_delta") == 0.0)
    assert(!v.getAs[Boolean]("needs_retrain"))
    assert(!Similarity.needsRetrain(selfDrift, 1e-9, 1e-9))
    // the x122b plant: a batch of two copies of one vector lands in ONE
    // cell — its arrival share is 1.0 vs the trained balance (~1/8), so
    // max_share_delta ≈ 0.875 trips the default 0.25 threshold
    val one = emb.filter(col("vec_id") === 0)
    val twins = one.withColumn("vec_id", lit(910001L))
      .unionByName(one.withColumn("vec_id", lit(910002L)))
    val twinDrift = Similarity.ivfAppend(idx, twins)._2
    assert(Similarity.needsRetrain(twinDrift))
    val tv = Similarity.retrainVerdict(twinDrift).collect().head
    assert(tv.getAs[Double]("max_share_delta") > 0.25)
    // an empty batch is a no-op, never a retrain
    val emptyDrift = Similarity.ivfAppend(idx, emb.filter(col("vec_id") < 0))._2
    assert(!Similarity.needsRetrain(emptyDrift))
  }

  test("ivfAppend itself runs NO Spark job (assignment stays lazy; only the " +
      "prebuilt nlist-by-dim centroid literal is driver-resident)") {
    idx // force the one-time Lloyd build OUTSIDE the counted window
    val batch = emb // parquet open (schema/footer read) may run a listing job — not ivfAppend's
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (appended, drift) = Similarity.ivfAppend(idx, batch)
      Thread.sleep(1000) // listener bus is async; give a stray job time to surface
      assert(jobs == 0, s"ivfAppend launched $jobs job(s) before any action")
      assert(drift.columns.toSeq == Seq("list_id", "base_count", "new_count",
        "count_delta", "mean_shift"))
      assert(appended.centroids.length == 8)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
